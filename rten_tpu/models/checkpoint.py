"""Native parameter checkpointing: save/load param pytrees (including
quantized weights) as a single ``.npz``.

This complements the `.rten` graph format: graph models persist as
`.rten`; native-model weights (e.g. an int4-quantized TinyLlama) persist
here. Keys flatten the tree with ``/`` separators; QuantWeight leaves
expand to ``<path>#q{kind,group,n}/data`` and ``.../scales``.
"""

from __future__ import annotations

import re

import numpy as np

from .transformer import QuantWeight


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for key, value in tree.items():
            _flatten(value, f"{prefix}{key}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, value in enumerate(tree):
            _flatten(value, f"{prefix}[{i}]/", out)
    elif isinstance(tree, QuantWeight):
        tag = f"{prefix[:-1]}#q{{{tree.kind},{tree.group},{tree.n}}}/"
        out[tag + "data"] = np.asarray(tree.data)
        out[tag + "scales"] = np.asarray(tree.scales)
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)


def save_params(path, params):
    flat: dict[str, np.ndarray] = {}
    _flatten(params, "", flat)
    np.savez(path, **flat)


_QTAG = re.compile(r"^(.*)#q\{(\w+),(\d+),(\d+)\}$")


def load_params(path) -> dict:
    data = np.load(path, allow_pickle=False)
    tree: dict = {}
    quant: dict[str, dict] = {}
    for key in data.files:
        parts = key.split("/")
        leaf_name = parts[-1]
        m = _QTAG.match("/".join(parts[:-1]))
        if m:
            base, kind, group, n = m.groups()
            rec = quant.setdefault(base, {"kind": kind, "group": int(group),
                                          "n": int(n)})
            rec[leaf_name] = data[key]
            continue
        _insert(tree, parts, data[key])
    for base, rec in quant.items():
        _insert(tree, base.split("/"),
                QuantWeight(rec["kind"], rec["data"], rec["scales"],
                            rec["group"], rec["n"]))
    return _listify(tree)


def _insert(tree, parts, value):
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


_IDX = re.compile(r"^\[(\d+)\]$")


def _listify(node):
    """Convert {'[0]': ..., '[1]': ...} dicts back into lists."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(_IDX.match(k) for k in out):
        return [out[f"[{i}]"] for i in range(len(out))]
    return out
