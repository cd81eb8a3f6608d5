"""Graph-driven autoregressive Generator.

Drop-in parity with the reference's ``Generator``
(rten-generate/src/generator.rs): iterates token ids from a transformer
decoder graph, discovering KV-cache inputs by the Optimum naming
convention ``past_key_values.N.{key,value}`` → ``present.N.{key,value}``,
synthesizing varying inputs (``attention_mask`` = ones, ``position_ids``
= arange), caching the loop-invariant constant prefix via ``partial_run``
and transferring cache ownership back into each run.

Execution model: by default graph steps run eagerly (per-op dispatch) —
exact reference semantics, no recompiles. With ``pad_to=N`` the Generator
switches to bucketed jit decoding: the past-KV view is padded to the next
multiple of N (masked via attention_mask) so the graph compiles at most
max_seq_len/N signatures while stored KV stays compact. High-throughput
serving still belongs to the native engine
(:mod:`rten_tpu.generate.engine`) with fixed shapes + flash kernels.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from ..runtime.executor import RunOptions
from .metrics import Metrics
from .sampler import ArgMaxSampler, Sampler


@dataclass
class ModelInputsConfig:
    """Input/output name conventions (reference generator.rs:99-156)."""
    input_ids: str = "input_ids"
    logits: str = "logits"
    attention_mask: str = "attention_mask"
    position_ids: str = "position_ids"
    key_cache: tuple = ("past_key_values.", ".key")
    key_cache_output: tuple = ("present.", ".key")
    value_cache: tuple = ("past_key_values.", ".value")
    value_cache_output: tuple = ("present.", ".value")


@dataclass
class GeneratorConfig:
    max_seq_len: int = 512
    sampler: Sampler = field(default_factory=ArgMaxSampler)
    model_inputs: ModelInputsConfig = field(default_factory=ModelInputsConfig)
    seed: int = 0
    eager: bool = True
    # Bucketed jit decoding: pad the past-KV length to multiples of
    # ``pad_to`` (masked via attention_mask) so the graph re-jits at most
    # max_seq_len/pad_to times instead of every step. Sets eager=False
    # semantics for the padded steps automatically.
    pad_to: int = 0


class GeneratorError(RuntimeError):
    pass


class Generator:
    """Iterator producing token ids; compose with ``stop_on_tokens`` /
    ``decode`` / ``profile`` like the reference's ``GeneratorUtils``."""

    def __init__(self, model, prompt_ids, config: Optional[GeneratorConfig]
                 = None, constant_inputs: Optional[dict] = None):
        import jax

        self.model = model
        self.config = config or GeneratorConfig()
        self.prompt_ids = [int(t) for t in prompt_ids]
        self.tokens: list[int] = []
        self._pending_input: list[int] = list(self.prompt_ids)
        self._rng_key = jax.random.PRNGKey(self.config.seed)

        mic = self.config.model_inputs
        names = set(model.input_names())
        if mic.input_ids not in names:
            raise GeneratorError(f"model has no {mic.input_ids!r} input")
        self._has_mask = mic.attention_mask in names
        self._has_positions = mic.position_ids in names

        # Discover KV-cache inputs by prefix/suffix (reference semantics:
        # generator.rs:150-153): past_key_values.<middle>.key →
        # present.<middle>.key, where <middle> is "N" for decoder-only
        # models or e.g. "N.decoder" / "N.encoder" for Whisper-style
        # encoder-decoder exports.
        self._kv_inputs = []      # (input_name, output_name)
        kv_re = re.compile(re.escape(mic.key_cache[0]) + r"(.+?)" + "(" +
                           re.escape(mic.key_cache[1]) + "|" +
                           re.escape(mic.value_cache[1]) + ")$")
        self._kv_heads = {}
        for name in names:
            m = kv_re.match(name)
            if not m:
                continue
            layer, suffix = m.group(1), m.group(2)
            if suffix == mic.key_cache[1]:
                out = f"{mic.key_cache_output[0]}{layer}{mic.key_cache_output[1]}"
            else:
                out = f"{mic.value_cache_output[0]}{layer}{mic.value_cache_output[1]}"
            if model.node_id(out) is None:
                raise GeneratorError(f"missing cache output {out!r}")
            self._kv_inputs.append((name, out))
            shape = model.input_shape(model.node_id(name))
            self._kv_heads[name] = shape

        self._kv_state = {name: None for name, _ in self._kv_inputs}

        # Loop-invariant inputs (e.g. encoder outputs): precompute the
        # constant prefix once via partial_run (generator.rs:477-497).
        self._constant_inputs = dict(constant_inputs or {})
        self._prefix_values = None

        self._extra_outputs = [out for _, out in self._kv_inputs]
        self.metrics = Metrics()
        self.metrics.start()

    # -- internals ---------------------------------------------------------

    def _kv_input_array(self, name, batch):
        state = self._kv_state[name]
        if state is not None:
            return state
        # Empty cache: [batch, heads, 0, size] with heads/size from the
        # declared shape (symbolic dims resolve to 0-length seq).
        shape = self._kv_heads.get(name)
        dims = []
        if shape is None:
            dims = [batch, 1, 0, 1]
        else:
            for d in shape:
                dims.append(int(d) if not isinstance(d, str) else None)
            # Replace symbolic dims: batch, seq → batch/0; keep fixed.
            out = []
            for i, d in enumerate(dims):
                if d is not None and d > 0:
                    out.append(d)
                elif i == 0:
                    out.append(batch)
                else:
                    out.append(0)
            # the seq axis is the -2nd: force it to 0 for the empty cache
            out[-2] = 0
            dims = out
        return np.zeros(dims, dtype=np.float32)

    def _step(self) -> int:
        import jax

        mic = self.config.model_inputs
        n_past = len(self.tokens) + len(self.prompt_ids) - len(self._pending_input)
        input_ids = np.asarray([self._pending_input], dtype=np.int32)
        n_cur = input_ids.shape[1]
        batch = 1
        pad_to = self.config.pad_to

        inputs = {mic.input_ids: input_ids}
        padded_past = n_past
        if pad_to and self._kv_inputs:
            # Bucketed jit path: stored KV stays compact (valid entries
            # only); each step feeds a view padded to the next pad_to
            # multiple, masked so padding is inert. Signatures are bounded
            # by max_seq_len/pad_to.
            padded_past = -(-n_past // pad_to) * pad_to if n_past else 0
            if self._has_mask:
                mask = np.zeros((batch, padded_past + n_cur), np.int32)
                mask[:, :n_past] = 1
                mask[:, padded_past:] = 1
                inputs[mic.attention_mask] = mask
            if self._has_positions:
                inputs[mic.position_ids] = np.arange(
                    n_past, n_past + n_cur, dtype=np.int32)[None, :]
            for name, _ in self._kv_inputs:
                kv = self._kv_input_array(name, batch)
                extra = padded_past - kv.shape[-2]
                if extra:
                    pad_spec = [(0, 0)] * kv.ndim
                    pad_spec[-2] = (0, extra)
                    kv = np.pad(kv, pad_spec)
                inputs[name] = kv
        else:
            if self._has_mask:
                inputs[mic.attention_mask] = np.ones(
                    (batch, n_past + n_cur), dtype=np.int32)
            if self._has_positions:
                inputs[mic.position_ids] = np.arange(
                    n_past, n_past + n_cur, dtype=np.int32)[None, :]
            for name, _ in self._kv_inputs:
                inputs[name] = self._kv_input_array(name, batch)
        inputs.update(self._constant_inputs)

        # Constant-prefix caching: on the first step, precompute values
        # reachable from constants + constant_inputs alone.
        if self._prefix_values is None:
            if self._constant_inputs:
                resolved = {self.model.node_id(k) if isinstance(k, str) else k
                            : v for k, v in self._constant_inputs.items()}
                self._prefix_values = self.model.executor.partial_run(resolved)
            else:
                self._prefix_values = {}

        outputs = [mic.logits] + self._extra_outputs
        eager = self.config.eager and not self.config.pad_to
        options = RunOptions(eager=eager, seed=self.config.seed)
        results = self.model.run(inputs, outputs, options)
        logits = np.asarray(results[0])

        # Re-capture KV caches from the run (ownership transfer analog).
        if pad_to and self._kv_inputs:
            # present = [padded_past | current]: compact back to valid
            # entries (drop the padding hole) before storing.
            for (name, _), value in zip(self._kv_inputs, results[1:]):
                present = np.asarray(value)
                valid = present[..., :n_past, :]
                cur = present[..., padded_past:, :]
                self._kv_state[name] = np.concatenate([valid, cur],
                                                      axis=-2)
        else:
            for (name, _), value in zip(self._kv_inputs, results[1:]):
                self._kv_state[name] = np.asarray(value)

        self._rng_key, sub = jax.random.split(self._rng_key)
        last_logits = logits[0, -1] if logits.ndim == 3 else logits[0]
        token = int(np.asarray(
            self.config.sampler.sample(sub, last_logits)))

        has_kv_cache = bool(self._kv_inputs)
        if has_kv_cache:
            self._pending_input = [token]
        else:
            self._pending_input = self.prompt_ids + self.tokens + [token]
        self.tokens.append(token)
        self.metrics.step()
        return token

    # -- iterator protocol ---------------------------------------------------

    def __iter__(self) -> Iterator[int]:
        return self

    def __next__(self) -> int:
        total = len(self.tokens) + len(self.prompt_ids)
        if total >= self.config.max_seq_len:
            raise StopIteration
        return self._step()

    # -- composition sugar (GeneratorUtils analog) ---------------------------

    def stop_on_tokens(self, stop_ids):
        stop = {int(t) for t in stop_ids}

        def gen():
            for token in self:
                if token in stop:
                    return
                yield token
        return gen()

    def take(self, n):
        def gen():
            for i, token in enumerate(self):
                if i >= n:
                    return
                yield token
        return gen()

    def decode(self, tokenizer, stop_ids=()):
        """Yield text fragments instead of token ids."""
        from .text_decoder import TextDecoder
        decoder = TextDecoder(tokenizer)
        source = self.stop_on_tokens(stop_ids) if stop_ids else self

        def gen():
            for token in source:
                text = decoder.push(token)
                if text:
                    yield text
            tail = decoder.flush()
            if tail:
                yield tail
        return gen()
