"""NonMaxSuppression.

Reference: ``src/ops/non_max_suppression.rs``. The ONNX op's output shape
is value-dependent (number of surviving boxes), so the spec-conformant op
runs on host in eager mode. A fixed-size, jittable masked variant
(``nms_padded``) is provided for TPU-resident detection pipelines: it
returns a [max_out, 3] index tensor padded with -1, which XLA can compile.
"""

from __future__ import annotations

import numpy as np

from ..fmt import schema
from .registry import register

_BOX_ORDER = schema.ENUMS["NMSBoxOrder"]


def _to_corners(boxes, box_order):
    if _BOX_ORDER[box_order] == "CenterWidthHeight":
        cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
        return np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1)
    return boxes


def _iou(box, others):
    y1 = np.maximum(box[0], others[:, 0])
    x1 = np.maximum(box[1], others[:, 1])
    y2 = np.minimum(box[2], others[:, 2])
    x2 = np.minimum(box[3], others[:, 3])
    inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = (others[:, 2] - others[:, 0]) * (others[:, 3] - others[:, 1])
    union = area + areas - inter
    return np.where(union > 0, inter / union, 0.0)


@register("NonMaxSuppression", data_dependent=True)
def non_max_suppression(ctx, attrs, boxes, scores,
                        max_output_boxes_per_class=None,
                        iou_threshold=None, score_threshold=None):
    boxes = np.asarray(boxes, dtype=np.float32)
    scores = np.asarray(scores, dtype=np.float32)
    max_out = (int(np.asarray(max_output_boxes_per_class).reshape(-1)[0])
               if max_output_boxes_per_class is not None else 0)
    iou_thr = (float(np.asarray(iou_threshold).reshape(-1)[0])
               if iou_threshold is not None else 0.0)
    score_thr = (float(np.asarray(score_threshold).reshape(-1)[0])
                 if score_threshold is not None else None)
    box_order = int(attrs.get("box_order", 0))
    corners = _to_corners(boxes, box_order)

    selected = []
    n_batches, n_classes, n_boxes = scores.shape
    for b in range(n_batches):
        for c in range(n_classes):
            cls_scores = scores[b, c]
            order = np.argsort(-cls_scores, kind="stable")
            if score_thr is not None:
                order = order[cls_scores[order] > score_thr]
            kept: list[int] = []
            for idx in order:
                if max_out and len(kept) >= max_out:
                    break
                if kept:
                    ious = _iou(corners[b, idx],
                                corners[b, np.asarray(kept)])
                    if np.any(ious > iou_thr):
                        continue
                kept.append(int(idx))
            selected.extend([b, c, k] for k in kept)
    if not selected:
        return np.zeros((0, 3), dtype=np.int32)
    return np.asarray(selected, dtype=np.int32)


def nms_padded(boxes, scores, max_out, iou_threshold, score_threshold=None):
    """Jittable fixed-size NMS over one batch/class: returns (indices, valid)
    where ``indices`` is [max_out] int32 padded with -1."""
    import jax.numpy as jnp
    import jax

    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    live = jnp.ones(n, bool)
    if score_threshold is not None:
        live = live & (scores[order] > score_threshold)

    y1, x1, y2, x2 = (boxes_sorted[:, i] for i in range(4))
    areas = jnp.clip(y2 - y1, 0, None) * jnp.clip(x2 - x1, 0, None)
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    inter = jnp.clip(iy2 - iy1, 0, None) * jnp.clip(ix2 - ix1, 0, None)
    union = areas[:, None] + areas[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    suppress = iou > iou_threshold

    def body(i, state):
        live, kept_mask, n_kept = state
        keep = live[i] & (n_kept < max_out)
        live = jnp.where(keep, live & ~suppress[i], live)
        kept_mask = kept_mask.at[i].set(keep)
        return live, kept_mask, n_kept + keep.astype(jnp.int32)

    _, kept_mask, n_kept = jax.lax.fori_loop(
        0, n, body, (live, jnp.zeros(n, bool), jnp.int32(0)))
    kept_sorted_positions = jnp.nonzero(kept_mask, size=max_out, fill_value=-1)[0]
    indices = jnp.where(kept_sorted_positions >= 0,
                        order[kept_sorted_positions], -1)
    return indices.astype(jnp.int32), (indices >= 0)
