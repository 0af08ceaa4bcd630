"""Exact NMS as a fixed-shape XLA fixpoint — no sequential greedy loop.

Replaces torchvision's C++/CUDA ``nms``/``batched_nms`` used by the
reference's RPN ``filter_proposals`` and RoI-head ``postprocess_detections``
(reference call sites: src/models/org/rcnn.py:127-128,
src/models/mimic/split_rcnn.py:146-159, :206).

Algorithm
---------
Greedy NMS has a unique solution characterized rank-wise: box j is suppressed
iff some *kept* higher-ranked box overlaps it above the threshold.  Define the
map  F(S)[j] = exists i ranked-above j, i not in S, iou(i, j) > t.  Any
fixpoint of F equals exact greedy NMS (induction over rank), and iterating
S <- F(S) from S = empty-set stabilizes: after k double-iterations the first k
"levels" of the suppression DAG are decided, so it converges in at most N
steps — in practice a handful, because suppression chains in real detections
are short.

Each iteration is one [N]x[N,N] masked matrix product — MXU work, not a
1000-step scalar loop.  Everything is static-shape: candidates are padded,
validity is a mask, outputs are masks + top-k gathers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.ops.boxes import pairwise_iou


def nms_keep_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
                  valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact NMS keep mask.

    boxes: [N, 4]; scores: [N]; valid: optional [N] bool for padded rows.
    Returns keep: [N] bool, True for boxes that survive greedy NMS over the
    valid subset, processed in descending-score order with index tie-break
    (identical ordering to a stable sort by -score).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    iou = pairwise_iou(boxes, boxes)
    idx = jnp.arange(n)
    # ranked_above[i, j]: i comes before j in descending-score stable order
    ranked_above = (scores[:, None] > scores[None, :]) | (
        (scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :])
    )
    # suppress[i, j]: i would suppress j if i is kept
    suppress = (iou > iou_threshold) & ranked_above & valid[:, None] & valid[None, :]
    # bf16 matrix for the MXU; counts accumulate in fp32 so >0 tests are exact
    sup_mat = suppress.astype(jnp.bfloat16)

    def body(state):
        suppressed, _, it = state
        kept = (valid & ~suppressed).astype(jnp.bfloat16)
        new_suppressed = (
            jax.lax.dot_general(
                kept[None, :], sup_mat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0] > 0.0
        )
        changed = jnp.any(new_suppressed != suppressed)
        return new_suppressed, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    init = (jnp.zeros((n,), dtype=bool), jnp.array(True), jnp.array(0, jnp.int32))
    suppressed, _, _ = jax.lax.while_loop(cond, body, init)
    return valid & ~suppressed


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_outputs: int, valid: jnp.ndarray | None = None):
    """NMS returning fixed-size top-``max_outputs`` survivors.

    Returns (indices [max_outputs] int32, keep_valid [max_outputs] bool):
    survivor indices in descending score order, padded with 0s where fewer
    than ``max_outputs`` boxes survive.
    """
    keep = nms_keep_mask(boxes, scores, iou_threshold, valid)
    neg_inf = jnp.finfo(scores.dtype).min
    masked = jnp.where(keep, scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(masked, max_outputs)
    return top_idx, top_scores > neg_inf


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, categories: jnp.ndarray,
                     iou_threshold: float, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Category-aware NMS keep mask (boxes of different categories never
    suppress each other) — the semantics of torchvision ``batched_nms``.

    Implemented by masking the suppression relation with a category-equality
    matrix rather than the coordinate-offset trick (which would inflate the
    coordinate range and hurt fp32 IoU precision on TPU).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    iou = pairwise_iou(boxes, boxes)
    idx = jnp.arange(n)
    ranked_above = (scores[:, None] > scores[None, :]) | (
        (scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :])
    )
    same_cat = categories[:, None] == categories[None, :]
    suppress = (iou > iou_threshold) & ranked_above & same_cat \
        & valid[:, None] & valid[None, :]
    sup_mat = suppress.astype(jnp.bfloat16)

    def body(state):
        suppressed, _, it = state
        kept = (valid & ~suppressed).astype(jnp.bfloat16)
        new_suppressed = (
            jax.lax.dot_general(
                kept[None, :], sup_mat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0] > 0.0
        )
        changed = jnp.any(new_suppressed != suppressed)
        return new_suppressed, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    init = (jnp.zeros((n,), dtype=bool), jnp.array(True), jnp.array(0, jnp.int32))
    suppressed, _, _ = jax.lax.while_loop(cond, body, init)
    return valid & ~suppressed


@partial(jax.jit, static_argnames=("iou_threshold", "max_outputs"))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, categories: jnp.ndarray,
                iou_threshold: float, max_outputs: int,
                valid: jnp.ndarray | None = None):
    """Category-aware NMS with fixed-size outputs (indices, validity)."""
    keep = batched_nms_mask(boxes, scores, categories, iou_threshold, valid)
    neg_inf = jnp.finfo(scores.dtype).min
    masked = jnp.where(keep, scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(masked, max_outputs)
    return top_idx, top_scores > neg_inf
