"""Vectorized box geometry: aspect filtering, growth, similarity, IoU.

Replaces the reference's per-window Python logic
(`Deteción de Objetos/source.py:155-174,459-468`, `Reconocimiento de
Objetos/source.py:88-107,263-280`) with padded fixed-shape tensor ops.
Boxes are float32/int32 [N, 4]; invalid slots are tracked by boolean masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import ASPECT_MAX, ASPECT_MIN


def filter_and_grow_boxes(
    boxes_xywh: jnp.ndarray,
    valid: jnp.ndarray,
    grow: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Aspect-gate raw (x, y, w, h) proposals and grow the survivors.

    Keeps boxes with ASPECT_MIN < w/h < ASPECT_MAX, widens them by ``grow``
    about their center, clamps the top-left at 0, truncates to ints.  Returns
    (boxes_xyxy int32 [N, 4], valid mask [N]).
    """
    x = boxes_xywh[..., 0].astype(jnp.float32)
    y = boxes_xywh[..., 1].astype(jnp.float32)
    w = boxes_xywh[..., 2].astype(jnp.float32)
    h = boxes_xywh[..., 3].astype(jnp.float32)

    hsafe = jnp.maximum(h, 1.0)
    aspect_ok = (w / hsafe > ASPECT_MIN) & (w / hsafe < ASPECT_MAX) & (h > 0)
    keep = valid & aspect_ok

    dw = w * (grow - 1.0) * 0.5
    dh = h * (grow - 1.0) * 0.5
    x1 = jnp.maximum(x - dw, 0.0)
    y1 = jnp.maximum(y - dh, 0.0)
    x2 = jnp.maximum(x + w + dw, 0.0)
    y2 = jnp.maximum(y + h + dh, 0.0)

    out = jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.int32)
    return out, keep


def sigmoid_distance_similarity(d: jnp.ndarray) -> jnp.ndarray:
    """Distance -> closeness in (0, 1]; the reference's hand-tuned sigmoid
    (1 at d == 0)."""
    d = d.astype(jnp.float32)
    dsafe = jnp.maximum(d, 1e-20)
    z = (0.154 * dsafe**1.2 - 31.8) / (0.2 * dsafe)
    sim = 1.0 / (1.0 + jnp.exp(z))
    return jnp.where(d > 0, sim, 1.0)


def pairwise_coord_similarity(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] -> [N, N] geometric mean of corner-wise sigmoid similarities."""
    b = boxes_xyxy.astype(jnp.float32)
    tl = b[:, :2]
    br = b[:, 2:]
    d_tl = jnp.linalg.norm(tl[:, None, :] - tl[None, :, :], axis=-1)
    d_br = jnp.linalg.norm(br[:, None, :] - br[None, :, :], axis=-1)
    return jnp.sqrt(sigmoid_distance_similarity(d_tl) * sigmoid_distance_similarity(d_br))


def boxes_match_score(det_xyxy: jnp.ndarray, gt_xyxy: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] x [M, 4] -> [N, M] corner-similarity geometric means."""
    d = det_xyxy.astype(jnp.float32)
    g = gt_xyxy.astype(jnp.float32)
    d_tl = jnp.linalg.norm(d[:, None, :2] - g[None, :, :2], axis=-1)
    d_br = jnp.linalg.norm(d[:, None, 2:] - g[None, :, 2:], axis=-1)
    return jnp.sqrt(sigmoid_distance_similarity(d_tl) * sigmoid_distance_similarity(d_br))


def iou_matrix(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] x [M, 4] -> [N, M] IoU with the inclusive +1 pixel convention
    (matches the recognition trainer's intersectionOverUnion)."""
    a = a_xyxy.astype(jnp.float32)
    b = b_xyxy.astype(jnp.float32)
    x1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x2 - x1 + 1, 0) * jnp.maximum(y2 - y1 + 1, 0)
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def mean_coords(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Integer midpoint of two int boxes (floor division, like the reference)."""
    return (a_xyxy.astype(jnp.int32) + b_xyxy.astype(jnp.int32)) // 2
