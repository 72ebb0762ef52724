"""Distributed training: one SPMD step over a data mesh.

The framework's "training" is closed-form (mean-mask blends, LDA fits) — so
the distributed formulation is sufficient-statistics + collectives rather
than gradient all-reduce:

* every device runs the full proposal pipeline on its shard of the frame
  batch (MSER -> crops -> HOG features), assigns labels from its shard's GT
  boxes by IoU (positives keep the GT super-type, low-IoU proposals are
  background — the reference's negative-mining rule);
* per-class sufficient statistics (counts, feature sums, per-class second
  moments) are ``psum``-reduced over the ICI mesh;
* every device solves the same small (324-dim) Gaussian-LDA system from the
  reduced statistics — the replicated closed-form "optimizer step".

This replaces the reference's single-threaded in-RAM training
(`Reconocimiento de Objetos/source.py:434-470,551-562`) with a genuinely
multi-chip program; tests exercise it on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import MSERConfig
from ..constants import NEGATIVE_IOU_MAX
from ..ops.color import bgr_to_gray
from ..ops.geometry import filter_and_grow_boxes, iou_matrix
from ..ops.hog import hog_descriptors
from ..ops.mser import mser_regions
from ..ops.preprocess import enhance_contrast
from ..ops.resize import crop_and_resize
from .mesh import DATA_AXIS

N_CLASSES = 7


def _class_statistics(feats, labels, weights):
    """Per-class sufficient stats: counts [C], sums [C,D], sq [C,D,D]."""
    onehot = (labels[:, None] == jnp.arange(N_CLASSES)[None, :]).astype(
        feats.dtype
    ) * weights[:, None]
    counts = jnp.sum(onehot, axis=0)
    sums = onehot.T @ feats
    sq = jnp.einsum("nc,nd,ne->cde", onehot, feats, feats)
    return counts, sums, sq


def lda_from_statistics(counts, sums, sq, eps: float = 1e-6):
    """Closed-form Gaussian LDA from psum-reduced statistics.

    Returns (coef [C,D], intercept [C]).  Pooled within-class covariance
    with the (n - C) normalization; ridge eps keeps the solve well-posed on
    degenerate shards.
    """
    n = jnp.sum(counts)
    d = sums.shape[1]
    safe = jnp.maximum(counts, 1.0)
    means = sums / safe[:, None]
    sw = jnp.sum(sq, axis=0) - jnp.einsum("c,cd,ce->de", counts, means, means)
    cov = sw / jnp.maximum(n - N_CLASSES, 1.0) + eps * jnp.eye(d, dtype=sums.dtype)
    icov_means = jnp.linalg.solve(cov, means.T).T  # [C, D]
    priors = jnp.maximum(counts, 1e-6) / jnp.maximum(n, 1.0)
    intercept = (
        -0.5 * jnp.sum(means * icov_means, axis=1) + jnp.log(priors)
    )
    return icov_means, intercept


def _propose_and_label(frame, gt_boxes, gt_types, cfg: MSERConfig, grow: float,
                       crop: int):
    """One frame -> (features [N,D], labels [N], weights [N])."""
    gray = enhance_contrast(frame)
    props, pvalid = mser_regions(gray, cfg)
    boxes, keep = filter_and_grow_boxes(props, pvalid, grow)
    crops = bgr_to_gray(crop_and_resize(frame, boxes, crop))
    feats = hog_descriptors(crops)

    gt_valid = gt_types > 0
    ious = iou_matrix(boxes, gt_boxes)  # [N, G]
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    best = jnp.argmax(ious, axis=1)
    best_iou = jnp.max(ious, axis=1)
    labels = jnp.where(
        best_iou > NEGATIVE_IOU_MAX, gt_types[best], 0
    ).astype(jnp.int32)
    return feats, labels, keep.astype(feats.dtype)


def distributed_train_step(mesh: Mesh, cfg: MSERConfig, grow: float = 1.15,
                           crop: int = 32):
    """Build the jitted SPMD train step over ``mesh``.

    Returned fn: (frames [B,H,W,3], gt_boxes [B,G,4], gt_types [B,G])
    -> (coef [7,D], intercept [7], class_counts [7]); inputs sharded on
    batch, outputs replicated.
    """

    def step(frames, gt_boxes, gt_types):
        feats, labels, weights = jax.vmap(
            lambda f, b, t: _propose_and_label(f, b, t, cfg, grow, crop)
        )(frames, gt_boxes, gt_types)
        d = feats.shape[-1]
        feats = feats.reshape(-1, d)
        labels = labels.reshape(-1)
        weights = weights.reshape(-1)
        counts, sums, sq = _class_statistics(feats, labels, weights)
        counts = jax.lax.psum(counts, DATA_AXIS)
        sums = jax.lax.psum(sums, DATA_AXIS)
        sq = jax.lax.psum(sq, DATA_AXIS)
        coef, intercept = lda_from_statistics(counts, sums, sq)
        return coef, intercept, counts

    spec_b = P(DATA_AXIS)
    mapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_b, spec_b, spec_b),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(mapped)


def distributed_lda_fit(mesh: Mesh):
    """Sharded-features LDA fit: (X [N,D], y [N], w [N]) -> (coef, intercept).

    The feature matrix is sharded along N; statistics psum over the mesh.
    """

    def fit(X, y, w):
        counts, sums, sq = _class_statistics(X, y, w)
        counts = jax.lax.psum(counts, DATA_AXIS)
        sums = jax.lax.psum(sums, DATA_AXIS)
        sq = jax.lax.psum(sq, DATA_AXIS)
        return lda_from_statistics(counts, sums, sq)

    mapped = shard_map(
        fit,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)
