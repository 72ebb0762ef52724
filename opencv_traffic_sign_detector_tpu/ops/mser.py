"""MSER region proposal as a TPU-native level-sliced CCL sweep.

OpenCV's MSER builds a sequential component tree (union-find over a pixel
flood).  That shape is hostile to SIMD hardware, so this module re-derives
maximally-stable regions from first principles in a data-parallel form:

1. **Level sweep** — for thresholds ``l`` in steps of the stability delta,
   binarize ``im <= l`` and label components with the iterative CCL kernel
   (:mod:`.ccl`), warm-starting each level from the previous one (masks only
   grow with ``l``, so labels carry over and convergence is fast).
2. **Per-pixel stability** — for every pixel q tracked through the level
   stack, the containing-component areas ``a[l, q]`` give the Matas variation
   ``V = (a[l+Δ] - a[l-Δ]) / a[l]``, evaluated at the component's canonical
   pixel.  Candidates are canonical pixels whose V is below max_variation,
   a local minimum across levels, with area inside [min_area, max_area].
3. **Bbox refinement** — each extracted candidate re-labels a fixed window
   around its seed at its level and takes the bounding box of the seed's
   component (components are area-bounded, so a static window suffices).

Both polarities run (dark-on-bright via ``im`` and bright-on-dark via
``255 - im``), matching OpenCV's two-pass grayscale behaviour.  Output is a
fixed-capacity padded tensor of xywh boxes + validity mask, ordered by
stability — the fixed-shape contract the rest of the jitted pipeline needs.

Replaces `cv2.MSER_create` / `mser.detectRegions` (`Deteción de
Objetos/source.py:639,114`; `Reconocimiento de Objetos/source.py:43,50`).
Exact region sets are not bit-reproducible vs OpenCV (tie-breaking and
per-level evaluation differ); parity is validated at the detection-quality
level (proposal recall over the GTSDB frames, tests/test_ops_mser.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import MSERConfig
from .ccl import component_areas, label_components, label_components_scan

# Static window size for bbox refinement; components are bounded by
# max_area <= 20000 but sign-shaped regions at the default max_area=2000 fit
# comfortably in 128x128.
_WIN = 128


def _label_fn(mode: str):
    return label_components_scan if mode == "scan" else label_components


def _level_stack(im: jnp.ndarray, levels, ccl_iters: int, d_idx: int,
                 ccl_mode: str = "hook"):
    """Run the warm-started CCL sweep.

    Returns (areas u16 [L,H,W], canonical bool [L,H,W], hist u16 [L,H,W])
    where hist[l, q] is the size of the largest sub-component of q's current
    component as of level l - d_idx (the "history" area the Matas variation
    compares against; 0 if the component is younger than d_idx levels).
    """
    h, w = im.shape
    big = h * w
    idx2d = jnp.arange(big, dtype=jnp.int32).reshape(h, w)
    levels_arr = jnp.asarray(levels, dtype=jnp.int32)

    # derive the scan carries from `im` (zeros_like keeps shard_map's
    # varying-axis typing consistent between carry input and output)
    ring0 = jnp.tile(jnp.zeros_like(im, dtype=jnp.uint16)[None], (d_idx, 1, 1))

    def step(carry, level):
        lab_prev, ring = carry
        mask = im <= level.astype(im.dtype)
        lab = _label_fn(ccl_mode)(mask, num_iters=ccl_iters, init_labels=lab_prev)
        area = component_areas(lab)
        canon = mask & (lab == idx2d)
        # Component-max of the area d levels back: the largest history chain.
        old = ring[0].reshape(-1).astype(jnp.int32)
        flat = lab.reshape(-1)
        scat = jnp.zeros((big + 1,), jnp.int32).at[flat].max(old)
        hist = scat[jnp.minimum(flat, big)]
        hist = jnp.where(flat < big, hist, 0).astype(jnp.uint16).reshape(h, w)
        ring = jnp.concatenate([ring[1:], area[None]], axis=0)
        return (lab, ring), (area, canon, hist)

    init = (jnp.full_like(im, big, dtype=jnp.int32), ring0)
    _, (areas, canon, hist) = jax.lax.scan(step, init, levels_arr)
    return areas, canon, hist


def _stability(areas: jnp.ndarray, hist: jnp.ndarray, d_idx: int) -> jnp.ndarray:
    """V[l] = (a[l+d] - hist[l]) / a[l] per pixel; +inf where undefined.

    a[l+d] is read at the same pixel (the parent component at l+d contains
    the whole current component, so any member pixel sees the parent's area);
    hist is the component-max sub-area from d levels back.  Components
    younger than d levels have hist == 0, giving V >= a_plus/a >= 1 — they
    only become eligible once they have enough history, like the classic
    algorithm's growth records.
    """
    a = areas.astype(jnp.float32)
    inf = jnp.float32(jnp.inf)
    a_plus = jnp.concatenate([a[d_idx:], jnp.tile(a[-1:], (d_idx, 1, 1))], 0)
    v = jnp.where(a > 0, (a_plus - hist.astype(jnp.float32)) / jnp.maximum(a, 1.0), inf)
    return v


def _refine_boxes(gray: jnp.ndarray, seeds_yx: jnp.ndarray, levels: jnp.ndarray,
                  polarity: jnp.ndarray, ccl_iters: int, ccl_mode: str = "hook"):
    """Per candidate: local CCL in a _WIN window at its level; bbox of the
    seed's component.  seeds_yx [N,2] int32, levels [N] int32, polarity [N]
    (0=dark, 1=bright) -> boxes_xywh [N,4] int32."""
    h, w = gray.shape
    win_h = min(_WIN, h)
    win_w = min(_WIN, w)

    def one(seed, level, pol):
        y, x = seed[0], seed[1]
        y0 = jnp.clip(y - 2, 0, max(h - win_h, 0))
        x0 = jnp.clip(x - win_w // 2, 0, max(w - win_w, 0))
        win = jax.lax.dynamic_slice(gray, (y0, x0), (win_h, win_w))
        win = jnp.where(pol == 1, jnp.uint8(255) - win, win)
        mask = win <= level.astype(gray.dtype)
        lab = _label_fn(ccl_mode)(mask, num_iters=ccl_iters)
        seed_lab = lab[y - y0, x - x0]
        sel = lab == seed_lab
        rows = jax.lax.broadcasted_iota(jnp.int32, (win_h, win_w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (win_h, win_w), 1)
        big = jnp.int32(win_h * win_w)
        ymin = jnp.min(jnp.where(sel, rows, big))
        ymax = jnp.max(jnp.where(sel, rows, -1))
        xmin = jnp.min(jnp.where(sel, cols, big))
        xmax = jnp.max(jnp.where(sel, cols, -1))
        return jnp.stack(
            [x0 + xmin, y0 + ymin, xmax - xmin + 1, ymax - ymin + 1]
        )

    return jax.vmap(one)(seeds_yx, levels, polarity)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mser_regions(gray: jnp.ndarray, cfg: MSERConfig):
    """Detect MSER proposals on one uint8 [H, W] frame.

    Returns (boxes_xywh int32 [max_regions, 4], valid bool [max_regions]),
    most-stable first.
    """
    h, w = gray.shape
    hw = h * w
    s = cfg.level_step if cfg.level_step > 0 else cfg.delta
    d_idx = max(1, round(cfg.delta / s))
    levels = list(range(0, 256, s))
    L = len(levels)
    ccl_iters = cfg.ccl_iters

    cand_scores = []
    for pol in (0, 1):
        im = gray if pol == 0 else jnp.uint8(255) - gray
        areas, canon, hist = _level_stack(im, levels, ccl_iters, d_idx,
                                          cfg.ccl_mode)
        v = _stability(areas, hist, d_idx)
        a = areas.astype(jnp.int32)
        inf = jnp.float32(jnp.inf)
        v_pad = jnp.concatenate(
            [jnp.full((1,) + v.shape[1:], inf), v, jnp.full((1,) + v.shape[1:], inf)], 0
        )
        local_min = (v <= v_pad[:-2]) & (v <= v_pad[2:])
        cand = (
            canon
            & (a >= cfg.min_area)
            & (a <= cfg.max_area)
            & (v < cfg.max_variation)
            & local_min
        )
        score = jnp.where(cand, -v, -inf)  # higher = more stable
        cand_scores.append(score.reshape(L, hw))

    scores_all = jnp.concatenate(cand_scores, axis=0).reshape(-1)  # [2*L*hw]
    n = cfg.max_regions
    top_vals, top_idx = jax.lax.top_k(scores_all, n)
    valid = top_vals > -jnp.inf

    pl = top_idx // hw  # combined polarity*L + level index
    q = top_idx - pl * hw
    pol_idx = pl // L
    lvl_idx = pl - pol_idx * L
    level_vals = jnp.asarray(levels, jnp.int32)[lvl_idx]
    seeds = jnp.stack([q // w, q - (q // w) * w], axis=-1).astype(jnp.int32)

    boxes = _refine_boxes(gray, seeds, level_vals, pol_idx, ccl_iters,
                          cfg.ccl_mode)
    boxes = jnp.where(valid[:, None], boxes, 0)
    return boxes.astype(jnp.int32), valid


def mser_regions_batch(gray_batch: jnp.ndarray, cfg: MSERConfig):
    """vmapped mser_regions: [B, H, W] -> ([B, N, 4], [B, N])."""
    return jax.vmap(lambda g: mser_regions(g, cfg))(gray_batch)
