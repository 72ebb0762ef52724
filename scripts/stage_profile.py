#!/usr/bin/env python3
"""Per-stage wall-clock profile of the detection pipeline on real frames.

Times each stage of `detect_frame` separately (each jitted and warmed) so
PARITY.md's "where the time goes" table can be kept honest across rounds.

Axon-relay timing rules (see PARITY.md): `block_until_ready` is a no-op
through the tunnel, so each timing loop dispatches all iterations async
and then forces ONE scalar D2H — the device queue is serial, so the
scalar's arrival bounds all prior work.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jnp.ravel(leaves[0])[0])


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters, out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", choices=["gtsdb", "1080p"], default="gtsdb")
    p.add_argument("--downscale", type=int, default=2)
    p.add_argument("--level_step", type=int, default=9)
    p.add_argument("--ccl_iters", type=int, default=2)
    p.add_argument("--refine_scan", type=int, default=2)
    p.add_argument("--max_regions", type=int, default=128)
    args = p.parse_args()

    from bench import _load_frames
    from opencv_traffic_sign_detector_tpu.config import MSERConfig, PipelineConfig
    from opencv_traffic_sign_detector_tpu.constants import (
        DEDUP_COORD_TOL,
        DEDUP_HIST_TOL,
        DETECT_CROP,
        DETECT_GROW,
    )
    from opencv_traffic_sign_detector_tpu.models.detector import detect_batch
    from opencv_traffic_sign_detector_tpu.models.mean_masks import (
        MeanMaskTemplates,
        mask_correlation_classify,
    )
    from opencv_traffic_sign_detector_tpu.ops.dedup import (
        dedup_by_coords,
        dedup_by_histogram,
    )
    from opencv_traffic_sign_detector_tpu.ops.geometry import filter_and_grow_boxes
    from opencv_traffic_sign_detector_tpu.ops.mser import mser_regions_batch
    from opencv_traffic_sign_detector_tpu.ops.mser_pallas import fused_level_sweep
    from opencv_traffic_sign_detector_tpu.ops.preprocess import enhance_contrast
    from opencv_traffic_sign_detector_tpu.ops.resize import crop_and_resize

    cfg = PipelineConfig(
        mser=MSERConfig(
            max_variation=1.0,
            max_regions=args.max_regions,
            downscale=args.downscale,
            ccl_jumps=0,
            ccl_iters=args.ccl_iters,
            level_step=args.level_step,
            refine_scan_passes=args.refine_scan,
        ),
        batch_size=args.batch,
    )
    frames = jnp.asarray(_load_frames(args.batch, args.size))
    templates = MeanMaskTemplates.load("artifacts/mean_masks.npz")
    red = jnp.asarray(templates.red)
    blue = jnp.asarray(templates.blue)

    t_total, _ = timeit(
        jax.jit(lambda f: detect_batch(f, red, blue, cfg)), frames
    )

    pre = jax.jit(jax.vmap(enhance_contrast))
    t_pre, gray = timeit(pre, frames)

    # fused sweep alone (downsampled, polarity-padded input)
    c = cfg.mser
    ds = max(1, c.downscale)
    h0, w0 = gray.shape[1:]
    hc, wc = (h0 // ds) * ds, (w0 // ds) * ds

    def downs_pad(g):
        d = g
        if ds > 1:
            d = (
                g[:hc, :wc]
                .reshape(hc // ds, ds, wc // ds, ds)
                .astype(jnp.int32)
                .mean(axis=(1, 3))
            ).astype(jnp.uint8)
        gi = d.astype(jnp.int32)
        both = jnp.stack([gi, 255 - gi])
        return jnp.pad(both, ((0, 0), (1, 1), (1, 1)), constant_values=255)

    dp = jax.jit(jax.vmap(downs_pad))
    t_dp, im2s = timeit(dp, gray)

    s = c.level_step if c.level_step > 0 else c.delta
    d_idx = max(1, round(c.delta / s))
    num_levels = len(range(0, 256 + (d_idx + 1) * s + 1, s))
    import dataclasses as _dc

    sub = _dc.replace(
        c,
        min_area=max(c.min_area // (ds * ds), 1),
        max_area=max(c.max_area // (ds * ds), 1),
        downscale=1,
    )
    sw = jax.jit(jax.vmap(lambda im2: fused_level_sweep(im2, sub, d_idx,
                                                        num_levels)))
    t_sw, _ = timeit(sw, im2s)

    msr = jax.jit(lambda g: mser_regions_batch(g, c))
    t_msr, (props, pvalid) = timeit(msr, gray)

    @jax.jit
    def post(frames, props, pvalid):
        def one(bgr, pr, pv):
            boxes, keep = filter_and_grow_boxes(pr, pv, DETECT_GROW)
            crops = crop_and_resize(bgr, boxes, DETECT_CROP)
            crops, boxes, keep = dedup_by_histogram(
                crops, boxes, keep, DEDUP_HIST_TOL
            )
            crops, boxes, keep = dedup_by_coords(
                crops, boxes, keep, DEDUP_COORD_TOL
            )
            types, scores, accept = mask_correlation_classify(
                crops, red, blue, cfg.mask_corr_tol
            )
            return boxes, types, scores, keep & accept

        return jax.vmap(one)(frames, props, pvalid)

    t_post, _ = timeit(post, frames, props, pvalid)

    b = args.batch
    print(f"batch={b} {args.size}  total={t_total*1e3:8.1f} ms  "
          f"({b/t_total:6.1f} fps)")
    for name, t in [
        ("preprocess (CLAHE etc.)", t_pre),
        ("downsample + polarity pad", t_dp),
        ("fused level sweep", t_sw),
        ("MSER total (sweep+topk+refine)", t_msr),
        ("crop/dedup/classify", t_post),
    ]:
        print(f"  {name:32s} {t*1e3:8.1f} ms  {100*t/t_total:5.1f}%")
    print(f"  {'topk+refine (MSER total - sweep - pad)':38s} "
          f"{(t_msr - t_sw - t_dp)*1e3:8.1f} ms")
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo")
    sys.exit(main())
