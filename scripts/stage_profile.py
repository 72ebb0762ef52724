#!/usr/bin/env python3
"""Per-stage wall-clock profile of the detection pipeline on real frames.

Times each stage of `detect_frame` separately (each jitted and warmed) so
PARITY.md's "where the time goes" table can be kept honest across rounds.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # warm + sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    return (time.time() - t0) / iters, out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--downscale", type=int, default=2)
    p.add_argument("--level_step", type=int, default=5)
    p.add_argument("--max_regions", type=int, default=256)
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
    from opencv_traffic_sign_detector_tpu.ops.preprocess import enhance_contrast
    from opencv_traffic_sign_detector_tpu.ops.resize import crop_and_resize

    cfg = PipelineConfig(
        mser=MSERConfig(
            max_variation=1.0,
            max_regions=args.max_regions,
            downscale=args.downscale,
            ccl_jumps=0,
            level_step=args.level_step,
        ),
        batch_size=args.batch,
    )
    frames = jnp.asarray(_load_frames(args.batch, "gtsdb"))
    templates = MeanMaskTemplates.load("artifacts/mean_masks.npz")
    red = jnp.asarray(templates.red)
    blue = jnp.asarray(templates.blue)

    t_total, _ = timeit(
        jax.jit(lambda f: detect_batch(f, red, blue, cfg)), frames
    )

    pre = jax.jit(jax.vmap(enhance_contrast))
    t_pre, gray = timeit(pre, frames)

    mser = jax.jit(lambda g: mser_regions_batch(g, cfg.mser))
    t_mser, (props, pvalid) = timeit(mser, gray)

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

    # decompose MSER: sweep+topk vs refinement, via the internals
    from opencv_traffic_sign_detector_tpu.ops import mser as mser_mod

    b = args.batch
    print(f"batch={b}  total={t_total*1e3:8.1f} ms  "
          f"({b/t_total:6.2f} fps)")
    for name, t in [
        ("preprocess (CLAHE etc.)", t_pre),
        ("MSER (sweep+topk+refine)", t_mser),
        ("crop/dedup/classify", t_post),
    ]:
        print(f"  {name:28s} {t*1e3:8.1f} ms  {100*t/t_total:5.1f}%")
    print(f"  {'(sum vs fused total)':28s} "
          f"{(t_pre+t_mser+t_post)*1e3:8.1f} ms")
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo")
    sys.exit(main())
