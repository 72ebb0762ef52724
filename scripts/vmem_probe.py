#!/usr/bin/env python3
"""Probe the real VMEM ceiling of the fused MSER sweep on this chip.

Compiles + runs `fused_level_sweep` at increasing frame geometries to find
where the Mosaic compiler runs out of VMEM (state + temporaries).  The
result calibrates the strip-tiling budget in ops/mser_pallas.py.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from opencv_traffic_sign_detector_tpu.config import MSERConfig
    from opencv_traffic_sign_detector_tpu.ops.mser_pallas import (
        fused_level_sweep,
    )

    cfg = MSERConfig(max_variation=1.0, ccl_jumps=0)
    s = cfg.delta
    d_idx = 1
    num_levels = len(range(0, 256 + (d_idx + 1) * s + 1, s))
    rng = np.random.default_rng(0)

    # real frame content when available (convergence behaviour of the
    # while_loop depends on image structure; noise is the worst case)
    from bench import _load_frames
    from opencv_traffic_sign_detector_tpu.ops.color import bgr_to_gray

    base = np.asarray(bgr_to_gray(jnp.asarray(_load_frames(1, "gtsdb")[0])))

    # (rows, cols): current cap is 560k px; probe upward
    geoms = [
        (403, 683),    # ds=2 gtsdb (shipped)
        (546, 962),    # ds=2 1080p
        (802, 683),    # 560k ceiling region
        (802, 1362),   # ds=1 gtsdb  (1.09M)
        (960, 1362),   # 1.31M
        (960, 1922),   # 1.85M
        (1090, 1922),  # ds=1 1080p  (2.10M)
    ]
    from opencv_traffic_sign_detector_tpu.ops.mser_pallas import sweep_plan

    for h, w in geoms:
        reps_h = -(-h // base.shape[0])
        reps_w = -(-w // base.shape[1])
        g = np.tile(base, (reps_h, reps_w))[:h, :w]
        im2 = jnp.asarray(np.stack([g, 255 - g]).astype(np.uint8))
        plan = sweep_plan(h, w, cfg.topk_pool)
        print(f"  plan for {h}x{w}: {plan}")
        try:
            t0 = time.time()
            out = fused_level_sweep(im2, cfg, d_idx, num_levels)
            np.asarray(out[:, 0, 0]).sum()
            t_compile = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                out = fused_level_sweep(im2, cfg, d_idx, num_levels)
                np.asarray(out[:, 0, 0]).sum()
            dt = (time.time() - t0) / 3
            print(f"{h}x{w} ({h*w/1e6:.2f}M px): OK  "
                  f"compile {t_compile:.1f}s  run {dt*1e3:.1f} ms")
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{h}x{w} ({h*w/1e6:.2f}M px): FAIL  {msg}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
