#!/usr/bin/env python3
"""Decompose CNN detector cost at 1080p: per-stage time, FLOPs, MXU util.

    python scripts/cnn_profile.py [--batch 16] [--size 1080p|gtsdb]

Times (a) the full detect (forward+decode), (b) forward only, (c) decode
only, (d) each backbone segment in isolation, so optimization targets the
measured bottleneck rather than the FLOP count alone.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opencv_traffic_sign_detector_tpu.models import cnn_detector as cd


def _sync(out):
    """Force real device completion: block_until_ready is a no-op through
    the axon tunnel, so fetch one scalar D2H — the device queue is serial,
    so its arrival bounds all prior compute."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def conv_flops(cells, cin, cout, k=9):
    return cells * cin * cout * k * 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", default="1080p", choices=["1080p", "gtsdb"])
    ap.add_argument("--segments", action="store_true",
                    help="also time truncated-prefix networks (many compiles)")
    args = ap.parse_args()

    h, w = (1088, 1920) if args.size == "1080p" else (800, 1360)
    b = args.batch
    ckpt = cd.__file__.replace(
        "opencv_traffic_sign_detector_tpu/models/cnn_detector.py",
        "artifacts/cnn_detector/params.npz")
    det = cd.CNNDetector.load(ckpt)  # arch/threshold from the npz tags
    cfg, params = det.cfg, det.params
    print(f"arch {cfg.arch} (stride {cfg.stride})")

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), np.uint8))

    model = cd.SignCenterNet(cfg)

    fwd = jax.jit(lambda p, f: model.apply({"params": p}, f))
    full = jax.jit(lambda p, f: cd.decode_detections(
        model.apply({"params": p}, f), cfg.max_detections,
        cfg.score_threshold, cfg.stride))

    t_full = timeit(full, params, frames)
    t_fwd = timeit(fwd, params, frames)
    out = fwd(params, frames)
    out = jax.tree.map(lambda x: jax.block_until_ready(x), out)
    dec = jax.jit(lambda o: cd.decode_detections(o, cfg.max_detections,
                                                 cfg.score_threshold,
                                                 cfg.stride))
    t_dec = timeit(dec, out)

    # FLOP model of the network (see SignCenterNet.__call__)
    s4 = (h // 4) * (w // 4)
    s8 = (h // 8) * (w // 8)
    s16 = (h // 16) * (w // 16)
    f = cfg
    if f.arch == "v3":
        flops = (
            conv_flops(s8, 3, 64, k=64) +        # 8x8 patchify
            conv_flops(s16, 64, 128) +
            conv_flops(s16, 128, 128) * 2 +
            conv_flops(s16, 128, 6) +
            conv_flops(s16, 128, 2) * 2
        ) * b
    elif f.arch == "slim":
        flops = (
            conv_flops(s8, 48, f.stem_features) +
            conv_flops(s8, f.stem_features, f.mid_features) +
            conv_flops(s16, f.mid_features, f.mid_features) +
            conv_flops(s16, f.mid_features, f.deep_features) +
            conv_flops(s16, f.deep_features, f.deep_features) +
            conv_flops(s16, f.deep_features, f.mid_features, k=1) +
            conv_flops(s8, f.mid_features, f.head_features) +
            conv_flops(s8, f.head_features, f.head_features) +
            conv_flops(s8, f.head_features, 6) +
            conv_flops(s8, f.head_features, 2) * 2
        ) * b
    else:
        flops = (
            conv_flops(s4, 48, f.stem_features) +
            conv_flops(s8, f.stem_features, f.stem_features) +
            conv_flops(s8, f.stem_features, f.mid_features) +
            conv_flops(s16, f.mid_features, f.mid_features) +
            conv_flops(s16, f.mid_features, f.deep_features) +
            conv_flops(s16, f.deep_features, f.deep_features) +
            conv_flops(s8, f.mid_features + f.deep_features, f.head_features) +
            conv_flops(s8, f.head_features, f.head_features) +
            conv_flops(s8, f.head_features, 6) +
            conv_flops(s8, f.head_features, 2) * 2
        ) * b

    fps_full = b / t_full
    fps_fwd = b / t_fwd
    print(f"size={args.size} batch={b}")
    print(f"full (fwd+decode): {t_full*1e3:8.2f} ms  {fps_full:8.1f} fps")
    print(f"forward only:      {t_fwd*1e3:8.2f} ms  {fps_fwd:8.1f} fps")
    print(f"decode only:       {t_dec*1e3:8.2f} ms")
    print(f"model FLOPs/batch: {flops/1e9:.1f} GFLOP "
          f"-> {flops/t_fwd/1e12:.1f} TFLOP/s achieved")

    if not args.segments:
        return

    # Segment timings: run truncated networks to attribute time.  The
    # prefix block list is branched on cfg.arch so segment deltas attribute
    # the network actually being profiled (ADVICE r3 #5).
    dt = cfg.compute_dtype()

    def stem_only(p, fr):
        x = fr.astype(dt) / 255.0 - 0.5
        if cfg.arch != "v3":
            x = cd._space_to_depth(x, 4)
        return x

    x0 = jax.jit(stem_only)(params, frames)
    jax.block_until_ready(x0)
    print(f"input prep:         {timeit(jax.jit(stem_only), params, frames)*1e3:.2f} ms")

    import flax.linen as nn

    # (features, stride, kernel) per trunk conv, per arch
    if cfg.arch == "v3":
        ARCH_BLOCKS = [(64, 8, 8), (128, 2, 3), (128, 1, 3), (128, 1, 3)]
    elif cfg.arch == "slim":
        ARCH_BLOCKS = [
            (cfg.stem_features, 2, 3), (cfg.mid_features, 1, 3),
            (cfg.mid_features, 2, 3), (cfg.deep_features, 1, 3),
            (cfg.deep_features, 1, 3),
        ]
    else:  # base
        ARCH_BLOCKS = [
            (cfg.stem_features, 1, 3), (cfg.stem_features, 2, 3),
            (cfg.mid_features, 1, 3), (cfg.mid_features, 2, 3),
            (cfg.deep_features, 1, 3), (cfg.deep_features, 1, 3),
        ]

    class Prefix(nn.Module):
        cfg: cd.CNNDetectorConfig
        depth: int

        @nn.compact
        def __call__(self, fr):
            c = self.cfg
            dtt = c.compute_dtype()
            if c.arch == "v3":
                # shipped stem formulation: patchify + K=192 matmul
                x = cd._PatchifyStem(features=ARCH_BLOCKS[0][0],
                                     patch=8, dtype=dtt)(fr)
                blocks = ARCH_BLOCKS[1:][: self.depth - 1]
            else:
                x = fr.astype(dtt) / 255.0 - 0.5
                x = cd._space_to_depth(x, 4)
                blocks = ARCH_BLOCKS[: self.depth]
            for feat, stride, k in blocks:
                if c.arch == "v3":
                    x = nn.relu(nn.Conv(feat, (k, k),
                                        strides=(stride, stride),
                                        dtype=dtt)(x))
                else:
                    x = cd._ConvBlock(feat, stride=stride, dtype=dtt)(x)
            return x.sum()

    prev = 0.0
    for d in range(1, len(ARCH_BLOCKS) + 1):
        m = Prefix(cfg, d)
        p = m.init(jax.random.PRNGKey(0), frames[:1])
        fn = jax.jit(lambda pp, fr: m.apply(pp, fr))
        t = timeit(fn, p, frames, iters=5)
        print(f"prefix depth {d}: {t*1e3:8.2f} ms (+{(t-prev)*1e3:6.2f})")
        prev = t


if __name__ == "__main__":
    main()
