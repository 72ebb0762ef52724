#!/usr/bin/env python3
"""Time forward-pass variants of the CNN detector to attribute cost.

    python scripts/cnn_variants.py --batch 16 --variant <name>

Variants (fresh-init params; timing only, not quality):
  base        shipped SignCenterNet
  nonorm      GroupNorm removed (pure conv+relu chain)
  addfpn      concat-FPN replaced by 1x1-projected add
  bf16heads   hm/size/off convs in bf16 (f32 cast at the end)
  slim        addfpn + bf16heads + stride-2 stem (no s4-resident conv)
  all         nonorm + slim

v2 candidates (MXU-fill redesign — mxu_peak.py measured 14-38 TFLOP/s on
the shipped 48-128-channel convs vs 89.5 on a 256-channel s8 conv, so the
v2 family moves compute to >=128-channel contractions and off the big
stride-4/8 grids):
  v2wide      s8@128 + s16@256, one s8 conv each side of the FPN add
  v2s16       everything at s16@192, heads on the s16 grid
  v2s16wide   everything at s16@256, heads on the s16 grid
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opencv_traffic_sign_detector_tpu.models import cnn_detector as cd


def _sync(out):
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


class Block(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=not self.norm, dtype=self.dtype)(x)
        if self.norm:
            x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        return nn.relu(x)


class Variant(nn.Module):
    norm: bool = True
    addfpn: bool = False
    bf16heads: bool = False
    slim_stem: bool = False

    @nn.compact
    def __call__(self, frames_u8):
        cfg = cd.CNNDetectorConfig()
        dt = jnp.bfloat16
        x = frames_u8.astype(dt) * jnp.asarray(1 / 255.0, dt) - jnp.asarray(0.5, dt)
        x = cd._space_to_depth(x, 4)
        if self.slim_stem:
            x = Block(cfg.stem_features, stride=2, dtype=dt, norm=self.norm)(x)  # s8
        else:
            x = Block(cfg.stem_features, dtype=dt, norm=self.norm)(x)
            x = Block(cfg.stem_features, stride=2, dtype=dt, norm=self.norm)(x)
        s8 = Block(cfg.mid_features, dtype=dt, norm=self.norm)(x)
        x = Block(cfg.mid_features, stride=2, dtype=dt, norm=self.norm)(s8)
        x = Block(cfg.deep_features, dtype=dt, norm=self.norm)(x)
        x = Block(cfg.deep_features, dtype=dt, norm=self.norm)(x)
        b, h16, w16, c = x.shape
        if self.addfpn:
            x = nn.Conv(cfg.mid_features, (1, 1), dtype=dt)(x)
            up = jax.image.resize(x, (b, h16 * 2, w16 * 2, cfg.mid_features),
                                  "nearest")
            fused = s8 + up
        else:
            up = jax.image.resize(x, (b, h16 * 2, w16 * 2, c), "nearest")
            fused = jnp.concatenate([s8, up], axis=-1)
        feat = Block(cfg.head_features, dtype=dt, norm=self.norm)(fused)
        feat = Block(cfg.head_features, dtype=dt, norm=self.norm)(feat)
        hd = dt if self.bf16heads else jnp.float32
        fin = feat if self.bf16heads else feat.astype(jnp.float32)
        hm = nn.Conv(6, (3, 3), dtype=hd)(fin).astype(jnp.float32)
        size = nn.Conv(2, (3, 3), dtype=hd)(fin).astype(jnp.float32)
        off = nn.Conv(2, (3, 3), dtype=hd)(fin).astype(jnp.float32)
        return {"hm": hm, "size": size, "off": off}


class V2Wide(nn.Module):
    """Slim stem to s8@128, bulk compute at s16@256, add-FPN, bf16 heads."""

    @nn.compact
    def __call__(self, frames_u8):
        dt = jnp.bfloat16
        x = frames_u8.astype(dt) * jnp.asarray(1 / 255.0, dt) - jnp.asarray(0.5, dt)
        x = cd._space_to_depth(x, 4)
        s8 = Block(128, stride=2, dtype=dt)(x)          # 48 -> 128 @ s8
        x = Block(256, stride=2, dtype=dt)(s8)          # 128 -> 256 @ s16
        x = Block(256, dtype=dt)(x)
        x = Block(256, dtype=dt)(x)
        b, h16, w16, _ = x.shape
        x = nn.Conv(128, (1, 1), dtype=dt)(x)
        up = jax.image.resize(x, (b, h16 * 2, w16 * 2, 128), "nearest")
        feat = Block(128, dtype=dt)(s8 + up)            # one s8 head conv
        hm = nn.Conv(6, (3, 3), dtype=dt)(feat).astype(jnp.float32)
        size = nn.Conv(2, (3, 3), dtype=dt)(feat).astype(jnp.float32)
        off = nn.Conv(2, (3, 3), dtype=dt)(feat).astype(jnp.float32)
        return {"hm": hm, "size": size, "off": off}


class V2S16(nn.Module):
    """All compute at stride 16; heads on the s16 grid (decode stride 16)."""

    width: int = 192

    @nn.compact
    def __call__(self, frames_u8):
        dt = jnp.bfloat16
        w = self.width
        x = frames_u8.astype(dt) * jnp.asarray(1 / 255.0, dt) - jnp.asarray(0.5, dt)
        x = cd._space_to_depth(x, 4)
        x = Block(w // 2, stride=2, dtype=dt)(x)        # 48 -> w/2 @ s8
        x = Block(w, stride=2, dtype=dt)(x)             # w/2 -> w @ s16
        x = Block(w, dtype=dt)(x)
        x = Block(w, dtype=dt)(x)
        x = Block(w, dtype=dt)(x)
        hm = nn.Conv(6, (3, 3), dtype=dt)(x).astype(jnp.float32)
        size = nn.Conv(2, (3, 3), dtype=dt)(x).astype(jnp.float32)
        off = nn.Conv(2, (3, 3), dtype=dt)(x).astype(jnp.float32)
        return {"hm": hm, "size": size, "off": off}


VARIANTS = {
    "base": dict(),
    "nonorm": dict(norm=False),
    "addfpn": dict(addfpn=True),
    "bf16heads": dict(bf16heads=True),
    "slim": dict(addfpn=True, bf16heads=True, slim_stem=True),
    "all": dict(norm=False, addfpn=True, bf16heads=True, slim_stem=True),
    "v2wide": V2Wide,
    "v2s16": V2S16,
    "v2s16wide": partial(V2S16, width=256),
}


def product_timing(arch: str, batch: int, size: str, iters: int) -> None:
    """Time the PRODUCT inference path (forward + decode via _detect_jit)
    with fresh-init params — the scope that decides the bench headline.
    Decode is included because at >2000 fps the s8 top-k is a material
    fraction of the frame budget (PARITY.md r3)."""
    h, w = (1088, 1920) if size == "1080p" else (800, 1360)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3), np.uint8))
    cfg = cd.CNNDetectorConfig(arch=arch)
    det = cd.CNNDetector(cd.init_params(cfg), cfg)
    out = det.dispatch(frames)
    np.asarray(out[2][0, 0])
    t0 = time.perf_counter()
    outs = [det.dispatch(frames) for _ in range(iters)]
    np.asarray(outs[-1][2][0, 0])
    dt = time.perf_counter() - t0
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(det.params))
    print(f"{arch:10s} product batch={batch} {size} "
          f"{dt / iters * 1e3:8.2f} ms/batch "
          f"{iters * batch / dt:8.1f} fps  ({n_params/1e3:.0f}k params)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", default="1080p", choices=["1080p", "gtsdb"])
    ap.add_argument("--variant", default="base",
                    choices=sorted(VARIANTS) + ["product"])
    ap.add_argument("--arch", default="slim",
                    help="product mode: CNNDetectorConfig arch to time")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    if args.variant == "product":
        product_timing(args.arch, args.batch, args.size, args.iters)
        return

    h, w = (1088, 1920) if args.size == "1080p" else (800, 1360)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (args.batch, h, w, 3), np.uint8))

    spec = VARIANTS[args.variant]
    m = Variant(**spec) if isinstance(spec, dict) else spec()
    p = m.init(jax.random.PRNGKey(0), frames[:1])
    fn = jax.jit(lambda pp, fr: m.apply(pp, fr))
    t = timeit(fn, p, frames)
    print(f"{args.variant:10s} batch={args.batch} {t*1e3:8.2f} ms "
          f"{args.batch/t:8.1f} fps")


if __name__ == "__main__":
    main()
