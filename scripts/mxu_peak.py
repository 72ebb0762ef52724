#!/usr/bin/env python3
"""Measure this chip's achievable bf16 matmul and conv throughput.

Establishes the speed-of-light reference for the CNN detector's
MXU-utilization numbers (scripts/cnn_profile.py): a big square bf16 matmul
is the best case the systolic array offers; the conv probes show how much
of that the detector's actual (cells x 9*Cin x Cout) shapes can reach.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)

    # Square bf16 matmuls: the MXU's best case.
    for n in (4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)
        f = jax.jit(lambda x, y: (x @ y).astype(jnp.bfloat16))
        t = timeit(f, a, b, iters=args.iters)
        tf = 2 * n**3 / t / 1e12
        print(f"matmul {n}x{n}x{n} bf16: {t*1e3:7.2f} ms  {tf:6.1f} TFLOP/s")

    # Conv shapes matching the detector's actual geometry (1080p batch 16).
    convs = [
        ("stem s4 48->64", (16, 272, 480, 48), 64),
        ("head s8 224->96", (16, 136, 240, 224), 96),
        ("head s8 96->96", (16, 136, 240, 96), 96),
        ("deep s16 128->128", (16, 68, 120, 128), 128),
        ("wide s8 256->256", (16, 136, 240, 256), 256),
    ]
    for name, shape, cout in convs:
        x = jax.random.normal(key, shape, jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, shape[-1], cout), jnp.bfloat16)
        f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16))
        t = timeit(f, x, w, iters=args.iters)
        cells = shape[0] * shape[1] * shape[2]
        fl = cells * shape[-1] * cout * 9 * 2
        print(f"conv {name:20s}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
