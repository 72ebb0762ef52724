#!/usr/bin/env python3
"""Isolate TPU primitive costs/crashes: scatter, gather, sort, assoc-scan.

Run each primitive separately with a timeout so one crash doesn't hide the
others:  python scripts/tpu_microbench.py <case>
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main(case: str):
    n = 1_088_000  # 1360*800
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    vals = jnp.asarray(rng.integers(0, 255, n), jnp.int32)
    img = jnp.asarray(rng.integers(0, 255, (800, 1360)), jnp.int32)

    if case == "scatter_add_i32":
        f = jax.jit(lambda i, v: jnp.zeros((n + 1,), jnp.int32).at[i].add(v))
        print(case, bench(f, idx, vals))
    elif case == "scatter_min_i32":
        f = jax.jit(lambda i, v: jnp.full((n + 1,), 2**30, jnp.int32).at[i].min(v))
        print(case, bench(f, idx, vals))
    elif case == "scatter_max_u16":
        v16 = vals.astype(jnp.uint16)
        f = jax.jit(lambda i, v: jnp.zeros((n + 1,), jnp.uint16).at[i].max(v))
        print(case, bench(f, idx, v16))
    elif case == "gather_i32":
        f = jax.jit(lambda i, v: v[i])
        print(case, bench(f, idx, vals))
    elif case == "sort_i32":
        f = jax.jit(jnp.sort)
        print(case, bench(f, vals))
    elif case == "assoc_scan_rows":
        def seg_min_rows(x):
            def comb(a, b):
                m1, s1 = a
                m2, s2 = b
                return jnp.where(s2, m2, jnp.minimum(m1, m2)), s1 | s2
            m, _ = jax.lax.associative_scan(
                comb, (x, x > 128), axis=1
            )
            return m
        f = jax.jit(seg_min_rows)
        print(case, bench(f, img))
    elif case == "elemwise_pass":
        f = jax.jit(lambda x: jnp.minimum(jnp.minimum(x, jnp.roll(x, 1, 0)),
                                          jnp.roll(x, 1, 1)) + 1)
        print(case, bench(f, img))
    elif case == "top_k":
        big = jnp.asarray(rng.random((74 * n // 8,)), jnp.float32)
        f = jax.jit(lambda x: jax.lax.top_k(x, 1024))
        print(case, bench(f, big, iters=2))
    elif case == "take_table":
        tbl = jnp.asarray(rng.integers(0, 255, 256), jnp.int32)
        f = jax.jit(lambda t, x: jnp.take(t, x))
        print(case, bench(f, tbl, img))
    else:
        print("unknown case", case)


if __name__ == "__main__":
    main(sys.argv[1])
