"""Probe: does XLA on this chip lower s8xs8->s32 conv/matmul to the int8 MXU?

Times the v3 trunk's hot conv shape (batch 128, 1080p s16 grid 68x120,
3x3 128->128) in bf16 vs int8, plus a big matmul for the raw MXU ratio.

Measured on TPU v5e (see PARITY.md round-4 int8 note): conv bf16
4.12 ms / 74.8 TFLOP/s vs int8 4.24 ms — no int8 rate win through XLA;
int8 + fused relu/requant epilogue 3.06 ms / 100.8 TOP/s, a bandwidth
win from the 4x-smaller activation write, recorded as a round-5 lever.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print(jax.devices())

B, H, W, C = 128, 68, 120, 128
rng = np.random.default_rng(0)


def timeit(f, *args, iters=20):
    # block_until_ready is a no-op through the axon relay; force a real
    # serial-queue sync with a scalar D2H read of the LAST dispatch.
    out = f(*args)
    np.asarray(out.reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(out.reshape(-1)[0])
    return (time.time() - t0) / iters


# ---- conv 3x3 128->128 ----
x_f = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
k_f = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
x_i = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
k_i = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)

dn = lax.conv_dimension_numbers(x_f.shape, k_f.shape,
                                ("NHWC", "HWIO", "NHWC"))


@jax.jit
def conv_bf16(x, k):
    return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                    dimension_numbers=dn)


@jax.jit
def conv_int8(x, k):
    return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.int32)


flop = 2 * B * H * W * C * C * 9
t = timeit(conv_bf16, x_f, k_f)
print(f"conv bf16: {t*1e3:.3f} ms  {flop/t/1e12:.1f} TFLOP/s")
try:
    t = timeit(conv_int8, x_i, k_i)
    print(f"conv int8: {t*1e3:.3f} ms  {flop/t/1e12:.1f} TOP/s")
except Exception as e:
    print("conv int8 FAILED:", repr(e)[:300])

# ---- big matmul ratio ----
N = 4096
a_f = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
b_f = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
a_i = jnp.asarray(rng.integers(-127, 127, (N, N)), jnp.int8)
b_i = jnp.asarray(rng.integers(-127, 127, (N, N)), jnp.int8)

mm_f = jax.jit(lambda a, b: a @ b)
mm_i = jax.jit(lambda a, b: lax.dot(a, b, preferred_element_type=jnp.int32))
flop = 2 * N ** 3
t = timeit(mm_f, a_f, b_f)
print(f"matmul bf16: {t*1e3:.3f} ms  {flop/t/1e12:.1f} TFLOP/s")
try:
    t = timeit(mm_i, a_i, b_i)
    print(f"matmul int8: {t*1e3:.3f} ms  {flop/t/1e12:.1f} TOP/s")
except Exception as e:
    print("matmul int8 FAILED:", repr(e)[:300])

# ---- int8 conv with requant epilogue (the realistic serving op) ----
scale = jnp.float32(0.02)


@jax.jit
def conv_int8_requant(x, k):
    y = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    y = jnp.maximum(y, 0)
    q = jnp.clip(jnp.round(y.astype(jnp.float32) * scale), 0, 127)
    return q.astype(jnp.int8)


try:
    t = timeit(conv_int8_requant, x_i, k_i)
    flop = 2 * B * H * W * C * C * 9
    print(f"conv int8+requant: {t*1e3:.3f} ms  {flop/t/1e12:.1f} TOP/s")
except Exception as e:
    print("conv int8 requant FAILED:", repr(e)[:300])
