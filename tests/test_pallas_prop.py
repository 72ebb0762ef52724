"""Pallas propagation kernel: interpret-mode equality with the XLA path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencv_traffic_sign_detector_tpu.ops import pallas_prop as P


def _xla_ref(keys, mask, big, iters):
    k = jnp.where(mask, keys, big)

    def roll_min(x):
        m = jnp.minimum(
            jnp.minimum(jnp.roll(x, 1, -2), jnp.roll(x, -1, -2)),
            jnp.minimum(jnp.roll(x, 1, -1), jnp.roll(x, -1, -1)),
        )
        return jnp.where(mask, jnp.minimum(x, m), big)

    return jax.lax.fori_loop(0, iters, lambda i, y: roll_min(y), k)


@pytest.mark.parametrize("density", [0.2, 0.5])
def test_kernel_matches_xla_interpret(density):
    rng = np.random.default_rng(int(density * 10))
    shape = (2, 64, 128)
    keys = rng.integers(0, 2**20, shape).astype(np.int32)
    mask = rng.random(shape) < density
    mask[:, 0, :] = mask[:, -1, :] = mask[:, :, 0] = mask[:, :, -1] = False
    big = 2**21
    kern = functools.partial(P._kernel, num_rolls=16, big=big)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(jnp.asarray(keys), jnp.asarray(mask).astype(jnp.int8))
    expect = _xla_ref(jnp.asarray(keys), jnp.asarray(mask), big, 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_availability_gate():
    # CPU backend in tests: the TPU-resident path must report unavailable
    assert not P.pallas_available_for((2, 403, 683))
    # far beyond VMEM
    assert not P.pallas_available_for((2, 4000, 4000))


def test_scan_flood_matches_roll_flood():
    """Segmented-scan flood must reach exactly the seed's component, same
    as converged roll propagation (interpret mode)."""
    import jax.numpy as jnp

    from opencv_traffic_sign_detector_tpu.ops.pallas_prop import (
        propagate_scan_pallas,
    )

    h = w = 64
    rng = np.random.default_rng(11)
    mask = np.zeros((2, h, w), bool)
    # blob + an L in window 0, separate distractor blob
    mask[0, 10:30, 10:30] = True
    mask[0, 30:50, 10:16] = True       # attached leg -> L overall
    mask[0, 40:50, 40:55] = True       # unconnected
    # ring shape in window 1
    mask[1, 8:40, 8:40] = True
    mask[1, 14:34, 14:34] = False
    big = h * w + 1
    seeds = np.full((2, h, w), big, np.int32)
    seeds[0, 12, 12] = 0
    seeds[1, 8, 8] = 0

    reach_scan = np.asarray(
        propagate_scan_pallas(jnp.asarray(seeds), jnp.asarray(mask), big, 3,
                              interpret=True)
    )
    # oracle: scipy-style flood via simple BFS in numpy
    from collections import deque

    for p in range(2):
        want = np.zeros((h, w), bool)
        sy, sx = np.argwhere(seeds[p] == 0)[0]
        q = deque([(sy, sx)])
        want[sy, sx] = True
        while q:
            y, x = q.popleft()
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w and mask[p, yy, xx] and not want[yy, xx]:
                    want[yy, xx] = True
                    q.append((yy, xx))
        got = reach_scan[p] == 0
        np.testing.assert_array_equal(got, want, err_msg=f"window {p}")


def test_flood_bbox_pallas_matches_reductions():
    """Fused flood+bbox kernel == scan flood followed by XLA reductions."""
    import jax.numpy as jnp
    import numpy as np

    from opencv_traffic_sign_detector_tpu.ops.pallas_prop import (
        flood_bbox_pallas,
        propagate_scan_pallas,
    )

    h = w = 64
    mask = np.zeros((4, h, w), bool)
    mask[0, 10:30, 10:30] = True
    mask[0, 30:50, 10:16] = True
    mask[1, 8:40, 8:40] = True
    mask[1, 14:34, 14:34] = False
    mask[2, 5:9, 50:60] = True
    # window 3: seed not on the mask -> empty component
    big = h * w + 1
    seeds = np.full((4, h, w), big, np.int32)
    for p, (sy, sx) in enumerate([(12, 12), (8, 8), (6, 51), (20, 20)]):
        seeds[p, sy, sx] = 0
    seeds_j, mask_j = jnp.asarray(seeds), jnp.asarray(mask)

    out = np.asarray(flood_bbox_pallas(seeds_j, mask_j, big, 3,
                                       interpret=True))
    sel = np.asarray(
        propagate_scan_pallas(seeds_j, mask_j, big, 3, interpret=True)
    ) == 0
    rows = np.arange(h)[:, None] + np.zeros((1, w), int)
    cols = np.arange(w)[None, :] + np.zeros((h, 1), int)
    for p in range(4):
        s = sel[p]
        exp = (
            np.where(s, rows, big).min(),
            np.where(s, rows, -1).max(),
            np.where(s, cols, big).min(),
            np.where(s, cols, -1).max(),
            int(s.sum()),
        )
        assert tuple(out[p, :5]) == exp, (p, out[p, :5], exp)
        assert (out[p, 5:] == 0).all()
