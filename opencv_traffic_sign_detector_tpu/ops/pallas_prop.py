"""Pallas kernel: K iterations of masked 4-neighbour min propagation.

The MSER level sweep spends most of its time in roll-based min propagation
(:func:`.ccl.propagate_min_keys`).  As XLA ops, every iteration round-trips
the key array through HBM (~0.3-0.6 ms per iteration on a 1-2 MPix stack).
This kernel keeps the whole array resident in VMEM and iterates on-chip, so
K iterations cost one HBM read + one write total.

Constraints:
* the array (keys + mask) must fit VMEM — true for the sweep's default
  half-resolution stack ([2, ~403, ~683] int32 ~ 2.2 MB); callers fall back
  to the XLA path otherwise;
* borders must be background (mask False), matching the sweep's 255-padded
  frames: jnp.roll wraparound then only ever imports background.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident arrays (keys int32 + mask int8 + scratch).
_VMEM_LIMIT_ELEMS = 3 * 1024 * 1024  # ~12 MB of int32 equivalents


def _kernel(keys_ref, mask_ref, out_ref, *, num_rolls: int, big: int):
    k = keys_ref[:]
    m = mask_ref[:] != 0
    bigv = jnp.int32(big)
    k = jnp.where(m, k, bigv)

    h = keys_ref.shape[1]
    w = keys_ref.shape[2]

    def body(_, cur):
        # pltpu.roll requires non-negative shifts: -1 == size-1
        nb = jnp.minimum(
            jnp.minimum(
                pltpu.roll(cur, 1, axis=1), pltpu.roll(cur, h - 1, axis=1)
            ),
            jnp.minimum(
                pltpu.roll(cur, 1, axis=2), pltpu.roll(cur, w - 1, axis=2)
            ),
        )
        return jnp.where(m, jnp.minimum(cur, nb), bigv)

    out_ref[:] = jax.lax.fori_loop(0, num_rolls, body, k)


@functools.partial(jax.jit, static_argnames=("num_rolls", "big"))
def propagate_rolls_pallas(
    keys: jnp.ndarray, mask: jnp.ndarray, big: int, num_rolls: int
) -> jnp.ndarray:
    """[P, H, W] int32 keys + bool mask -> propagated keys (VMEM-resident).

    Caller guarantees border rows/cols of ``mask`` are False.
    """
    kern = functools.partial(_kernel, num_rolls=num_rolls, big=big)
    p, h, w = keys.shape
    # Grid over the leading (polarity) axis: each program holds one [1,H,W]
    # block in VMEM.  Under vmap the batch dim simply extends the grid, so
    # per-program VMEM stays bounded regardless of frame batch size.
    block = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(p,),
        out_shape=jax.ShapeDtypeStruct(keys.shape, keys.dtype),
        in_specs=[block, block],
        out_specs=block,
    )(keys, mask.astype(jnp.int8))


def _scan_kernel(keys_ref, mask_ref, out_ref, *, passes: int, big: int):
    """Full H/V segmented run-resolves (Hillis-Steele doubling) per pass.

    Converges in O(zigzag complexity) passes instead of O(diameter) rolls —
    the same scan primitive as the fused sweep's scan mode, here for the
    bbox-refinement flood over candidate windows.
    """
    m = mask_ref[:] != 0
    bigv = jnp.int32(big)
    k = jnp.where(m, keys_ref[:], bigv)
    h = keys_ref.shape[1]
    w = keys_ref.shape[2]

    def axis_resolve(v, axis):
        # flags ride as int32 0/1 — Mosaic has no sub-32-bit vector rotate
        size = h if axis == 1 else w
        mi = m.astype(jnp.int32)
        m_prev = pltpu.roll(mi, 1, axis=axis)
        m_next = pltpu.roll(mi, size - 1, axis=axis)
        seg_fwd = mi * (1 - m_prev)
        seg_bwd = mi * (1 - m_next)

        def dir_scan(x, seg, fwd):
            f = seg
            step = 1
            while step < size:
                amt = step if fwd else size - step
                fsh = pltpu.roll(f, amt, axis=axis)
                x = jnp.where(
                    f > 0, x, jnp.minimum(x, pltpu.roll(x, amt, axis=axis))
                )
                f = jnp.maximum(f, fsh)
                step *= 2
            return x

        out = jnp.minimum(dir_scan(v, seg_fwd, True),
                          dir_scan(v, seg_bwd, False))
        return jnp.where(m, out, bigv)

    for _ in range(passes):
        k = axis_resolve(k, 2)
        k = axis_resolve(k, 1)
    k = axis_resolve(k, 2)
    out_ref[:] = k


@functools.partial(jax.jit, static_argnames=("num_passes", "big", "interpret"))
def propagate_scan_pallas(
    keys: jnp.ndarray, mask: jnp.ndarray, big: int, num_passes: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[P, H, W] int32 keys + bool mask -> component-min keys via scans.

    Caller guarantees border rows/cols of ``mask`` are False.
    """
    kern = functools.partial(_scan_kernel, passes=num_passes, big=big)
    p, h, w = keys.shape
    block = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(p,),
        out_shape=jax.ShapeDtypeStruct(keys.shape, keys.dtype),
        in_specs=[block, block],
        out_specs=block,
        interpret=interpret,
    )(keys, mask.astype(jnp.int8))


def _flood_bbox_kernel(keys_ref, mask_ref, out_ref, *, passes: int, big: int):
    """Seed flood + bbox/area reduction for a chunk of candidate windows.

    keys [C, H, W] i32 ({0 at seed, big elsewhere}), mask [C, H, W] i8 ->
    out [C, 128] i32: (ymin, ymax, xmin, xmax, area) in lanes 0-4 of the
    seed's connected component per window.  Windows are independent along
    axis 0;
    the flood is the same segmented-scan resolve as `_scan_kernel`, and the
    reduction happens in VMEM so the [C, H, W] flood result never touches
    HBM (the old path materialized it and ran 5 XLA reductions over it).
    """
    m = mask_ref[:] != 0
    bigv = jnp.int32(big)
    k = jnp.where(m, keys_ref[:], bigv)
    c, h, w = keys_ref.shape

    def axis_resolve(v, axis):
        size = h if axis == 1 else w
        mi = m.astype(jnp.int32)
        m_prev = pltpu.roll(mi, 1, axis=axis)
        m_next = pltpu.roll(mi, size - 1, axis=axis)
        seg_fwd = mi * (1 - m_prev)
        seg_bwd = mi * (1 - m_next)

        def dir_scan(x, seg, fwd):
            f = seg
            step = 1
            while step < size:
                amt = step if fwd else size - step
                fsh = pltpu.roll(f, amt, axis=axis)
                x = jnp.where(
                    f > 0, x, jnp.minimum(x, pltpu.roll(x, amt, axis=axis))
                )
                f = jnp.maximum(f, fsh)
                step *= 2
            return x

        out = jnp.minimum(dir_scan(v, seg_fwd, True),
                          dir_scan(v, seg_bwd, False))
        return jnp.where(m, out, bigv)

    for _ in range(passes):
        k = axis_resolve(k, 2)
        k = axis_resolve(k, 1)
    k = axis_resolve(k, 2)

    sel = k == 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, h, w), 2)
    # two-step reductions (axis 2 then axis 1) and a lane-wide [C, 128]
    # output: Mosaic's layout inference rejects the narrow [C, 8] shapes
    ymin = jnp.min(jnp.min(jnp.where(sel, rows, bigv), axis=2),
                   axis=1, keepdims=True)
    ymax = jnp.max(jnp.max(jnp.where(sel, rows, -1), axis=2),
                   axis=1, keepdims=True)
    xmin = jnp.min(jnp.min(jnp.where(sel, cols, bigv), axis=2),
                   axis=1, keepdims=True)
    xmax = jnp.max(jnp.max(jnp.where(sel, cols, -1), axis=2),
                   axis=1, keepdims=True)
    area = jnp.sum(jnp.sum(sel.astype(jnp.int32), axis=2),
                   axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
    out = jnp.zeros((c, 128), jnp.int32)
    for j, v in enumerate([ymin, ymax, xmin, xmax, area]):
        out = jnp.where(lane == j, v, out)
    out_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("num_passes", "big", "interpret")
)
def flood_bbox_pallas(
    keys: jnp.ndarray, mask: jnp.ndarray, big: int, num_passes: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[N, H, W] seed maps + masks -> [N, 128] (ymin, ymax, xmin, xmax, area
    in lanes 0-4; lane-width output keeps Mosaic layouts legal).

    The fused form of ``propagate_scan_pallas(...) == 0`` followed by bbox
    reductions (`.mser._refine_boxes`); windows are processed in chunks of 8
    so the flood state stays small and programs pipeline.
    """
    n, h, w = keys.shape
    chunk = 8 if n % 8 == 0 else (4 if n % 4 == 0 else 1)
    kern = functools.partial(_flood_bbox_kernel, passes=num_passes, big=big)
    block = pl.BlockSpec((chunk, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n // chunk,),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.int32),
        in_specs=[block, block],
        out_specs=pl.BlockSpec((chunk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            # the unrolled Hillis-Steele doubling keeps several whole-chunk
            # temporaries live; the default 16 MB window is too small
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(keys, mask.astype(jnp.int8))


def pallas_available_for(shape: tuple[int, ...]) -> bool:
    """Whether the resident-propagation kernel fits this problem on TPU."""
    # per-program block is one [1, H, W] slice of the stack
    elems = shape[-1] * shape[-2]
    if elems > _VMEM_LIMIT_ELEMS:
        return False
    from .mser_pallas import force_interpret

    if force_interpret():
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
