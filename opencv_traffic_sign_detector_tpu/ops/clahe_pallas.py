"""Pallas TPU kernels for CLAHE: tile histograms + interpolated LUT apply.

The XLA formulation of CLAHE (`.clahe`) is correct but gather/scatter bound
on this hardware: the bilinear LUT application alone is 4 per-pixel gathers
(~270 ms per 4-frame 1360x800 batch through the relay's ~10 ms/M gather
cost).  These kernels keep everything in the VPU/MXU fast path:

* ``tile_histograms_pallas`` — per-tile 256-bin histograms via a bin loop of
  compare + two small matmuls (column/row tile selectors), one program per
  frame, zero scatters.
* ``clahe_apply_pallas`` — the bilinear-interpolated LUT application.  Per
  half-tile row strip, the four neighbouring tile LUTs reduce to two
  *column-blended* tables ``LT/LB [256, W]`` (one [256,T]x[T,W] matmul each
  — the x-interpolation becomes a static mixing matrix), then a 256-step
  bin loop accumulates ``where(v==b, (1-ya)*LT[b] + ya*LB[b])`` — the
  y-interpolation — with no gathers at all.

Semantics match `.clahe.clahe_equalize` (OpenCV createCLAHE: clip 2.0,
8x8 tiles, reference use `Deteción de Objetos/source.py:141-142`); parity
is asserted in tests against both the XLA path and the cv2 oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clahe import _clip_and_redistribute, _interp_coords, _tile_luts


def _hist_kernel(x_ref, colsel_ref, rowsel_ref, out_ref):
    """x [1,H,W] u8; colsel [W,T] & rowsel [T,H] 0/1 f32 ->
    out [1, 256, T, T] i32 (bin-major; caller transposes)."""
    v = x_ref[0].astype(jnp.int32)  # u8 vector compares are unsupported
    colsel = colsel_ref[:]
    rowsel = rowsel_ref[:]

    def body(b, _):
        m = (v == b).astype(jnp.float32)
        per_col = jax.lax.dot(m, colsel, preferred_element_type=jnp.float32)
        per_tile = jax.lax.dot(rowsel, per_col,
                               preferred_element_type=jnp.float32)
        out_ref[0, b] = per_tile.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, 256, body, 0)


@functools.partial(jax.jit, static_argnames=("tiles", "interpret"))
def tile_histograms_pallas(
    x: jnp.ndarray, tiles: int = 8, interpret: bool = False
) -> jnp.ndarray:
    """[B, H, W] uint8 (H, W divisible by tiles) -> [B, T, T, 256] int32."""
    b, h, w = x.shape
    th, tw = h // tiles, w // tiles
    colsel = np.zeros((w, tiles), np.float32)
    colsel[np.arange(w), np.arange(w) // tw] = 1.0
    rowsel = np.zeros((tiles, h), np.float32)
    rowsel[np.arange(h) // th, np.arange(h)] = 1.0

    out = pl.pallas_call(
        _hist_kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 256, tiles, tiles), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tiles), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tiles, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 256, tiles, tiles),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(colsel), jnp.asarray(rowsel))
    # [B, 256, T, T] -> [B, T, T, 256]
    return out.transpose(0, 2, 3, 1)


def _apply_kernel(x_ref, luts_ref, wmix_ref, ya_ref, out_ref,
                  lt_ref, lb_ref):
    """x [1,1,hh,W] u8; luts [1,1,2,256,T] f32 (top/bottom strip LUT rows,
    bin-major); wmix [T,W] static column-interp mix; ya [1,hh,128] ->
    out [1,1,hh,W] u8.  lt/lb: [256, W] VMEM scratch (rows dynamically
    sliced inside the bin loop — values can't be, refs can)."""
    v = x_ref[0, 0].astype(jnp.int32)  # u8 vector compares are unsupported
    wmix = wmix_ref[:]
    # column-blended tables: [256, T] @ [T, W] -> [256, W]
    # HIGHEST precision: keeps the blend f32-exact so rint decisions match
    # the XLA reference path (default MXU precision flips ~8% of pixels by 1)
    lt_ref[:] = jax.lax.dot(luts_ref[0, 0, 0], wmix,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    lb_ref[:] = jax.lax.dot(luts_ref[0, 0, 1], wmix,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    ya = ya_ref[0][:, :1]  # [hh, 1] (lane-padded input)
    yb = 1.0 - ya
    acc = jnp.zeros(v.shape, jnp.float32)

    def body(b, acc):
        row_t = lt_ref[pl.ds(b, 1), :]  # [1, W]
        row_b = lb_ref[pl.ds(b, 1), :]
        blended = yb * row_t + ya * row_b
        return jnp.where(v == b, blended, acc)

    acc = jax.lax.fori_loop(0, 256, body, acc)
    # Mosaic has no f32->u8 cast; round-trip through int32
    out_ref[0, 0] = (
        jnp.clip(jnp.rint(acc), 0.0, 255.0).astype(jnp.int32)
        .astype(jnp.uint8)
    )


@functools.partial(jax.jit, static_argnames=("tiles", "interpret"))
def clahe_apply_pallas(
    x: jnp.ndarray, luts: jnp.ndarray, tiles: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear-interpolated LUT application.

    x: [B, H, W] uint8 with H/tiles even and W divisible by tiles;
    luts: [B, T, T, 256] uint8/float per-tile LUTs.  Returns uint8 [B,H,W].
    """
    b, h, w = x.shape
    th, tw = h // tiles, w // tiles
    hh = th // 2
    n_half = 2 * tiles

    ty1, ty2, ya = _interp_coords(h, tiles, th)
    tx1, tx2, xa = _interp_coords(w, tiles, tw)
    # Within a half-tile row strip the (top, bottom) tile rows are constant;
    # verify and collect them per strip.
    ty1 = ty1.reshape(n_half, hh)
    ty2 = ty2.reshape(n_half, hh)
    assert (ty1 == ty1[:, :1]).all() and (ty2 == ty2[:, :1]).all()
    strip_rows = np.stack([ty1[:, 0], ty2[:, 0]], axis=1)  # [n_half, 2]
    # lane-padded to 128 so the BlockSpec satisfies TPU tiling constraints
    ya_strips = np.repeat(
        ya.reshape(n_half, hh, 1).astype(np.float32), 128, axis=2
    )

    # Static column mixing matrix: wmix[t, x] = (1-xa)*[tx1==t] + xa*[tx2==t]
    wmix = np.zeros((tiles, w), np.float32)
    np.add.at(wmix, (tx1, np.arange(w)), 1.0 - xa)
    np.add.at(wmix, (tx2, np.arange(w)), xa)

    # Per-strip top/bottom LUT rows, bin-major: [B, n_half, 2, 256, T] f32
    luts_f = luts.astype(jnp.float32)
    strip_luts = (
        luts_f[:, strip_rows.reshape(-1), :, :]
        .reshape(b, n_half, 2, tiles, 256)
        .transpose(0, 1, 2, 4, 3)
    )

    # strips exposed as a leading axis so block dims match array dims
    x_strips = x.reshape(b, n_half, hh, w)
    out = pl.pallas_call(
        _apply_kernel,
        grid=(b, n_half),
        out_shape=jax.ShapeDtypeStruct((b, n_half, hh, w), jnp.uint8),
        in_specs=[
            pl.BlockSpec((1, 1, hh, w), lambda i, s: (i, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, 256, tiles),
                         lambda i, s: (i, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tiles, w), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, 128), lambda i, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hh, w), lambda i, s: (i, s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((256, w), jnp.float32),
            pltpu.VMEM((256, w), jnp.float32),
        ],
        interpret=interpret,
    )(x_strips, strip_luts, jnp.asarray(wmix), jnp.asarray(ya_strips))
    return out.reshape(b, h, w)


def pallas_ok_for(h: int, w: int, tiles: int = 8) -> bool:
    """Whether the Pallas CLAHE path supports this (padded) geometry."""
    if h % tiles or w % tiles:
        return False
    return (h // tiles) % 2 == 0


def clahe_equalize_pallas(
    gray: jnp.ndarray, clip_limit: float = 2.0, tiles: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full CLAHE with Pallas histogram + apply (geometry pre-validated).

    gray: [B, H, W] uint8, H/W divisible by tiles and H/tiles even.
    """
    b, h, w = gray.shape
    th, tw = h // tiles, w // tiles
    tile_area = th * tw
    clip = max(int(clip_limit * tile_area / 256.0), 1)
    hist = tile_histograms_pallas(gray, tiles, interpret=interpret)
    hist = _clip_and_redistribute(hist, clip)
    luts = _tile_luts(hist, tile_area)
    return clahe_apply_pallas(gray, luts, tiles, interpret=interpret)
