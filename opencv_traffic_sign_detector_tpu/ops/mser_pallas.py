"""Fused Pallas MSER level sweep: all levels resident in VMEM, no scatters.

The XLA level sweep (`.mser._level_sweep`) round-trips keys + rings through
HBM every level and spends ~half its time in a per-level scatter-add (area
counting at anchor pixels).  This kernel keeps the whole sweep state in
VMEM across all ~54 threshold levels (grid = (polarity, level), scratch
persists across the level axis) and replaces pixel-area stability with
**bounding-box-area stability**:

* five channels propagate by 4-neighbour roll min/max per level — the
  component key (min; identifies the anchor = darkest pixel, exactly as in
  the XLA sweep) and the component bbox extents ymin/xmin (min) and
  ymax/xmax (max);
* the Matas variation ``V = (A[t] - A[t-d]) / A[t-d]`` is evaluated on
  bbox areas read elementwise at anchor pixels — no scatter, no gather;
* candidates are emitted exactly like the XLA sweep: at the anchor pixel,
  for level ``levels[t] - (d+1)*step``, as a quantized-stability byte.

Divergence from the XLA sweep (and OpenCV): stability and the area window
use the component's *bounding-box* area rather than its pixel count (a
pixel count needs a scatter per level, ~10 ms/M through this TPU).  Bbox
area upper bounds pixel area, so ``min_area`` transfers unchanged while the
upper bound is scaled by ``bbox_area_cap_scale`` (hollow shapes like
prohibition rings have bbox ~2-4x their pixel count).  End-to-end quality
is revalidated on the GTSDB set (see PARITY.md).

Replaces `cv2.MSER_create` / `detectRegions` (`Deteción de
Objetos/source.py:639,114`) together with `.mser`; measured ~5x faster
than the XLA sweep at the shipped ds=2 configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MSERConfig

# VMEM budget: 5 i32 channels + bf16 rings + input/output blocks comes to
# ~32 bytes/pixel of resident state; the kernel requests a 100 MB scoped
# window (v5e VMEM is 128 MB), so 560k pixels (1080p at the ds=2 sweep:
# 546x962 after padding) still fits with margin for compiler temporaries.
_MAX_PIXELS = 560_000


def fused_sweep_ok(h: int, w: int, cfg: MSERConfig) -> bool:
    """Whether the fused sweep supports this padded geometry + config."""
    if cfg.ccl_jumps != 0:
        return False  # pointer jumps are gathers; the fused path has none
    if h * w > _MAX_PIXELS:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _sweep_kernel(
    im2_ref, sb_ref,
    keys_ref, ymin_ref, xmin_ref, ymax_ref, xmax_ref,
    aring_ref, vring_ref, lastemit_ref,
    *, step: int, d: int, num_rolls: int,
    min_area: float, max_area: float, max_variation: float,
    min_diversity: float, scan_passes: int = 0,
):
    """One (polarity, level) grid step of the fused sweep.

    With ``xmin_ref is None`` (the extent-only variant) only keys + the
    vertical extents propagate and the area proxy is the squared height
    ``(ymax - ymin + 1)^2`` instead of the bbox area: traffic-sign
    candidates are near-square (the pipeline's aspect filter later keeps
    0.8 < w/h < 1.2 anyway, `Deteción de Objetos/source.py:155-174`), so
    squared height tracks bbox area on everything that can survive while
    cutting the per-pass roll work from 5 channels to 3.
    """
    extent_only = xmin_ref is None
    h = im2_ref.shape[1]
    w = im2_ref.shape[2]
    hw = h * w
    big = jnp.int32(256 * hw)
    bigc = jnp.int32(1 << 28)
    inf = jnp.float32(jnp.inf)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        keys_ref[:] = jnp.full((h, w), big, jnp.int32)
        ymin_ref[:] = jnp.full((h, w), bigc, jnp.int32)
        ymax_ref[:] = jnp.full((h, w), -1, jnp.int32)
        if not extent_only:
            xmin_ref[:] = jnp.full((h, w), bigc, jnp.int32)
            xmax_ref[:] = jnp.full((h, w), -1, jnp.int32)
        aring_ref[:] = jnp.zeros(aring_ref.shape, jnp.bfloat16)
        vring_ref[:] = jnp.full(vring_ref.shape, jnp.inf, jnp.bfloat16)
        lastemit_ref[:] = jnp.zeros(lastemit_ref.shape, jnp.bfloat16)

    level = t * step
    im2 = im2_ref[0].astype(jnp.int32)
    mask = im2 <= level

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    idx = rows * w + cols
    keys0 = im2 * hw + idx

    def nb_min(x):
        return jnp.minimum(
            jnp.minimum(pltpu.roll(x, 1, axis=0), pltpu.roll(x, h - 1, axis=0)),
            jnp.minimum(pltpu.roll(x, 1, axis=1), pltpu.roll(x, w - 1, axis=1)),
        )

    def nb_max(x):
        return jnp.maximum(
            jnp.maximum(pltpu.roll(x, 1, axis=0), pltpu.roll(x, h - 1, axis=0)),
            jnp.maximum(pltpu.roll(x, 1, axis=1), pltpu.roll(x, w - 1, axis=1)),
        )

    # Channels propagate independently on the same mask, as sequential
    # in-place ref updates (keeps the VMEM live set at ~one temporary).
    # The refs are warm-started across levels (masks only grow), so a
    # while_loop exits as soon as one full pass over all channels changes
    # nothing (every channel's update operator is monotone, so no-change
    # is a true fixed point).
    #
    # Dead-region pruning makes that early exit actually fire: a component
    # whose bbox area exceeds the cap can never emit a candidate again
    # (areas only grow), so its anchor writes key = -1 at the end of its
    # level.  -1 is below every live key and spreads through the component
    # by the same min propagation; pixels holding -1 freeze their bbox
    # channels at the sentinel.  Without this, one huge background
    # component keeps every pass "changing" for the full iteration cap at
    # most levels; with it, warm-started levels converge in a handful of
    # passes.  (Candidate semantics: a chain whose stability window
    # overlaps the became-huge period is suppressed — quality revalidated
    # on the GTSDB set, see PARITY.md.)
    keys_ref[:] = jnp.where(mask, jnp.minimum(keys_ref[:], keys0), big)
    ymin_ref[:] = jnp.where(mask, jnp.minimum(ymin_ref[:], rows), bigc)
    ymax_ref[:] = jnp.where(mask, jnp.maximum(ymax_ref[:], rows), -1)
    if not extent_only:
        xmin_ref[:] = jnp.where(mask, jnp.minimum(xmin_ref[:], cols), bigc)
        xmax_ref[:] = jnp.where(mask, jnp.maximum(xmax_ref[:], cols), -1)

    channels = [(ymin_ref, True, bigc), (ymax_ref, False, jnp.int32(-1))]
    if not extent_only:
        channels += [(xmin_ref, True, bigc), (xmax_ref, False, jnp.int32(-1))]

    def sweep_pass(check: bool):
        k = keys_ref[:]
        knew = jnp.where(mask, jnp.minimum(k, nb_min(k)), big)
        changed = jnp.any(knew != k) if check else jnp.bool_(False)
        keys_ref[:] = knew
        live = mask & (knew >= 0)
        for ref, is_min, fill in channels:
            x = ref[:]
            nb = nb_min(x) if is_min else nb_max(x)
            upd = jnp.minimum(x, nb) if is_min else jnp.maximum(x, nb)
            upd = jnp.where(live, upd, fill)
            if check:
                changed = changed | jnp.any(upd != x)
            ref[:] = upd
        return changed

    def prop_body(carry):
        it, _ = carry
        sweep_pass(False)
        return it + 2, sweep_pass(True)

    # --- scan propagation (scan_passes > 0) ---------------------------------
    # Radius-1 rolls need O(component diameter) passes.  The scan variant
    # resolves each horizontal mask-run and each vertical mask-run
    # *completely* per pass (segmented run-reduce via Hillis-Steele
    # doubling along the axis, both directions, flags shared across
    # channels), so convergence is bounded by the component's zigzag
    # complexity (1-2 passes for convex sign-like blobs), not its diameter.
    def axis_resolve(axis: int):
        """Segmented full-run reduce along one axis for keys + extents.

        Flags ride as int32 0/1 — Mosaic has no sub-32-bit vector rotate.
        """
        size = w if axis == 1 else h
        mi = mask.astype(jnp.int32)
        m_prev = pltpu.roll(mi, 1, axis=axis)
        m_next = pltpu.roll(mi, size - 1, axis=axis)
        seg_fwd = mi * (1 - m_prev)  # run starts (toward index 0)
        seg_bwd = mi * (1 - m_next)  # run ends
        live = mask & (keys_ref[:] >= 0)
        vals = [jnp.where(mask, keys_ref[:], big)]
        ops = [jnp.minimum]
        for ref, is_min, fill in channels:
            vals.append(jnp.where(live, ref[:], fill))
            ops.append(jnp.minimum if is_min else jnp.maximum)

        def dir_scan(vs, seg, fwd: bool):
            f = seg
            k = 1
            while k < size:
                amt = k if fwd else size - k
                fsh = pltpu.roll(f, amt, axis=axis)
                blocked = f > 0
                vs = [
                    jnp.where(blocked, v, op(v, pltpu.roll(v, amt, axis=axis)))
                    for v, op in zip(vs, ops)
                ]
                f = jnp.maximum(f, fsh)
                k *= 2
            return vs

        vf = dir_scan(vals, seg_fwd, True)
        vb = dir_scan(vals, seg_bwd, False)
        out = [op(a, b) for a, b, op in zip(vf, vb, ops)]
        keys_ref[:] = jnp.where(mask, out[0], big)
        live2 = mask & (out[0] >= 0)
        for (ref, is_min, fill), v in zip(channels, out[1:]):
            ref[:] = jnp.where(live2, v, fill)

    if scan_passes > 0:
        for _ in range(scan_passes):
            axis_resolve(1)
            axis_resolve(0)
        axis_resolve(1)
    else:
        jax.lax.while_loop(
            lambda c: (c[0] < num_rolls) & c[1],
            prop_body,
            (jnp.int32(0), jnp.bool_(True)),
        )
    keys = keys_ref[:]
    ymin = ymin_ref[:]
    ymax = ymax_ref[:]

    # anchor == own key is the component minimum; bbox area at anchors
    # (f32 before the product: dead/sentinel extents overflow int32)
    anchor = mask & (keys == keys0)
    if extent_only:
        ext = (ymax - ymin + 1).astype(jnp.float32)
        bb = ext * ext
    else:
        bb = (
            (ymax - ymin + 1).astype(jnp.float32)
            * (xmax_ref[:] - xmin_ref[:] + 1).astype(jnp.float32)
        )
    bb = jnp.minimum(bb, 65535.0)
    a_cur = jnp.where(anchor, bb, 0.0)
    # mark components past the area cap dead: their anchor seeds key = -1,
    # which min-propagates through the component on subsequent levels
    keys_ref[:] = jnp.where(anchor & (bb > max_area), jnp.int32(-1), keys)

    # ring reads (slots sized d+1 / 2; all reads before the overwrite)
    nring = d + 1
    s_old = jax.lax.rem(t + nring - (d + 1) % nring, nring)  # A[t-d-1]
    s_td = jax.lax.rem(t + nring - d % nring, nring)         # A[t-d]
    area_c = aring_ref[pl.ds(s_old, 1)][0].astype(jnp.float32)
    a_td = aring_ref[pl.ds(s_td, 1)][0].astype(jnp.float32)
    s_v_new = jax.lax.rem(t + 2 * nring - d, 2)   # slot of V[t-d] == V[t-d-2]
    s_v_c = 1 - s_v_new                           # slot of V[t-d-1]
    v_c = vring_ref[pl.ds(s_v_c, 1)][0].astype(jnp.float32)
    v_prev = vring_ref[pl.ds(s_v_new, 1)][0].astype(jnp.float32)  # V[t-d-2]

    v_new = jnp.where(
        (a_td > 0.0) & (a_cur > 0.0),
        (a_cur - a_td) / jnp.maximum(a_td, 1.0),
        inf,
    )

    cand = (
        (area_c >= min_area)
        & (area_c <= max_area)
        & (v_c < max_variation)
        & (v_c <= v_prev)
        & (v_c <= v_new)
    )
    # min_diversity (OpenCV default 0.2): suppress nested re-emissions on
    # the same anchor chain unless the region grew enough since the last
    # emitted candidate — a flat-V region otherwise emits every level and
    # floods the top-k capacity with duplicates of itself.
    last = lastemit_ref[:].astype(jnp.float32)
    diverse = (last <= 0.0) | (
        (area_c - last) >= min_diversity * jnp.maximum(area_c, 1.0)
    )
    cand = cand & diverse
    lastemit_ref[:] = jnp.where(cand, area_c, last).astype(jnp.bfloat16)
    qv = jnp.clip(254.0 - jnp.floor(v_c * 253.0), 1.0, 254.0)
    sb_ref[0, 0] = (
        jnp.where(cand, qv, 0.0).astype(jnp.int32).astype(jnp.uint8)
    )

    # ring writes (evict the slots just read); rings are bf16 to fit VMEM
    # (areas <= 65535 and variation ratios tolerate the 8-bit mantissa —
    # the stability byte quantization step is of the same order)
    aring_ref[pl.ds(jax.lax.rem(t, nring), 1)] = a_cur.astype(jnp.bfloat16)[None]
    vring_ref[pl.ds(s_v_new, 1)] = v_new.astype(jnp.bfloat16)[None]


@functools.partial(
    jax.jit, static_argnames=("cfg", "d_idx", "num_levels", "interpret")
)
def fused_level_sweep(
    im2: jnp.ndarray,
    cfg: MSERConfig,
    d_idx: int,
    num_levels: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[P, H, W] polarity-stacked uint8/int -> stability bytes [P, L, H, W].

    Step t of the L axis holds the candidates for threshold level
    ``t*step - (d_idx+1)*step`` (same lag convention as the XLA sweep).
    """
    p, h, w = im2.shape
    s = cfg.level_step if cfg.level_step > 0 else cfg.delta
    base = functools.partial(
        _sweep_kernel,
        step=s,
        d=d_idx,
        num_rolls=2 * cfg.ccl_iters,
        min_area=float(cfg.min_area),
        max_area=float(cfg.max_area) * cfg.bbox_area_cap_scale,
        max_variation=float(cfg.max_variation),
        min_diversity=float(cfg.min_diversity),
        scan_passes=cfg.scan_passes,
    )
    if cfg.sweep_extent_only:
        def kern(im2_ref, sb_ref, keys, ymin, ymax, aring, vring, lastemit):
            base(im2_ref, sb_ref, keys, ymin, None, ymax, None,
                 aring, vring, lastemit)

        extent_scratch = []
    else:
        kern = base
        extent_scratch = [
            pltpu.VMEM((h, w), jnp.int32),  # xmin
            pltpu.VMEM((h, w), jnp.int32),  # xmax
        ]
    return pl.pallas_call(
        kern,
        grid=(p, num_levels),
        out_shape=jax.ShapeDtypeStruct((p, num_levels, h, w), jnp.uint8),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int32),      # keys
            pltpu.VMEM((h, w), jnp.int32),      # ymin
        ] + extent_scratch[:1] + [
            pltpu.VMEM((h, w), jnp.int32),      # ymax
        ] + extent_scratch[1:] + [
            pltpu.VMEM((d_idx + 1, h, w), jnp.bfloat16),  # bbox-area ring
            pltpu.VMEM((2, h, w), jnp.bfloat16),          # variation ring
            pltpu.VMEM((h, w), jnp.bfloat16),   # last-emitted area (min_div)
        ],
        compiler_params=pltpu.CompilerParams(
            # resident state + compiler temporaries exceed the default 16 MB
            # scoped window at the shipped ds=2 geometry; v5e VMEM can hold it
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(im2.astype(jnp.uint8))
