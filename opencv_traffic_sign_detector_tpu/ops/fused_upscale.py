"""Upscaled inference without an upscaled frame: upscale∘patchify∘stem
folded into banded matmuls on NATIVE pixels.

Round 4 shipped ``--upscale`` (models/cnn_detector.py) as the quality
flagship — bilinearly scaling frames on device recovers the small-sign
quality the v3 stride-16 grid gives up at native GTSDB resolution
(AP 0.852 -> 0.94 at 1.412x) — but at 2,070 fps vs 17,656 native: the
materialized upscaled frame (2x the pixels in HBM) plus the in-graph
patchify relayout dominated the whole jit (PARITY.md round-4 upscaled
note).  Every stage between the native u8 frame and the first stem
activation is LINEAR, so the chain

    frame --bilinear upscale--> U --8x8 patchify--> P --K=192 matmul--> stem

is ONE linear map from native pixels to stem activations.  This module
evaluates that map directly; the upscaled frame never exists.

Structure exploited (all shapes static, everything MXU-shaped):

* **Width**: a rational scale T/A upsamples each block of A input columns
  to T output columns with a fixed 2-tap phase pattern (ops/upscale.py:
  _phase_plan).  Output columns are emitted in order, so the 8-column
  patch split is a FREE reshape of the width pass's output — width costs
  one tiny banded einsum (~2 taps/pixel), no relayout.
* **Height + stem**: stem row i consumes upscaled rows [8i, 8i+8).  With
  S = lcm(8, T)/8, the tap pattern of S consecutive stem rows repeats
  every N = 8*S*A/T native rows, so the height pass and the stem's
  K=192 matmul combine into ONE einsum against a composite weight
  ``KH[t, u, q, f] = Σ_p tap[t*8+p, u] * K[p, q, f]`` — contraction
  (N+2)*24 per superblock (456 for the 24/17 point), emitted straight
  in stem-activation layout.  No patchify exists anywhere.

The shipped quality point ``--upscale 1.412`` maps to T/A = **24/17 =
1.41176**: exactly 1360 -> 1920 on width (zero pad), 800 -> (pad 16 rows)
816 -> 1152 on height — aspect-preserving, within 0.03% of the measured
sweep optimum (PARITY.md round-4 sweep: AP 0.942 at "1.412" = 1920x1136).

Semantics vs the two-stage product path (upscale_bilinear_u8 -> stem):
identical linear map evaluated in a different association; the ONLY
intentional difference is that the u8 round/clip of the intermediate
upscaled frame disappears (the fused path is *more* faithful to the
bilinear math).  tests/test_fused_upscale.py pins exact agreement with an
un-rounded float reference and near-agreement with the shipped two-stage
path on the real checkpoint.

Reference pointer: the reference has no multi-scale inference at all
(detection runs at native frame resolution, ``Deteción de
Objetos/source.py:111-131``); this is a beyond-parity product mode.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from .upscale import _MAX_PHASES, _upscale_axis

_PATCH = 8


@dataclass(frozen=True)
class FusedUpscalePlan:
    """Static geometry of one fused upscale+stem configuration.

    Hashable (jit-static).  ``t/a`` is the reduced rational scale used on
    BOTH axes (aspect-preserving); ``h_pad/w_pad`` the replicate-padded
    native dims; ``h_out/w_out`` the virtual upscaled dims (multiples of
    16 so the v3 trunk tiles them); ``sb`` stem rows per height
    superblock; ``n`` native rows per superblock.
    """

    h: int
    w: int
    t: int
    a: int
    h_pad: int
    w_pad: int
    h_out: int
    w_out: int
    sb: int
    n: int

    @property
    def scale(self) -> float:
        return self.t / self.a

    def rescale_factors(self) -> tuple[float, float]:
        """(sx, sy) mapping upscaled-grid boxes back to native pixels."""
        return self.t / self.a, self.t / self.a


def find_plan(h: int, w: int, scale: float, *, a_max: int = 24,
              sb_max: int = 4, pad_max: int = 40,
              tol: float = 0.02) -> FusedUpscalePlan | None:
    """Best fusable rational approximation of ``scale`` for an (h, w) frame.

    Scans denominators a <= a_max for t/a within ``tol`` of the requested
    scale whose height superblock sb = lcm(8, t)/8 stays <= ``sb_max``
    (the einsum contraction grows as sb) and whose alignment padding stays
    <= ``pad_max`` native rows/cols per axis.  Returns None when no such
    ratio exists (callers fall back to the two-stage dense path).
    """
    if scale <= 1.0:
        return None
    best: FusedUpscalePlan | None = None
    best_key = None
    seen: set[tuple[int, int]] = set()
    for a_try in range(1, a_max + 1):
        t_try = round(scale * a_try)
        if t_try <= a_try:
            continue
        frac = Fraction(t_try, a_try)
        t, a = frac.numerator, frac.denominator
        if (t, a) in seen or t > _MAX_PHASES:
            continue
        seen.add((t, a))
        err = abs(t / a - scale)
        if err > tol:
            continue
        sb = math.lcm(8, t) // 8
        if sb > sb_max:
            continue
        n = sb * 8 * a // t  # native rows per superblock (exact by lcm)
        # height: h_out must be a multiple of lcm(sb*8, 16); width: of 16
        l_h = math.lcm(sb * 8, 16)
        m_h = a * l_h // math.gcd(t, l_h)
        m_w = a * 16 // math.gcd(t, 16)
        h_pad = -(-h // m_h) * m_h
        w_pad = -(-w // m_w) * m_w
        if h_pad - h > pad_max or w_pad - w > pad_max:
            continue
        plan = FusedUpscalePlan(h=h, w=w, t=t, a=a, h_pad=h_pad,
                                w_pad=w_pad, h_out=h_pad * t // a,
                                w_out=w_pad * t // a, sb=sb, n=n)
        key = (err, (h_pad - h) + (w_pad - w), sb)
        if best_key is None or key < best_key:
            best, best_key = plan, key
    return best


def _height_taps(t: int, a: int, sb: int, n: int) -> np.ndarray:
    """[sb, 8, n+2] f32: weight of padded native row u for stem row t',
    patch-row phase p — the bilinear 2-tap pattern of ops/upscale.py
    (half-pixel centers, replicate edges) unrolled over one superblock.

    ``u`` indexes the 1-replicate-padded native axis (offset +1), so
    u = n and n+1 are the next superblock's first rows.
    """
    phases = sb * 8
    tap = np.zeros((phases, n + 2), np.float64)
    for phi in range(phases):
        blk, p = divmod(phi, t)
        x = (p + 0.5) * a / t - 0.5
        i0 = math.floor(x)
        f = x - i0
        u = a * blk + i0 + 1
        tap[phi, u] += 1.0 - f
        tap[phi, u + 1] += f
    return tap.reshape(sb, 8, n + 2).astype(np.float32)


def fused_upscale_stem(frames_u8: jax.Array, kernel: jax.Array,
                       bias: jax.Array, plan: FusedUpscalePlan,
                       dtype=jnp.bfloat16) -> jax.Array:
    """Native u8 frames -> v3 stem activations at the upscaled resolution.

    ``frames_u8`` [B, h, w, 3]; ``kernel`` [8, 8, 3, F] + ``bias`` [F] are
    the stem conv's own parameters (models/cnn_detector.py: _PatchifyStem —
    HWIO, k = ky*24 + kx*3 + c).  Returns relu activations
    [B, h_out/8, w_out/8, F] in ``dtype`` — bit-compatible input for
    Conv_1 of the v3 trunk.
    """
    b = frames_u8.shape[0]
    f = kernel.shape[-1]
    x = frames_u8
    if plan.h_pad > plan.h or plan.w_pad > plan.w:
        x = jnp.pad(x, ((0, 0), (0, plan.h_pad - plan.h),
                        (0, plan.w_pad - plan.w), (0, 0)), mode="edge")

    # width: phase-sliced banded pass (f32), normalize, free patch split
    y = x
    if plan.w_out != plan.w_pad:
        y = _upscale_axis(y, 2, plan.w_out)
    y = (y.astype(jnp.float32) * np.float32(1.0 / 255.0)
         - np.float32(0.5)).astype(dtype)
    wq = plan.w_out // _PATCH
    y = y.reshape(b, plan.h_pad, wq, 3 * _PATCH)          # q = kx*3 + c

    # height + stem: one einsum per superblock slab against the composite
    # tap x kernel weights; two rank-1 terms for the cross-block taps
    tapm = jnp.asarray(_height_taps(plan.t, plan.a, plan.sb, plan.n))
    k0 = kernel.reshape(_PATCH, 3 * _PATCH, f).astype(jnp.float32)
    kh = jnp.einsum("tpu,pqf->tuqf", tapm, k0).astype(dtype)  # [sb,n+2,q,f]

    yp = jnp.concatenate([y[:, :1], y, y[:, -1:]], axis=1)  # replicate ±1
    g = plan.h_pad // plan.n
    main = yp[:, : plan.n * g].reshape(b, g, plan.n, wq, 3 * _PATCH)
    e0 = yp[:, plan.n:: plan.n][:, :g]        # u = n   (next block row 0)
    e1 = yp[:, plan.n + 1:: plan.n][:, :g]    # u = n+1 (next block row 1)
    out = jnp.einsum("bgujq,tuqf->bgtjf", main, kh[:, : plan.n])
    out = out + jnp.einsum("bgjq,tqf->bgtjf", e0, kh[:, plan.n])
    out = out + jnp.einsum("bgjq,tqf->bgtjf", e1, kh[:, plan.n + 1])
    out = out.reshape(b, g * plan.sb, wq, f)
    return jax.nn.relu(out + bias.astype(dtype))
