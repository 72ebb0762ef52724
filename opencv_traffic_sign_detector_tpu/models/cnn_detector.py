"""MXU-resident convolutional sign detector — the framework's north-star path.

The reference detects signs with a region-proposal pipeline (MSER sweep +
mask correlation, ``Deteción de Objetos/source.py:96-180``).  Our TPU port of
that pipeline is elementwise/scan-shaped, so its throughput ceiling is the
VPU (PARITY.md "ceiling note": ~124 fps at 1360x800).  This module is the
framework's MXU answer to the same task: an anchor-free center-point
detector (CenterNet-style) whose compute is almost entirely 3x3
convolutions in bfloat16 — exactly the shape the systolic array is built
for — trained on the same gt.txt supervision the reference's trainer
consumes and emitting the same six super-types into the same resultado.txt
protocol.

Design notes (TPU-first):

* A 4x4 space-to-depth stem turns the 3-channel input into a 48-channel
  stride-4 tensor so the very first conv already has an MXU-friendly
  contraction depth (3-channel convs waste >90% of the array).
* The whole network is static-shape; full frames (1360x800, 1920x1088) are
  multiples of the stride so no dynamic padding exists anywhere.
* Peak extraction (the NMS equivalent) is a 3x3 max-pool equality test plus
  one ``top_k`` — no data-dependent control flow, jit-compatible end to end.
* Params are float32, activations bfloat16 (hm head computed in f32).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data.gt import GroundTruthBox

# Default detector output stride: heads live on the stride-8 grid (a 16 px
# sign — the GTSDB minimum — spans 2 cells).  The v2s16* arches decode on
# the stride-16 grid instead (CNNDetectorConfig.stride).
STRIDE = 8
NUM_CLASSES = 6  # six super-types; background is "no peak", not a channel

# Output stride per architecture (all arches not listed decode at STRIDE).
_ARCH_STRIDE = {"v2s16": 16, "v2s16wide": 16, "v3": 16}


@dataclass(frozen=True)
class CNNDetectorConfig:
    """Architecture + decode hyper-parameters (defaults = shipped model)."""

    stem_features: int = 64
    mid_features: int = 96
    deep_features: int = 128
    head_features: int = 96
    # "base": s4-resident stem conv, concat-FPN, f32 heads (the r3 original,
    # 747k params; F1 0.83 / AP-max 0.9068).
    # "slim": stride-2 stem straight to s8, 1x1-projected add-FPN,
    # bf16 heads, 612k params — measured 1.27x faster at 1080p
    # (scripts/cnn_variants.py: 20.6 -> 16.2 ms/16 frames) because it
    # removes the two worst MXU-fill offenders (the 48->64 s4 conv at
    # 15 TFLOP/s and the f32 head convs; scripts/mxu_peak.py).  Heads stay
    # on the stride-8 grid so 16 px GTSDB signs still span 2 cells.  At
    # 24k train steps it matches base quality: F1 0.83 / AP-max 0.9114.
    # "v2wide": slim stem to s8@128, bulk compute at s16@256, add-FPN back
    # to s8, one s8 head conv — moves FLOPs into >=128-channel contractions
    # (the MXU's fill sweet spot; scripts/mxu_peak.py measured 89.5 TFLOP/s
    # on a 256-channel conv vs 11-37 on the shipped 48-128-channel ones).
    # "v2s16"/"v2s16wide": the whole trunk at stride 16 (width 192/256),
    # heads + decode on the s16 grid — quarters both the head-conv grid and
    # the decode top-k input.  Sub-cell offsets carry center precision.
    # "v3" (the SHIPPED flagship): see the __call__ branch — 9,676 fps at
    # 1080p / 17,817 fps at 1360x800 (batch 128 device queue, patches8
    # ingest; 6,308 / 11,667 from BGR frames), 48k-step weights measure
    # F1 0.83 / AP-max 0.933 at the 1080p operating point and F1 0.81 /
    # AP-max 0.875 at native GTSDB (PARITY.md round 4).
    # Default stays "slim" for constructor back-compat; product loaders
    # take the arch from the checkpoint's own __arch__ tag.
    arch: str = "slim"
    max_detections: int = 32
    # Operating point; the shipped v3 checkpoint tags 0.35 (its F1-optimal
    # band is 0.35-0.45 — PARITY.md round-4 sweep), slim's was 0.50.
    # Lower toward 0.2 for AP-max, raise for precision.
    score_threshold: float = 0.50
    dtype: str = "bfloat16"

    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def stride(self) -> int:
        """Output grid stride of the decode heads for this architecture."""
        return _ARCH_STRIDE.get(self.arch, STRIDE)


def _space_to_depth(x: jax.Array, r: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, r * r * c)


class _PatchifyStem(nn.Module):
    """The v3 8x8-stride-8 stem computed as patchify + one K=192 matmul.

    Parameter-compatible with ``nn.Conv(features, (8, 8), strides=(8, 8))``
    (kernel [8, 8, 3, F] + bias [F], same HWIO flat order), but ~1.3x
    faster than XLA's conv lowering for cin=3 at this size and able to
    consume HOST-PRE-PATCHIFIED input for 3.5x more: measured per 128
    1080p frames, conv 17.3 ms / in-graph patchify 13.5 ms / pre-formed
    patches 5.0 ms — the relayout away from the channels-minor=3 frame
    layout, not the matmul, is the stem's real cost.  Inputs:

    * frames  uint8 [B, H, W, 3]           — patchified in-graph
      (reshape + 8-slice concat; measured faster than the transpose
      lowering and the conv itself), or
    * patches uint8 [B, H/8, W/8, 192]     — the ``patches8`` layout the
      native loader emits at decode time for free (k = ky*24 + kx*3 + c,
      exactly the flattened HWIO kernel order).
    """

    features: int = 64
    patch: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p, f = self.patch, self.features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, 3, f),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        dt = self.dtype
        k = p * p * 3
        if x.shape[-1] != k:  # [B, H, W, 3] -> [B, H/p, W/p, p*p*3]
            b, h, w, c = x.shape
            xs = x.reshape(b, h // p, p, w // p, p * c)
            x = jnp.concatenate([xs[:, :, r] for r in range(p)], axis=-1)
        x = x.astype(dt) * jnp.asarray(1 / 255.0, dt) - jnp.asarray(0.5, dt)
        out = jnp.einsum("bhwk,kf->bhwf", x, kernel.reshape(k, f).astype(dt))
        return nn.relu(out + bias.astype(dt))


class _ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        return nn.relu(x)


class SignCenterNet(nn.Module):
    """Anchor-free center detector over the six GTSDB super-types.

    Input: uint8 BGR frames [B, H, W, 3] with H, W multiples of 16.
    Output dict (all stride-8 grids, float32):
      ``hm``   [B, H/8, W/8, 6]  per-class center logits
      ``size`` [B, H/8, W/8, 2]  (w, h) in grid units (log-space-free, raw)
      ``off``  [B, H/8, W/8, 2]  (dx, dy) sub-cell center offset in [0, 1)
    """

    cfg: CNNDetectorConfig = field(default_factory=CNNDetectorConfig)

    @nn.compact
    def __call__(self, frames_u8):
        cfg = self.cfg
        dt = cfg.compute_dtype()
        if cfg.arch != "v3":
            x = frames_u8.astype(dt) * jnp.asarray(1.0 / 255.0, dt) \
                - jnp.asarray(0.5, dt)
            x = _space_to_depth(x, 4)                  # [B, H/4, W/4, 48]

        if cfg.arch == "v3":
            # North-star arch (round 4): 8x8-stride-8 patchify stem straight
            # from uint8, then a 128-wide stride-16 trunk.  ~6.8 GFLOP per
            # 1080p frame vs slim's 22.6.  The stem is computed as
            # patchify + K=192 matmul (_PatchifyStem — parameter-compatible
            # with the conv it replaces, measured 1.3x its speed in-graph
            # and 3.5x from the host ``patches8`` layout) and also accepts
            # pre-patchified [B, H/8, W/8, 192] input.  NO norm layers at
            # inference: the trainer uses BatchNorm and folds it into the
            # conv kernels/biases at export (models/cnn_train.py:
            # fold_v3_batchnorm), so this chain is pure conv/matmul+relu.
            # Modules are explicitly named to keep the checkpoint tree of
            # the original nn.Conv chain (Conv_0..Conv_6).
            x = _PatchifyStem(features=64, patch=8, dtype=dt,
                              name="Conv_0")(frames_u8)
            x = nn.relu(nn.Conv(128, (3, 3), strides=(2, 2), dtype=dt,
                                name="Conv_1")(x))
            x = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="Conv_2")(x))
            fin = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="Conv_3")(x))
            head_dt = dt
        elif cfg.arch in ("v2s16", "v2s16wide"):
            # whole trunk at s16; heads + decode on the s16 grid
            w = 256 if cfg.arch == "v2s16wide" else 192
            x = _ConvBlock(w // 2, stride=2, dtype=dt)(x)   # 48 -> w/2 @ s8
            x = _ConvBlock(w, stride=2, dtype=dt)(x)        # w/2 -> w @ s16
            x = _ConvBlock(w, dtype=dt)(x)
            x = _ConvBlock(w, dtype=dt)(x)
            fin = _ConvBlock(w, dtype=dt)(x)
            head_dt = dt
        elif cfg.arch == "v2wide":
            # slim stem to s8@128, bulk compute at s16@256, add-FPN to s8
            s8 = _ConvBlock(128, stride=2, dtype=dt)(x)     # 48 -> 128 @ s8
            x = _ConvBlock(256, stride=2, dtype=dt)(s8)     # s16
            x = _ConvBlock(256, dtype=dt)(x)
            x = _ConvBlock(256, dtype=dt)(x)
            b, h16, w16, _ = x.shape
            x = nn.Conv(128, (1, 1), dtype=dt)(x)
            up = jax.image.resize(x, (b, h16 * 2, w16 * 2, 128), "nearest")
            fin = _ConvBlock(128, dtype=dt)(s8 + up)
            head_dt = dt
        else:
            slim = cfg.arch == "slim"
            if slim:
                x = _ConvBlock(cfg.stem_features, stride=2, dtype=dt)(x)   # s8
            else:
                x = _ConvBlock(cfg.stem_features, dtype=dt)(x)
                x = _ConvBlock(cfg.stem_features, stride=2, dtype=dt)(x)   # s8
            s8 = _ConvBlock(cfg.mid_features, dtype=dt)(x)
            x = _ConvBlock(cfg.mid_features, stride=2, dtype=dt)(s8)   # s16
            x = _ConvBlock(cfg.deep_features, dtype=dt)(x)
            x = _ConvBlock(cfg.deep_features, dtype=dt)(x)
            # FPN-lite: bring s16 context back to the s8 grid for small signs.
            b, h16, w16, c = x.shape
            if slim:
                x = nn.Conv(cfg.mid_features, (1, 1), dtype=dt)(x)
                up = jax.image.resize(
                    x, (b, h16 * 2, w16 * 2, cfg.mid_features), "nearest")
                fused = s8 + up
            else:
                up = jax.image.resize(x, (b, h16 * 2, w16 * 2, c), "nearest")
                fused = jnp.concatenate([s8, up], axis=-1)
            feat = _ConvBlock(cfg.head_features, dtype=dt)(fused)
            feat = _ConvBlock(cfg.head_features, dtype=dt)(feat)
            head_dt = dt if slim else jnp.float32
            fin = feat if slim else feat.astype(jnp.float32)

        # v3 names its modules explicitly (the stem is not an nn.Conv, so
        # auto-numbering would shift); other arches keep flax auto-names.
        v3 = cfg.arch == "v3"
        hm = nn.Conv(NUM_CLASSES, (3, 3), dtype=head_dt,
                     bias_init=nn.initializers.constant(-4.59),  # prior ~0.01
                     name="Conv_4" if v3 else None)(fin).astype(jnp.float32)
        size = nn.Conv(2, (3, 3), dtype=head_dt,
                       name="Conv_5" if v3 else None)(fin).astype(jnp.float32)
        off = nn.Conv(2, (3, 3), dtype=head_dt,
                      name="Conv_6" if v3 else None)(fin).astype(jnp.float32)
        return {"hm": hm, "size": size, "off": off}


class V3TrunkHeads(nn.Module):
    """The v3 chain from stem activations onward (Conv_1..Conv_6).

    Module names match ``SignCenterNet``'s v3 branch exactly, so this
    applies with the sub-tree ``{k: params[k] for k != "Conv_0"}`` of any
    v3 checkpoint and produces bit-identical head maps.  Exists so paths
    that compute the stem themselves (ops/fused_upscale.py: the folded
    upscale+patchify+stem) can run the rest of the network unchanged.
    """

    cfg: CNNDetectorConfig = field(default_factory=CNNDetectorConfig)

    @nn.compact
    def __call__(self, stem_out):
        dt = self.cfg.compute_dtype()
        x = nn.relu(nn.Conv(128, (3, 3), strides=(2, 2), dtype=dt,
                            name="Conv_1")(stem_out))
        x = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="Conv_2")(x))
        fin = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="Conv_3")(x))
        hm = nn.Conv(NUM_CLASSES, (3, 3), dtype=dt,
                     bias_init=nn.initializers.constant(-4.59),
                     name="Conv_4")(fin).astype(jnp.float32)
        size = nn.Conv(2, (3, 3), dtype=dt,
                       name="Conv_5")(fin).astype(jnp.float32)
        off = nn.Conv(2, (3, 3), dtype=dt,
                      name="Conv_6")(fin).astype(jnp.float32)
        return {"hm": hm, "size": size, "off": off}


# ---------------------------------------------------------------------------
# Decode: heatmap peaks -> padded box tensors (static shapes, jit-safe)
# ---------------------------------------------------------------------------


def decode_detections(outputs: dict, k: int, score_threshold: float,
                      stride: int = STRIDE):
    """Turn head outputs into top-k boxes per frame.

    Returns (boxes [B,k,4] float32 xyxy pixels, cls [B,k] int32 1..6,
    scores [B,k] float32, valid [B,k] bool).  The 3x3 max-pool equality test
    is the NMS: a cell survives iff it is the local maximum of its class map.
    ``stride`` is the head-grid stride (8 for base/slim, 16 for v2s16*).
    """
    prob = jax.nn.sigmoid(outputs["hm"])              # [B,Hc,Wc,C]
    b, hc, wc, c = prob.shape
    pooled = nn.max_pool(prob, (3, 3), strides=(1, 1), padding="SAME")
    peaks = jnp.where(prob >= pooled, prob, 0.0)
    flat = peaks.reshape(b, hc * wc * c)
    scores, idx = jax.lax.top_k(flat, k)              # [B,k]
    cls = (idx % c).astype(jnp.int32)
    cell = idx // c
    cy = (cell // wc).astype(jnp.float32)
    cx = (cell % wc).astype(jnp.float32)

    def _gather_map(m):                                # m [B,Hc,Wc,2]
        flat_m = m.reshape(b, hc * wc, 2)
        return jnp.take_along_axis(flat_m, cell[:, :, None], axis=1)

    wh = jnp.maximum(_gather_map(outputs["size"]), 0.0)   # grid units
    off = jnp.clip(_gather_map(outputs["off"]), 0.0, 1.0)
    pcx = (cx + off[..., 0]) * stride
    pcy = (cy + off[..., 1]) * stride
    pw = wh[..., 0] * stride
    ph = wh[..., 1] * stride
    boxes = jnp.stack(
        [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], axis=-1)
    valid = (scores >= score_threshold) & (pw > 2) & (ph > 2)
    return boxes, cls + 1, scores, valid


# ---------------------------------------------------------------------------
# Parameter persistence (plain npz — no orbax dependency in the product path)
# ---------------------------------------------------------------------------


def save_params(path: str, params, arch: str | None = None,
                score_threshold: float | None = None) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}
    if arch is not None:
        # arch + operating-point metadata ride in the npz so loaders never
        # need an arch flag (a base-arch retrain used to silently break
        # every slim-default consumer — ADVICE r3 #1)
        arrays["__arch__"] = np.asarray(arch)
    if score_threshold is not None:
        arrays["__threshold__"] = np.asarray(score_threshold, np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def saved_meta(path: str) -> dict:
    """Read the metadata tags stored in a checkpoint (may be empty)."""
    meta: dict = {}
    with np.load(path) as data:
        if "__arch__" in data.files:
            meta["arch"] = str(data["__arch__"])
        if "__threshold__" in data.files:
            meta["score_threshold"] = float(data["__threshold__"])
    return meta


def saved_arch(path: str) -> str | None:
    """Read the arch tag stored in a checkpoint, if present."""
    return saved_meta(path).get("arch")


def load_params(path: str, template):
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, tmpl in flat:
        key = jax.tree_util.keystr(kp)
        if key not in data:
            raise ValueError(f"checkpoint {path} is missing parameter {key}")
        arr = data[key]
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint {path} parameter {key} has shape {arr.shape}, "
                f"model expects {tmpl.shape}")
        leaves.append(jnp.asarray(arr, tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def init_params(cfg: CNNDetectorConfig, seed: int = 0,
                input_hw: tuple[int, int] = (160, 160)):
    model = SignCenterNet(cfg)
    dummy = jnp.zeros((1, *input_hw, 3), jnp.uint8)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]


# ---------------------------------------------------------------------------
# Full-frame inference driver (product path)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 3, 4))
def _detect_jit(cfg: CNNDetectorConfig, params, frames_u8, k, thresh):
    out = SignCenterNet(cfg).apply({"params": params}, frames_u8)
    return decode_detections(out, k, thresh, cfg.stride)


def upscale_frames(frames_u8: jax.Array, th: int, tw: int) -> jax.Array:
    """On-device bilinear upscale to (th, tw), u8 -> u8.

    Same formulation as the measured 1080p quality protocol
    (scripts/cnn_threshold_sweep.py --input_scale 1080p): float32
    bilinear, round, clip — computed via the phase-sliced 2-tap passes in
    ops/upscale.py (±1 count vs jax.image.resize, measured
    quality-neutral; dense f32 fallback for degenerate ratios) so the
    resize costs VPU bandwidth instead of dense-matmul MXU FLOPs.
    """
    from ..ops.upscale import upscale_bilinear_u8

    return upscale_bilinear_u8(frames_u8, th, tw)


def rescale_boxes(boxes: jax.Array, sx: float, sy: float) -> jax.Array:
    """Map decoded xyxy boxes from the upscaled grid back to native pixels."""
    return boxes / jnp.asarray([sx, sy, sx, sy], jnp.float32)


def upscaled_hw(h: int, w: int, scale: float, stride: int = 16
                ) -> tuple[int, int]:
    """Target dims for upscaled inference: scale, rounded to the stride."""
    th = max(stride, int(round(h * scale / stride)) * stride)
    tw = max(stride, int(round(w * scale / stride)) * stride)
    return th, tw


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def _detect_upscaled_jit(cfg: CNNDetectorConfig, params, frames_u8, k,
                         thresh, th, tw):
    """Upscaled-inference detect: resize on device, run the forward on the
    scaled frames, and map the boxes back to native coordinates — all in
    ONE jit so the resize fuses with the stem's layout work.

    Small GTSDB signs (16 px spans one s16 cell) recover the quality the
    v3 grid gives up at native resolution: measured on the 150-frame
    protocol, native F1 0.81 / AP 0.853 vs 1.412x-upscaled **0.84 /
    0.942** (PARITY.md round 4).  Measured 1,327 fps at batch 128 — the
    f32 resize matmuls dominate; see PARITY's upscaled-inference note."""
    h, w = frames_u8.shape[1:3]
    out = SignCenterNet(cfg).apply(
        {"params": params}, upscale_frames(frames_u8, th, tw))
    boxes, cls, scores, valid = decode_detections(out, k, thresh, cfg.stride)
    return rescale_boxes(boxes, tw / w, th / h), cls, scores, valid


def _trunk_params(params) -> dict:
    return {key: val for key, val in params.items() if key != "Conv_0"}


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _detect_fused_upscaled_jit(cfg: CNNDetectorConfig, params, frames_u8,
                               k, thresh, plan):
    """Upscaled inference with NO upscaled frame: the bilinear upscale,
    the 8x8 patchify, and the stem matmul evaluated as one folded linear
    map on native pixels (ops/fused_upscale.py), then the ordinary v3
    trunk/heads/decode at the upscaled grid with boxes mapped back to
    native coordinates.  Replaces the materialize-then-forward
    ``_detect_upscaled_jit`` for fusable rational scales — measured
    section in PARITY.md round 5."""
    from ..ops.fused_upscale import fused_upscale_stem

    stem = fused_upscale_stem(
        frames_u8, params["Conv_0"]["kernel"], params["Conv_0"]["bias"],
        plan, cfg.compute_dtype())
    out = V3TrunkHeads(cfg).apply({"params": _trunk_params(params)}, stem)
    boxes, cls, scores, valid = decode_detections(out, k, thresh, cfg.stride)
    sx, sy = plan.rescale_factors()
    return rescale_boxes(boxes, sx, sy), cls, scores, valid


@partial(jax.jit, static_argnums=(0, 5, 6, 7))
def _detect_fused_upscaled_yuv_jit(cfg: CNNDetectorConfig, params, y, cb,
                                   cr, k, thresh, plan):
    """Half-bandwidth ingest + folded upscale: raw 4:2:0 planes ->
    libjpeg-exact BGR (in-graph, ops/yuv.py) -> fused upscale+stem ->
    trunk -> boxes in native coordinates."""
    from ..ops.fused_upscale import fused_upscale_stem
    from ..ops.yuv import yuv420_to_bgr

    frames_u8 = yuv420_to_bgr(y, cb, cr)
    stem = fused_upscale_stem(
        frames_u8, params["Conv_0"]["kernel"], params["Conv_0"]["bias"],
        plan, cfg.compute_dtype())
    out = V3TrunkHeads(cfg).apply({"params": _trunk_params(params)}, stem)
    boxes, cls, scores, valid = decode_detections(out, k, thresh, cfg.stride)
    sx, sy = plan.rescale_factors()
    return rescale_boxes(boxes, sx, sy), cls, scores, valid


@partial(jax.jit, static_argnums=(0, 5, 6))
def _detect_yuv_patches_jit(cfg: CNNDetectorConfig, params, y_p, cb_p, cr_p,
                            k, thresh):
    """Half-bandwidth ingest with ZERO on-device relayout: patchified raw
    4:2:0 planes in (the layout the native loader emits at decode time),
    converted to BGR patches8 entirely in patch space (ops/yuv.py:
    yuv420_patches_to_bgr_patches8, bit-exact libjpeg math) and consumed
    by the stem as one K=192 matmul — the yuv420 path no longer pays the
    in-graph patchify that made it 13.5 ms vs patches8's 5.0 ms per 128
    1080p frames (VERDICT r4 next-step #2)."""
    from ..ops.yuv import yuv420_patches_to_bgr_patches8

    patches = yuv420_patches_to_bgr_patches8(y_p, cb_p, cr_p)
    out = SignCenterNet(cfg).apply({"params": params}, patches)
    return decode_detections(out, k, thresh, cfg.stride)


@partial(jax.jit, static_argnums=(0, 5, 6))
def _detect_yuv_jit(cfg: CNNDetectorConfig, params, y, cb, cr, k, thresh):
    """Half-bandwidth ingest: raw JPEG 4:2:0 planes in, detections out.

    The host ships 1.5 bytes/px (runtime/loader.py: decode_jpeg_yuv420_batch)
    and the libjpeg-exact upsample + YCbCr->BGR (ops/yuv.py) fuses into the
    same jit as the forward pass, so the conversion runs where the
    bandwidth is free (HBM) instead of where it is scarce (the
    host->device link)."""
    from ..ops.yuv import yuv420_to_bgr

    frames_u8 = yuv420_to_bgr(y, cb, cr)
    out = SignCenterNet(cfg).apply({"params": params}, frames_u8)
    return decode_detections(out, k, thresh, cfg.stride)


@partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
def _detect_yuv_upscaled_jit(cfg: CNNDetectorConfig, params, y, cb, cr,
                             k, thresh, th, tw):
    """Half-bandwidth ingest + upscaled inference in one jit: raw 4:2:0
    planes -> libjpeg-exact BGR -> bilinear upscale -> forward -> boxes
    mapped back to native coordinates."""
    from ..ops.yuv import yuv420_to_bgr

    frames_u8 = yuv420_to_bgr(y, cb, cr)
    h, w = frames_u8.shape[1:3]
    out = SignCenterNet(cfg).apply(
        {"params": params}, upscale_frames(frames_u8, th, tw))
    boxes, cls, scores, valid = decode_detections(out, k, thresh, cfg.stride)
    return rescale_boxes(boxes, tw / w, th / h), cls, scores, valid


class CNNDetector:
    """Batched full-frame detector over saved weights.

    Mirrors ``models/detector.py``'s dispatch/collect contract so the
    directory driver and the streaming server can host either model family.
    """

    def __init__(self, params, cfg: CNNDetectorConfig | None = None,
                 upscale: float = 1.0):
        self.cfg = cfg or CNNDetectorConfig()
        self.params = params
        # Upscaled-inference operating point (``--upscale``): frames are
        # bilinearly scaled on device by this factor before the forward and
        # boxes mapped back to native coordinates — recovers the small-sign
        # quality the s16 grid gives up at native GTSDB resolution
        # (F1 0.81 -> 0.83, AP 0.852 -> 0.904+ measured at 1.412x).
        # For fusable rational scales on the v3 arch the upscale folds into
        # the stem (ops/fused_upscale.py) and costs ~no extra bandwidth.
        self.upscale = float(upscale)

    def _fused_plan(self, h: int, w: int):
        """Fused upscale+stem plan for this operating point, or None."""
        if self.upscale == 1.0 or self.cfg.arch != "v3":
            return None
        from ..ops.fused_upscale import find_plan

        return find_plan(h, w, self.upscale)

    @classmethod
    def load(cls, path: str, cfg: CNNDetectorConfig | None = None):
        if cfg is None:
            cfg = CNNDetectorConfig(**saved_meta(path))
        template = init_params(cfg)
        return cls(load_params(path, template), cfg)

    def save(self, path: str) -> None:
        save_params(path, self.params, arch=self.cfg.arch,
                    score_threshold=self.cfg.score_threshold)

    def dispatch(self, frames: np.ndarray):
        """frames uint8 [B,H,W,3] BGR with H,W multiples of 16."""
        if self.upscale != 1.0:
            if frames.shape[-1] != 3:
                raise ValueError(
                    "upscaled inference needs [B,H,W,3] frames; the "
                    "patches8 layout is pre-patchified at native "
                    "resolution (use --input_format bgr or yuv420)")
            plan = self._fused_plan(frames.shape[1], frames.shape[2])
            if plan is not None:
                return _detect_fused_upscaled_jit(
                    self.cfg, self.params, jnp.asarray(frames),
                    self.cfg.max_detections, self.cfg.score_threshold, plan)
            th, tw = upscaled_hw(frames.shape[1], frames.shape[2],
                                 self.upscale, self.cfg.stride)
            return _detect_upscaled_jit(
                self.cfg, self.params, jnp.asarray(frames),
                self.cfg.max_detections, self.cfg.score_threshold, th, tw)
        return _detect_jit(self.cfg, self.params, jnp.asarray(frames),
                           self.cfg.max_detections, self.cfg.score_threshold)

    def dispatch_yuv(self, y, cb, cr):
        """Raw 4:2:0 planes — the half-bandwidth input path; conversion
        fuses into the forward jit.  Two layouts, keyed on ndim:

        * tight planes: y [B,H,W], cb/cr [B,H/2,W/2] uint8;
        * patchified planes (v3, native-resolution): y [B,H/8,W/8,64],
          cb/cr [B,H/8,W/8,16] — zero on-device relayout (the conversion
          runs in patch space; ops/yuv.py)."""
        if y.ndim == 4 and self.upscale == 1.0 and self.cfg.arch == "v3":
            return _detect_yuv_patches_jit(
                self.cfg, self.params, jnp.asarray(y), jnp.asarray(cb),
                jnp.asarray(cr), self.cfg.max_detections,
                self.cfg.score_threshold)
        if y.ndim == 4:
            raise ValueError(
                "patchified yuv planes need the v3 arch at native "
                "resolution (use tight planes for --upscale or other "
                "arches)")
        if self.upscale != 1.0:
            plan = self._fused_plan(y.shape[1], y.shape[2])
            if plan is not None:
                return _detect_fused_upscaled_yuv_jit(
                    self.cfg, self.params, jnp.asarray(y), jnp.asarray(cb),
                    jnp.asarray(cr), self.cfg.max_detections,
                    self.cfg.score_threshold, plan)
            th, tw = upscaled_hw(y.shape[1], y.shape[2], self.upscale,
                                 self.cfg.stride)
            return _detect_yuv_upscaled_jit(
                self.cfg, self.params, jnp.asarray(y), jnp.asarray(cb),
                jnp.asarray(cr), self.cfg.max_detections,
                self.cfg.score_threshold, th, tw)
        return _detect_yuv_jit(self.cfg, self.params, jnp.asarray(y),
                               jnp.asarray(cb), jnp.asarray(cr),
                               self.cfg.max_detections,
                               self.cfg.score_threshold)

    def collect(self, handles, filenames: list[str],
                orig_hw: tuple[int, int] | None = None) -> list[GroundTruthBox]:
        boxes, cls, scores, valid = [np.asarray(h) for h in handles]
        dets: list[GroundTruthBox] = []
        for i, name in enumerate(filenames):
            for j in range(boxes.shape[1]):
                if not valid[i, j]:
                    continue
                x1, y1, x2, y2 = boxes[i, j]
                if orig_hw is not None:
                    h, w = orig_hw
                    x1, x2 = np.clip([x1, x2], 0, w - 1)
                    y1, y2 = np.clip([y1, y2], 0, h - 1)
                if x2 - x1 < 2 or y2 - y1 < 2:
                    continue
                dets.append(GroundTruthBox(
                    filename=name,
                    x1=int(round(float(x1))), y1=int(round(float(y1))),
                    x2=int(round(float(x2))), y2=int(round(float(y2))),
                    class_id=int(cls[i, j]),
                    score=float(scores[i, j])))
        return dets

    def detect_frames(self, frames: np.ndarray, filenames: list[str],
                      orig_hw: tuple[int, int] | None = None):
        return self.collect(self.dispatch(frames), filenames, orig_hw)

    def run_directory(self, directory: str, batch_size: int = 32,
                      progress: bool = False,
                      input_format: str = "bgr") -> list[GroundTruthBox]:
        """Detect over a dataset directory with decode-ahead + one batch in
        flight (same overlap contract as ``DetectionPipeline.run_directory``).

        ``input_format="yuv420"`` ships raw JPEG chroma-subsampled planes
        (1.5 bytes/px) and converts on device — halves the host->device
        upload that bounds e2e throughput on bandwidth-starved links.
        4:4:4 sources are chroma-pooled by the loader (GTSDB ships 4:4:4;
        measured flagship delta: F1 unchanged at 0.81, AP 0.852 -> 0.839
        — PARITY.md round-4 input-feed note).

        ``input_format="patches8"`` (v3 arch only) decodes straight into
        the stem's matmul layout [B, H/8, W/8, 192] — same bytes, zero
        on-device relayout, measured 3.5x stem / ~1.6x full-model speed."""
        from ..data.images import list_frame_files
        from ..data.prefetch import batched_frames

        if (input_format == "yuv420" and self.cfg.arch == "v3"
                and self.upscale == 1.0):
            # same bytes, same bit-exact result, zero on-device relayout:
            # prefer the patchified plane layout (falls back transparently)
            input_format = "yuv420p"
        files = list_frame_files(directory)
        dets: list[GroundTruthBox] = []
        pending = None
        done = 0
        orig_hw = None
        for frames, names in batched_frames(directory, files, batch_size,
                                            device_put=True,
                                            input_format=input_format):
            if isinstance(frames, tuple):
                if orig_hw is None:
                    scale = 8 if frames[0].ndim == 4 else 1
                    orig_hw = (int(frames[0].shape[1]) * scale,
                               int(frames[0].shape[2]) * scale)
                out = self.dispatch_yuv(*frames)
            else:
                if orig_hw is None:
                    scale = 8 if frames.shape[-1] == 192 else 1
                    orig_hw = (int(frames.shape[1]) * scale,
                               int(frames.shape[2]) * scale)
                out = self.dispatch(frames)
            if pending is not None:
                dets.extend(d for d in self.collect(*pending)
                            if d.filename != "__pad__")
                done = min(done + batch_size, len(files))
                if progress:
                    print(f"  processed {done}/{len(files)} frames")
            pending = (out, names, orig_hw)
        if pending is not None:
            dets.extend(d for d in self.collect(*pending)
                        if d.filename != "__pad__")
            if progress:
                print(f"  processed {len(files)}/{len(files)} frames")
        return dets
