"""Opt-in real-TPU test lane (VERDICT r2 item 6).

The CI suite forces the CPU backend, where `fused_sweep_ok` is False — so
the shipped TPU path (fused Pallas sweep + fused flood refine) is never
what CPU CI pins.  This lane runs on the real chip:

    TSD_TPU_TESTS=1 python -m pytest tests/test_tpu_lane.py -q

Requirements: exclusive chip access (NEVER run two TPU processes through
the axon relay at once), and the reference GTSDB frames on disk.  Covers:

* interpret-vs-chip equality of `fused_level_sweep` on a real frame crop —
  the Mosaic lowering itself is the unit under test;
* the 8-frame golden pipeline on the *fused* path against the TPU-pinned
  fixture (``golden_pipeline_8f_tpu.txt``, regenerate with
  ``python scripts/gen_golden.py --backend native``).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.tpu, pytest.mark.slow]

if not os.environ.get("TSD_TPU_TESTS"):
    pytest.skip(
        "TPU lane is opt-in: set TSD_TPU_TESTS=1 (requires a real chip)",
        allow_module_level=True,
    )

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

DET_DIR = "/root/reference/Deteción de Objetos/test_alumnos_jpg"


@pytest.fixture(scope="module")
def real_frame():
    from opencv_traffic_sign_detector_tpu.data.images import load_image_bgr

    path = os.path.join(DET_DIR, "00600.jpg")
    if not os.path.exists(path):
        pytest.skip("reference GTSDB frames not available")
    return load_image_bgr(path)


def test_backend_is_tpu():
    import jax

    assert jax.default_backend() not in ("cpu",), (
        "TPU lane running on CPU — the axon backend did not come up"
    )


def test_fused_sweep_chip_matches_interpret(real_frame):
    """Mosaic-lowered sweep == interpreter, bit-for-bit, on real pixels."""
    import jax
    import jax.numpy as jnp

    from opencv_traffic_sign_detector_tpu.config import MSERConfig
    from opencv_traffic_sign_detector_tpu.ops.color import bgr_to_gray
    from opencv_traffic_sign_detector_tpu.ops.mser_pallas import (
        fused_level_sweep,
        fused_sweep_ok,
    )

    # ccl_jumps=0: the fused kernel has no pointer-jump gathers, and
    # fused_sweep_ok (correctly) refuses configs that ask for them
    cfg = MSERConfig(max_variation=1.0, downscale=1, max_regions=256,
                     ccl_jumps=0)
    gray = np.asarray(bgr_to_gray(jnp.asarray(real_frame)))
    crop = gray[300:556, 500:756]  # 256x256 window with road-scene content
    g = crop.astype(np.int32)
    both = np.stack([g, 255 - g])
    im2 = np.pad(both, ((0, 0), (1, 1), (1, 1)), constant_values=255)

    assert fused_sweep_ok(im2.shape[1], im2.shape[2], cfg)
    step = cfg.level_step if cfg.level_step > 0 else cfg.delta
    d_idx = max(1, round(cfg.delta / step))
    num_levels = len(range(0, 256 + (d_idx + 1) * step + 1, step))

    x = jnp.asarray(im2)
    chip = np.asarray(fused_level_sweep(x, cfg, d_idx, num_levels))
    interp = np.asarray(
        fused_level_sweep(x, cfg, d_idx, num_levels, interpret=True)
    )
    mismatch = (chip != interp).mean()
    assert mismatch == 0.0, f"chip vs interpret mismatch on {mismatch:.2%} px"


def test_golden_pipeline_fused_tpu():
    """8 real frames through the fused TPU path vs the TPU-pinned fixture."""
    from gen_golden import GOLDEN_FRAMES, OUT, run_golden_frames

    from opencv_traffic_sign_detector_tpu.data.gt import load_results_file
    from test_golden_pipeline import _by_file, _iou

    tpu_fixture = OUT.replace(".txt", "_tpu.txt")
    if not os.path.exists(tpu_fixture):
        pytest.fail(
            f"TPU golden fixture missing: {tpu_fixture} "
            "(run scripts/gen_golden.py --backend native on the chip)"
        )
    pinned = _by_file(load_results_file(tpu_fixture))
    got = _by_file(run_golden_frames())
    for fname in GOLDEN_FRAMES:
        p, g = pinned.get(fname, []), got.get(fname, [])
        assert len(p) == len(g), (
            f"{fname}: {len(g)} detections vs pinned {len(p)}"
        )
        for det in g:
            best = max((_iou(det, q) for q in p), default=0.0)
            assert best > 0.9, f"{fname}: box {det} drifted (best IoU {best:.2f})"


def test_cnn_input_formats_agree_on_chip():
    """The three CNN ingest paths (BGR frames, patches8, yuv420) produce
    consistent detections on the real chip with the shipped weights."""
    import jax.numpy as jnp

    from opencv_traffic_sign_detector_tpu.data.images import (
        load_frames_batch,
        load_frames_patches8_batch,
        load_frames_yuv420_batch,
    )
    from opencv_traffic_sign_detector_tpu.models.cnn_detector import (
        CNNDetector,
    )

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "cnn_detector",
        "params.npz")
    if not os.path.exists(ckpt) or not os.path.isdir(DET_DIR):
        pytest.skip("shipped weights or frames unavailable")
    det = CNNDetector.load(ckpt)
    files = sorted(f for f in os.listdir(DET_DIR) if f.endswith(".jpg"))[:4]

    frames = load_frames_batch(DET_DIR, files)
    pat = load_frames_patches8_batch(DET_DIR, files)
    yuv = load_frames_yuv420_batch(DET_DIR, files)
    assert pat is not None and yuv is not None

    o_bgr = det.dispatch(jnp.asarray(frames))
    o_pat = det.dispatch(jnp.asarray(pat))
    # patches8 is the same bytes, but XLA fuses the two stem entries
    # differently per shape, so chip scores agree only to bf16 ULP
    # (CPU asserts bit-level identity in test_runtime_loader.py)
    np.testing.assert_allclose(np.asarray(o_bgr[2]), np.asarray(o_pat[2]),
                               atol=5e-3)
    assert (np.asarray(o_bgr[3]) == np.asarray(o_pat[3])).mean() > 0.95

    # yuv420 of these 4:4:4 sources is chroma-pooled: detections must
    # agree at the box level (scores may move slightly)
    o_yuv = det.dispatch_yuv(*(jnp.asarray(p) for p in yuv))
    names = list(files)
    d_bgr = det.collect(o_bgr, names)
    d_yuv = det.collect(o_yuv, names)
    assert abs(len(d_bgr) - len(d_yuv)) <= 1
    from opencv_traffic_sign_detector_tpu.ops.geometry import iou_matrix

    import jax.numpy as _j
    if d_bgr and d_yuv:
        a = _j.asarray([[d.x1, d.y1, d.x2, d.y2] for d in d_bgr],
                       _j.float32)
        b = _j.asarray([[d.x1, d.y1, d.x2, d.y2] for d in d_yuv],
                       _j.float32)
        iou = np.asarray(iou_matrix(a, b))
        matched = (iou.max(axis=1) > 0.8).mean()
        assert matched >= 0.9, f"yuv boxes diverged: {matched}"


def test_cnn_int8_agrees_on_chip():
    """The int8 serving artifact must land on the float model's boxes on
    the real chip (quantize_cnn.py artifact, models/cnn_quant.py path)."""
    import jax.numpy as jnp

    from opencv_traffic_sign_detector_tpu.data.images import (
        load_frames_batch,
    )
    from opencv_traffic_sign_detector_tpu.models.cnn_detector import (
        CNNDetector,
    )
    from opencv_traffic_sign_detector_tpu.models.cnn_quant import (
        QuantCNNDetector,
    )
    from opencv_traffic_sign_detector_tpu.ops.geometry import iou_matrix

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(root, "artifacts", "cnn_detector", "params.npz")
    qckpt = os.path.join(root, "artifacts", "cnn_detector",
                         "params_int8.npz")
    if not (os.path.exists(ckpt) and os.path.exists(qckpt)
            and os.path.isdir(DET_DIR)):
        pytest.skip("shipped weights or frames unavailable")
    det = CNNDetector.load(ckpt)
    qdet = QuantCNNDetector.load(qckpt)
    files = sorted(f for f in os.listdir(DET_DIR) if f.endswith(".jpg"))[:8]
    frames = load_frames_batch(DET_DIR, files)

    d_f = det.collect(det.dispatch(jnp.asarray(frames)), list(files))
    d_q = qdet.collect(qdet.dispatch(jnp.asarray(frames)), list(files))
    assert d_f, "float model found nothing on these frames"
    assert abs(len(d_f) - len(d_q)) <= max(1, len(d_f) // 5)
    a = jnp.asarray([[d.x1, d.y1, d.x2, d.y2] for d in d_f], jnp.float32)
    b = jnp.asarray([[d.x1, d.y1, d.x2, d.y2] for d in d_q], jnp.float32)
    iou = np.asarray(iou_matrix(a, b))
    matched = (iou.max(axis=1) > 0.7).mean()
    assert matched >= 0.85, f"int8 boxes diverged from float: {matched}"
