"""Default-lane pin of the SHIPPED fused Pallas path via the Mosaic
interpreter (VERDICT r3 weak #5).

The golden-pipeline test runs the XLA fallback on CPU; this test forces the
fused kernel path (``TSD_PALLAS_INTERPRET=1`` -> fused sweep +
pooled-packed top-k + fused flood refine, all through the interpreter) on a
real-frame crop and requires it to reproduce the chip-generated fixture
``fused_crop_mser_tpu.npz`` (regenerate on the chip with
``python scripts/gen_fused_fixture.py``).  Chip==interpret equivalence of
the lowering itself is asserted by the opt-in TPU lane
(tests/test_tpu_lane.py); this test makes a kernel-logic regression fail
CPU CI instead of waiting for the next chip run.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from gen_fused_fixture import FRAME, OUT, run_crop, tuned_cfg


def _iou_xywh(a, b):
    ax1, ay1, aw, ah = a
    bx1, by1, bw, bh = b
    ix1, iy1 = max(ax1, bx1), max(ay1, by1)
    ix2, iy2 = min(ax1 + aw, bx1 + bw), min(ay1 + ah, by1 + bh)
    inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
    union = aw * ah + bw * bh - inter
    return inter / union if union else 0.0


def test_fused_path_interpret_matches_chip_fixture(monkeypatch):
    if not os.path.exists(FRAME):
        pytest.skip("reference GTSDB frames not available")
    if not os.path.exists(OUT):
        pytest.fail(f"chip fixture missing: {OUT} "
                    "(run scripts/gen_fused_fixture.py on the chip)")
    monkeypatch.setenv("TSD_PALLAS_INTERPRET", "1")

    from opencv_traffic_sign_detector_tpu.ops.mser_pallas import (
        force_interpret,
        fused_sweep_ok,
    )

    assert force_interpret()
    cfg = tuned_cfg()
    # the crop geometry must actually route through the fused sweep
    h, w = 256 // cfg.downscale + 2, 256 // cfg.downscale + 2
    assert fused_sweep_ok(h, w, cfg)

    boxes, valid = run_crop()
    pinned = np.load(OUT)
    pb, pv = pinned["boxes"], pinned["valid"]

    assert valid.sum() > 0, "interpret run produced no proposals"
    assert int(valid.sum()) == int(pv.sum()), (
        f"proposal count drifted: {int(valid.sum())} vs pinned "
        f"{int(pv.sum())}")
    ours = boxes[valid]
    theirs = pb[pv]
    for box in ours:
        best = max(_iou_xywh(box, q) for q in theirs)
        assert best > 0.99, (
            f"proposal {box.tolist()} drifted from chip fixture "
            f"(best IoU {best:.3f})")
