"""Full-fidelity pipeline golden test (VERDICT r1 item 8).

Runs 8 real GTSDB frames through the exact shipped tuned config
(downscale-2 sweep, 256 proposal slots, mask_corr_tol 0.55 — the config
behind the pinned full-set parity artifacts) and matches the detection
box set against a pinned expectation, per frame, by IoU.

Scope caveat: on the CPU backend (what CI runs) `fused_sweep_ok` and
`pallas_available_for` return False, so this pins the *XLA* sweep and the
roll-flood refine — NOT the fused Pallas sweep / fused flood kernel the
TPU path ships.  TPU-path regressions are caught by the opt-in TPU lane
(``TSD_TPU_TESTS=1``, see tests/test_tpu_lane.py) and the per-round
full-set artifact pins, not by this test.

Regenerate the fixture after *intentional* quality changes with
``python scripts/gen_golden.py``.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from gen_golden import GOLDEN_FRAMES, OUT, run_golden_frames

from opencv_traffic_sign_detector_tpu.data.gt import load_results_file


def _by_file(dets):
    out = {f: [] for f in GOLDEN_FRAMES}
    for d in dets:
        out.setdefault(d.filename, []).append(d)
    return out


def _iou(a, b):
    ix = max(0, min(a.x2, b.x2) - max(a.x1, b.x1))
    iy = max(0, min(a.y2, b.y2) - max(a.y1, b.y1))
    inter = ix * iy
    union = (
        (a.x2 - a.x1) * (a.y2 - a.y1)
        + (b.x2 - b.x1) * (b.y2 - b.y1)
        - inter
    )
    return inter / union if union > 0 else 0.0


def test_golden_pipeline_8_frames():
    if not os.path.exists(OUT):
        pytest.fail(f"golden fixture missing: {OUT} (run scripts/gen_golden.py)")
    pinned = _by_file(load_results_file(OUT))
    got = _by_file(run_golden_frames())

    for fname in GOLDEN_FRAMES:
        p, g = pinned.get(fname, []), got.get(fname, [])
        assert len(p) == len(g), (
            f"{fname}: detection count changed (pinned {len(p)}, got {len(g)}) — "
            "kernel behaviour shifted; if intentional, rerun scripts/gen_golden.py"
        )
        used = set()
        for pb in p:
            best_j, best_iou = -1, 0.0
            for j, gb in enumerate(g):
                if j in used or gb.class_id != pb.class_id:
                    continue
                v = _iou(pb, gb)
                if v > best_iou:
                    best_j, best_iou = j, v
            got_boxes = [(b.x1, b.y1, b.x2, b.y2, b.class_id) for b in g]
            assert best_iou >= 0.9, (
                f"{fname}: pinned box {(pb.x1, pb.y1, pb.x2, pb.y2, pb.class_id)} "
                f"has no same-class match at IoU>=0.9 (best {best_iou:.3f}) in "
                f"{got_boxes}"
            )
            assert abs(g[best_j].score - pb.score) <= 0.05, (
                f"{fname}: score drifted {pb.score} -> {g[best_j].score}"
            )
            used.add(best_j)
