#!/usr/bin/env python3
"""Regenerate the full-fidelity pipeline golden fixture.

Runs the shipped tuned detection config (downscale-2 sweep, 256 proposal
slots, mask_corr_tol 0.55) over the first 8 GTSDB test frames on the CPU
backend (the backend the test suite runs on) and pins the resulting
resultado-format lines to ``tests/fixtures/golden_pipeline_8f.txt``.

Run this ONLY when an intentional quality-affecting change lands; the
paired test (`tests/test_golden_pipeline.py`) exists so that *unintended*
kernel regressions fail CI.

The producing backend is recorded in a ``.meta`` sidecar next to the
fixture; ``--backend native`` regenerates on whatever backend the host
exposes (a real TPU under axon) so a TPU-path fixture can be pinned too.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_FRAMES = [f"{600 + i:05d}.jpg" for i in range(8)]
DET_DIR = "/root/reference/Deteción de Objetos/test_alumnos_jpg"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "golden_pipeline_8f.txt",
)


def golden_config():
    from opencv_traffic_sign_detector_tpu.config import MSERConfig, PipelineConfig

    return PipelineConfig(
        mser=MSERConfig(
            delta=7,
            min_area=200,
            max_area=2000,
            max_variation=1.0,
            downscale=2,
            max_regions=256,
        ),
        batch_size=4,
        mask_corr_tol=0.55,
    )


def run_golden_frames():
    import numpy as np

    from opencv_traffic_sign_detector_tpu.data.images import load_image_bgr
    from opencv_traffic_sign_detector_tpu.models.detector import DetectionPipeline
    from opencv_traffic_sign_detector_tpu.models.mean_masks import MeanMaskTemplates

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    templates = MeanMaskTemplates.load(os.path.join(repo, "artifacts", "mean_masks.npz"))
    pipe = DetectionPipeline(cfg=golden_config(), templates=templates)
    dets = []
    for i in range(0, len(GOLDEN_FRAMES), 4):
        chunk = GOLDEN_FRAMES[i : i + 4]
        frames = np.stack(
            [load_image_bgr(os.path.join(DET_DIR, f)) for f in chunk]
        )
        dets.extend(pipe.detect_frames(frames, chunk))
    return dets


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--backend",
        choices=["cpu", "native"],
        default="cpu",
        help="cpu = force the CPU backend (what CI runs); native = use the "
        "host's default backend (a real TPU under axon)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.backend == "cpu":
        # set here, NOT at module import: the paired test imports this
        # module and must not silently force the whole session onto CPU
        jax.config.update("jax_platforms", "cpu")

    from opencv_traffic_sign_detector_tpu.utils.serialization import (
        write_results_file,
    )

    dets = run_golden_frames()
    # the CPU fixture pins the XLA path CI runs; the native (TPU) fixture
    # pins the fused Pallas path for the opt-in lane (tests/test_tpu_lane.py)
    out = OUT if args.backend == "cpu" else OUT.replace(".txt", "_tpu.txt")
    write_results_file(out, dets)
    with open(out + ".meta", "w") as fh:
        fh.write(f"backend={jax.default_backend()}\n")
    print(f"wrote {len(dets)} detections to {out} "
          f"(backend={jax.default_backend()})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
