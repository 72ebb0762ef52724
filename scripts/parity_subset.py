#!/usr/bin/env python3
"""Detection parity check on a frame subset vs the reference's resultado.

Runs our Práctica-1 pipeline over the first N test frames, then scores both
our detections and the reference's (fixture resultado) against gt.txt
restricted to those frames.  Reports per-pipeline precision/recall/F1 and AP.

    python scripts/parity_subset.py --frames 24 [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=24)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--max_regions", type=int, default=768)
    parser.add_argument("--downscale", type=int, default=1)
    parser.add_argument("--level_step", type=int, default=0)
    parser.add_argument("--out", default="/tmp/parity_resultado.txt")
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from opencv_traffic_sign_detector_tpu.config import MSERConfig, PipelineConfig
    from opencv_traffic_sign_detector_tpu.data.gt import (
        load_ground_truth,
        load_results_file,
    )
    from opencv_traffic_sign_detector_tpu.data.images import (
        list_frame_files,
        load_image_bgr,
    )
    from opencv_traffic_sign_detector_tpu.eval.ap import (
        pr_from_tp_fp,
        precision_recall_curve,
    )
    from opencv_traffic_sign_detector_tpu.eval.stats import (
        compute_detection_statistics,
    )
    from opencv_traffic_sign_detector_tpu.models.detector import DetectionPipeline
    from opencv_traffic_sign_detector_tpu.models.mean_masks import (
        MeanMaskTemplates,
        train_mean_masks,
    )
    from opencv_traffic_sign_detector_tpu.utils.serialization import (
        write_results_file,
    )

    det_root = "/root/reference/Deteción de Objetos"
    test_dir = os.path.join(det_root, "test_alumnos_jpg")
    files = list_frame_files(test_dir)[: args.frames]

    tmpl_cache = "/tmp/mean_masks.npz"
    if os.path.exists(tmpl_cache):
        templates = MeanMaskTemplates.load(tmpl_cache)
    else:
        print("training templates...")
        templates = train_mean_masks(os.path.join(det_root, "train_jpg"))
        templates.save(tmpl_cache)

    cfg = PipelineConfig(
        mser=MSERConfig(max_variation=1.0, max_regions=args.max_regions,
                        downscale=args.downscale, level_step=args.level_step),
        batch_size=args.batch,
    )
    pipe = DetectionPipeline(cfg=cfg, templates=templates)

    print(f"detecting over {len(files)} frames...")
    t0 = time.time()
    dets = []
    for start in range(0, len(files), args.batch):
        chunk = files[start : start + args.batch]
        frames = np.stack([load_image_bgr(os.path.join(test_dir, f)) for f in chunk])
        names = list(chunk)
        if len(chunk) < args.batch:
            reps = args.batch - len(chunk)
            frames = np.concatenate([frames, frames[-1:].repeat(reps, 0)])
            names += ["__pad__"] * reps
        dets.extend(d for d in pipe.detect_frames(frames, names)
                    if d.filename != "__pad__")
        print(f"  {min(start + args.batch, len(files))}/{len(files)} "
              f"({time.time() - t0:.0f}s)")
    dt = time.time() - t0
    print(f"{len(dets)} detections in {dt:.1f}s ({len(files) / dt:.2f} fps)")
    write_results_file(args.out, dets)

    stems = {f.split(".")[0] for f in files}
    gt = [g for g in load_ground_truth(os.path.join(test_dir, "gt.txt"))
          if g.filename.split(".")[0] in stems]
    ref_dets = [
        d
        for d in load_results_file(
            "tests/fixtures/ref_resultado_MSER_7_200_2000_1.txt"
        )
        if d.filename.split(".")[0] in stems
    ]

    for name, d in (("ours", dets), ("reference", ref_dets)):
        stats = compute_detection_statistics(d, gt, frame_names=sorted(stems))
        t = stats.total
        tp, fp, _thr, n_gt = precision_recall_curve(gt, d)
        _, _, ap, _ = pr_from_tp_fp(tp, fp, n_gt)
        print(
            f"{name}: {len(d)} dets | correct {t.correct} incorrect "
            f"{t.incorrect} missed {t.non_detected} | P {t.precision} "
            f"R {t.recall} F1 {t.f1} | AP {ap:.4f}"
        )


if __name__ == "__main__":
    main()
