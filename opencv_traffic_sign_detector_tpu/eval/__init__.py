from .ap import (
    average_precision_voc,
    average_precision_11pt,
    bbox_overlap,
    precision_recall_curve,
    pr_from_tp_fp,
    score_detection_files,
)
from .stats import DetectionStats, compute_detection_statistics

__all__ = [
    "average_precision_voc",
    "average_precision_11pt",
    "bbox_overlap",
    "precision_recall_curve",
    "pr_from_tp_fp",
    "score_detection_files",
    "DetectionStats",
    "compute_detection_statistics",
]
