from .mean_masks import (
    MeanMaskTemplates,
    train_mean_masks,
    mask_correlation_classify,
)
from .detector import DetectionPipeline

__all__ = [
    "MeanMaskTemplates",
    "train_mean_masks",
    "mask_correlation_classify",
    "DetectionPipeline",
]
