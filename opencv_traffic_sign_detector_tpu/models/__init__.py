from .mean_masks import (
    MeanMaskTemplates,
    train_mean_masks,
    mask_correlation_classify,
)
from .detector import DetectionPipeline, detect_batch, detect_frame
from .lda import LDAParams, lda_fit, lda_predict_proba, lda_transform
from .knn import KNNParams, knn_fit, knn_predict
from .recognizer import (
    SignClassifier,
    build_training_data,
    fit_classifier,
    predict_classifier,
    run_validation,
)
from .rec_pipeline import RecognitionPipeline

__all__ = [
    "MeanMaskTemplates",
    "train_mean_masks",
    "mask_correlation_classify",
    "DetectionPipeline",
    "detect_batch",
    "detect_frame",
    "LDAParams",
    "lda_fit",
    "lda_predict_proba",
    "lda_transform",
    "KNNParams",
    "knn_fit",
    "knn_predict",
    "SignClassifier",
    "build_training_data",
    "fit_classifier",
    "predict_classifier",
    "run_validation",
    "RecognitionPipeline",
]
