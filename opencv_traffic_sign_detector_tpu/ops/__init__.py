from .color import (
    bgr_to_gray,
    bgr_to_hsv,
    color_mask,
    gamma_lut,
    gamma_correct,
)
from .blur import gaussian_blur_3x3
from .clahe import clahe_equalize
from .preprocess import enhance_contrast
from .mser import mser_regions, mser_regions_batch
from .geometry import (
    filter_and_grow_boxes,
    pairwise_coord_similarity,
    boxes_match_score,
    iou_matrix,
)
from .resize import crop_and_resize, resize_batch
from .dedup import dedup_by_coords, dedup_by_histogram
from .histogram import hist_correlation, hs_histograms
from .hog import gray_descriptors, hog_descriptors

__all__ = [
    "bgr_to_gray",
    "bgr_to_hsv",
    "color_mask",
    "gamma_lut",
    "gamma_correct",
    "gaussian_blur_3x3",
    "clahe_equalize",
    "enhance_contrast",
    "mser_regions",
    "mser_regions_batch",
    "filter_and_grow_boxes",
    "pairwise_coord_similarity",
    "boxes_match_score",
    "iou_matrix",
    "crop_and_resize",
    "resize_batch",
    "dedup_by_coords",
    "dedup_by_histogram",
    "hist_correlation",
    "hs_histograms",
    "gray_descriptors",
    "hog_descriptors",
]
