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

__all__ = [
    "bgr_to_gray",
    "bgr_to_hsv",
    "color_mask",
    "gamma_lut",
    "gamma_correct",
    "gaussian_blur_3x3",
    "clahe_equalize",
    "enhance_contrast",
]
