"""The detector's contrast-enhancement preprocessing chain.

gray -> CLAHE(clip 2) -> Gaussian 3x3 -> gamma LUT (gamma=2), equivalent to
the reference's grayAndEnhanceContrast (`Deteción de Objetos/source.py:135-152`).
Everything runs on device and fuses under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from .blur import gaussian_blur_3x3
from .clahe import clahe_equalize
from .color import bgr_to_gray, gamma_correct


def enhance_contrast(bgr: jnp.ndarray, gamma: float = 2.0) -> jnp.ndarray:
    """BGR uint8 [..., H, W, 3] -> enhanced gray uint8 [..., H, W]."""
    return enhance_gray(bgr_to_gray(bgr), gamma)


def enhance_gray(gray: jnp.ndarray, gamma: float = 2.0) -> jnp.ndarray:
    """The same chain on an already-gray frame (any resolution)."""
    eq = clahe_equalize(gray, clip_limit=2.0, tiles=8)
    blurred = gaussian_blur_3x3(eq)
    return gamma_correct(blurred, gamma)
