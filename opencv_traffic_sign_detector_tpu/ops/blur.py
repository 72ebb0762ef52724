"""3x3 Gaussian blur on uint8 with OpenCV-exact integer arithmetic.

cv2.GaussianBlur(img, (3,3), 0) uses the fixed small-kernel [1,2,1]/4 in each
direction (sigma auto), BORDER_REFLECT_101 edges, and rounds the final
16-division with +8 bias.  Replaces `Deteción de Objetos/source.py:145`.
"""

from __future__ import annotations

import jax.numpy as jnp


def _reflect101_pad_hw(x: jnp.ndarray) -> jnp.ndarray:
    """Pad the last two dims by 1 with reflect-101 (abc -> b|abc|b)."""
    return jnp.pad(
        x,
        [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)],
        mode="reflect",
    )


def gaussian_blur_3x3(img: jnp.ndarray) -> jnp.ndarray:
    """Blur uint8 [..., H, W] with the separable [1,2,1]/4 kernel."""
    x = _reflect101_pad_hw(img.astype(jnp.int32))
    # Horizontal [1,2,1]
    h = x[..., 1:-1, :-2] + 2 * x[..., 1:-1, 1:-1] + x[..., 1:-1, 2:]
    # Re-pad rows of the horizontal result implicitly by slicing the padded
    # vertical neighbours of the same horizontal sum.
    hv_top = x[..., :-2, :-2] + 2 * x[..., :-2, 1:-1] + x[..., :-2, 2:]
    hv_bot = x[..., 2:, :-2] + 2 * x[..., 2:, 1:-1] + x[..., 2:, 2:]
    total = hv_top + 2 * h + hv_bot
    return ((total + 8) >> 4).astype(jnp.uint8)
