"""Oracle tests: color/preprocessing kernels vs OpenCV on real frames."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import require_cv2

from opencv_traffic_sign_detector_tpu.ops.blur import gaussian_blur_3x3
from opencv_traffic_sign_detector_tpu.ops.clahe import clahe_equalize
from opencv_traffic_sign_detector_tpu.ops.color import (
    bgr_to_gray,
    bgr_to_hsv,
    color_mask,
    gamma_correct,
    gamma_lut,
)
from opencv_traffic_sign_detector_tpu.ops.preprocess import enhance_contrast


@pytest.fixture(scope="module")
def frame(test_frames_dir):
    cv2 = require_cv2()
    img = cv2.imread(str(test_frames_dir / "00600.jpg"))
    assert img is not None
    return img


@pytest.fixture(scope="module")
def random_bgr():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)


def test_bgr_to_gray_exact(frame, random_bgr):
    cv2 = require_cv2()
    for img in (frame, random_bgr):
        ours = np.asarray(bgr_to_gray(img))
        theirs = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(ours, theirs)


def test_bgr_to_hsv_exact(frame, random_bgr):
    cv2 = require_cv2()
    for img in (frame, random_bgr):
        ours = np.asarray(bgr_to_hsv(img))
        theirs = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        np.testing.assert_array_equal(ours, theirs)


def test_color_masks_exact(frame, random_bgr):
    cv2 = require_cv2()
    for img in (frame, random_bgr):
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        red = cv2.add(
            cv2.inRange(hsv, np.array([0, 50, 10]), np.array([10, 255, 255])),
            cv2.inRange(hsv, np.array([160, 50, 10]), np.array([179, 255, 255])),
        )
        blue = cv2.inRange(hsv, np.array([90, 70, 10]), np.array([128, 255, 255]))
        np.testing.assert_array_equal(np.asarray(color_mask(img, "r")), red)
        np.testing.assert_array_equal(np.asarray(color_mask(img, "b")), blue)


def test_gamma_lut_matches_reference_table():
    table = np.array(
        [((i / 255) ** (1 / 2)) * 255 for i in range(256)], np.uint8
    )
    np.testing.assert_array_equal(gamma_lut(2.0), table)


def test_gamma_correct_all_256_inputs_match_table():
    """The gamma=2 sqrt fast path must be bit-exact vs the LUT on every
    possible uint8 input (and the generic threshold path on another gamma)."""
    x = np.arange(256, dtype=np.uint8).reshape(16, 16)
    np.testing.assert_array_equal(
        np.asarray(gamma_correct(x, 2.0)), gamma_lut(2.0)[x]
    )
    np.testing.assert_array_equal(
        np.asarray(gamma_correct(x, 1.5)), gamma_lut(1.5)[x]
    )


@pytest.mark.slow
def test_gamma_correct_exact(frame):
    cv2 = require_cv2()
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    table = np.array([((i / 255) ** 0.5) * 255 for i in range(256)], np.uint8)
    np.testing.assert_array_equal(
        np.asarray(gamma_correct(gray, 2.0)), cv2.LUT(gray, table)
    )


def test_gaussian_blur_exact(frame, random_bgr):
    cv2 = require_cv2()
    for img in (
        cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY),
        cv2.cvtColor(random_bgr, cv2.COLOR_BGR2GRAY),
    ):
        ours = np.asarray(gaussian_blur_3x3(img))
        theirs = cv2.GaussianBlur(img, (3, 3), 0)
        np.testing.assert_array_equal(ours, theirs)


def test_clahe_close_to_opencv_crop(frame):
    """Fast-lane CLAHE oracle on a 256x256 crop (the full-frame variants
    below are slow-marked; this keeps cv2 parity in the inner loop)."""
    cv2 = require_cv2()
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)[:256, :256]
    ours = np.asarray(clahe_equalize(gray)).astype(np.int32)
    theirs = cv2.createCLAHE(clipLimit=2).apply(gray).astype(np.int32)
    diff = np.abs(ours - theirs)
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


@pytest.mark.slow  # full-frame oracle, ~20-95 s on CPU
def test_clahe_close_to_opencv(frame):
    cv2 = require_cv2()
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    ours = np.asarray(clahe_equalize(gray)).astype(np.int32)
    theirs = cv2.createCLAHE(clipLimit=2).apply(gray).astype(np.int32)
    diff = np.abs(ours - theirs)
    # interpolation rounding may differ by 1 count on a tiny pixel fraction
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


@pytest.mark.slow  # full-frame oracle, ~20-95 s on CPU
def test_clahe_pallas_matches_xla_path(frame):
    """The TPU Pallas CLAHE kernels (interpret mode here) must agree with
    the XLA reference path within +-1 gray level on ~all pixels."""
    from opencv_traffic_sign_detector_tpu.ops.clahe_pallas import (
        clahe_equalize_pallas,
        pallas_ok_for,
    )

    cv2 = require_cv2()
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    h, w = gray.shape
    h8, w8 = (h // 16) * 16, (w // 8) * 8  # pallas path geometry
    gray = gray[:h8, :w8]
    assert pallas_ok_for(h8, w8)
    ref = np.asarray(clahe_equalize(gray)).astype(np.int32)
    out = np.asarray(
        clahe_equalize_pallas(jnp.asarray(gray[None]), interpret=True)[0]
    ).astype(np.int32)
    diff = np.abs(ref - out)
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_clahe_pallas_histogram_exact():
    from opencv_traffic_sign_detector_tpu.ops.clahe import _tile_histograms
    from opencv_traffic_sign_detector_tpu.ops.clahe_pallas import (
        tile_histograms_pallas,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 256, (2, 64, 128), np.uint8))
    ref = np.asarray(_tile_histograms(x, 8))
    out = np.asarray(tile_histograms_pallas(x, 8, interpret=True))
    np.testing.assert_array_equal(ref, out)


@pytest.mark.slow  # full-frame oracle, ~20-95 s on CPU
def test_enhance_contrast_close_to_opencv(frame):
    cv2 = require_cv2()
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    eq = cv2.createCLAHE(clipLimit=2).apply(gray)
    blur = cv2.GaussianBlur(eq, (3, 3), 0)
    table = np.array([((i / 255) ** 0.5) * 255 for i in range(256)], np.uint8)
    theirs = cv2.LUT(blur, table).astype(np.int32)
    ours = np.asarray(enhance_contrast(frame)).astype(np.int32)
    diff = np.abs(ours - theirs)
    # A +-1 CLAHE rounding difference passes through the gamma LUT, whose
    # slope reaches ~8 near black, so rare pixels can differ by a few counts.
    assert diff.max() <= 8
    assert (diff == 0).mean() > 0.99
    assert (diff <= 1).mean() > 0.9999


def test_batched_shapes(random_bgr):
    batch = np.stack([random_bgr] * 3)
    assert np.asarray(bgr_to_hsv(batch)).shape == (3, 64, 64, 3)
    gray = np.asarray(bgr_to_gray(batch))
    assert gray.shape == (3, 64, 64)
    assert np.asarray(clahe_equalize(gray)).shape == (3, 64, 64)
    assert np.asarray(gaussian_blur_3x3(gray)).shape == (3, 64, 64)


def test_hsv_div_arithmetic_matches_tables():
    """The inline f32-division HSV constants must equal the OpenCV
    fixed-point tables for every possible uint8 input (the gather-free
    reformulation's exactness proof, ops/color.py)."""
    import numpy as np

    from opencv_traffic_sign_detector_tpu.ops.color import (
        _HSV_SHIFT,
        _hdiv_table,
        _sdiv_table,
    )

    x = np.arange(256, dtype=np.float32)
    sdiv = np.where(
        x > 0, np.rint(float(255 << _HSV_SHIFT) / np.maximum(x, 1.0)), 0.0
    ).astype(np.int32)
    hdiv = np.where(
        x > 0,
        np.rint((float(180 << _HSV_SHIFT) / 6.0) / np.maximum(x, 1.0)),
        0.0,
    ).astype(np.int32)
    np.testing.assert_array_equal(sdiv, _sdiv_table())
    np.testing.assert_array_equal(hdiv, _hdiv_table())
