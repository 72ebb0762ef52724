"""Native C++ JPEG loader: build + decode parity with the PIL fallback."""

import numpy as np
import pytest

from opencv_traffic_sign_detector_tpu.runtime import loader


@pytest.fixture(scope="module")
def built():
    if not loader.available():
        pytest.skip("native loader toolchain unavailable")
    return True


def test_decode_matches_reference_decoder(built, test_frames_dir):
    cv2 = pytest.importorskip("cv2")
    p = str(test_frames_dir / "00600.jpg")
    ours = loader.decode_jpeg_bgr(p)
    ref = cv2.imread(p)
    assert ours is not None
    np.testing.assert_array_equal(ours, ref)


def test_batch_decode(built, test_frames_dir):
    import os

    files = [
        str(test_frames_dir / f)
        for f in sorted(os.listdir(test_frames_dir))
        if f.endswith(".jpg")
    ][:6]
    batch = loader.decode_jpeg_bgr_batch(files)
    assert batch is not None and len(batch) == 6
    single = loader.decode_jpeg_bgr(files[3])
    np.testing.assert_array_equal(batch[3], single)


def test_probe_size(built, test_frames_dir):
    assert loader.probe_size(str(test_frames_dir / "00600.jpg")) == (800, 1360)


def test_images_module_uses_native_path(built, test_frames_dir):
    from opencv_traffic_sign_detector_tpu.data.images import load_image_bgr

    img = load_image_bgr(str(test_frames_dir / "00600.jpg"))
    assert img.shape == (800, 1360, 3)
