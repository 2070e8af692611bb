"""Native C++ preprocessing vs numpy reference (skipped if lib not built)."""

import numpy as np
import pytest

from tokenpacker_tpu.image import native
from tokenpacker_tpu.image.hd_tiler import _fit_into, _resize_bilinear, choose_grid, slice_image

pytestmark = pytest.mark.skipif(not native.available(), reason="libtpp.so not built")


def test_resize_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, 213, 347)).astype(np.float32)
    ref = _resize_bilinear(img, 100, 150)
    got = native.resize_bilinear(img, 100, 150)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_normalize_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    ref = ((img.astype(np.float32) / 255.0 - mean) / std).transpose(2, 0, 1)
    got = native.normalize_u8(img, mean, std)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_hd_slice_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((3, 400, 700)).astype(np.float32)
    ref_crops, hb, wb = slice_image(img, patch_num=9, use_native=False)
    got_crops, hb2, wb2 = slice_image(img, patch_num=9, use_native=True)
    assert (hb, wb) == (hb2, wb2)
    assert ref_crops.shape == got_crops.shape
    np.testing.assert_allclose(got_crops, ref_crops, rtol=2e-4, atol=2e-4)


def test_single_crop_no_global():
    rng = np.random.default_rng(3)
    img = rng.standard_normal((3, 300, 320)).astype(np.float32)
    hb, wb = choose_grid(300, 320, 9)
    crops, hb2, wb2 = slice_image(img, patch_num=9, use_native=True)
    assert crops.shape[0] == hb * wb + (1 if hb * wb > 1 else 0)


def test_native_jpeg_decode_matches_pil(tmp_path):
    import io as _io

    import numpy as np
    import pytest
    from PIL import Image

    from tokenpacker_tpu.image import native
    from tokenpacker_tpu.image.io import load_image

    if not native.jpeg_available():
        pytest.skip("libtpp.so without jpeg support")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (47, 63, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, "JPEG", quality=95)
    ref = np.asarray(Image.open(p).convert("RGB"))
    got = native.decode_jpeg(p.read_bytes())
    assert got.shape == ref.shape
    # libjpeg and PIL (which wraps libjpeg) should agree exactly; allow a
    # tolerance for build-variant IDCT differences
    assert np.mean(np.abs(got.astype(int) - ref.astype(int))) < 1.0

    img = load_image(str(p))
    assert img.size == (63, 47)

    # corrupt data falls back / raises cleanly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        native.decode_jpeg(b"not a jpeg")
    png = tmp_path / "y.png"
    Image.fromarray(arr).save(png)
    assert load_image(str(png)).size == (63, 47)  # non-jpeg via PIL
