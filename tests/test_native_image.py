"""Native C++ image ops vs PIL reference."""

import numpy as np
import pytest

from vlaser_tpu.image import native
from vlaser_tpu.image.tiling import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_normalize_matches_numpy(lib_ok):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 8, 8, 3), np.uint8)
    got = native.normalize_batch(x)
    want = (x.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_bicubic_close_to_pil(lib_ok):
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 96, 3), np.uint8)
    got = native.resize_batch(img[None], (32, 48), mode="bicubic", normalize=False)[0]
    want = np.asarray(
        Image.fromarray(img).resize((48, 32), Image.BICUBIC), np.float32
    )
    # different but equivalent separable implementations; allow small deviation
    err = np.abs(got - want)
    assert np.median(err) < 1.5
    assert err.mean() < 2.5


def test_resize_lanczos_close_to_pil(lib_ok):
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (100, 80, 3), np.uint8)
    got = native.resize_batch(img[None], (50, 40), mode="lanczos", normalize=False)[0]
    want = np.asarray(
        Image.fromarray(img).resize((40, 50), Image.LANCZOS), np.float32
    )
    err = np.abs(got - want)
    assert np.median(err) < 2.0


def test_identity_resize_exact(lib_ok):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    got = native.resize_batch(img[None], (32, 32), mode="bicubic", normalize=False)[0]
    np.testing.assert_allclose(got, img.astype(np.float32), atol=1e-3)


def test_tile_image(lib_ok):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (64, 128, 3), np.uint8)
    tiles = native.tile_image(img, grid=(2, 1), tile=32)
    assert tiles.shape == (2, 32, 32, 3)
    # tiles must partition the resized image
    resized = native.resize_batch(img[None], (32, 64), "bicubic")[0]
    np.testing.assert_allclose(tiles[0], resized[:, :32], atol=1e-5)
    np.testing.assert_allclose(tiles[1], resized[:, 32:], atol=1e-5)
