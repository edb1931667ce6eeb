"""Native C++ preprocessing: parity with the numpy pipeline + speed sanity."""

import time

import numpy as np
import pytest

from l4p_tpu.native import lib as nat
from l4p_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD, _resize_chw

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def built():
    lib = nat.get_lib()
    if lib is None:
        pytest.skip("native library failed to build")
    return lib


def test_normalize_parity(built):
    frames = RNG.integers(0, 255, (6, 32, 48, 3), np.uint8)
    out = nat.normalize_video(frames, IMAGENET_MEAN, IMAGENET_STD)
    ref = (frames.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    ref = ref.transpose(3, 0, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_resize_parity(built, mode):
    x = RNG.standard_normal((2, 5, 40, 56)).astype(np.float32)
    out = nat.resize_planes(x, (28, 28), mode)
    ref = _resize_chw(x, (28, 28), "trilinear" if mode == "bilinear" else "nearest")
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_mirror_pad_parity(built):
    x = RNG.standard_normal((3, 5, 8, 8)).astype(np.float32)
    out = nat.mirror_pad_time(x)
    ref = np.concatenate([x, np.flip(x, 1)[:, 1:]], 1)
    np.testing.assert_array_equal(out, ref)


def test_native_faster_than_numpy(built):
    """224x224x192-frame normalize: the native path should beat numpy."""
    frames = RNG.integers(0, 255, (192, 224, 224, 3), np.uint8)

    t0 = time.time()
    for _ in range(3):
        nat.normalize_video(frames, IMAGENET_MEAN, IMAGENET_STD)
    t_nat = (time.time() - t0) / 3

    t0 = time.time()
    for _ in range(3):
        x = frames.astype(np.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        np.ascontiguousarray(x.transpose(3, 0, 1, 2))
    t_np = (time.time() - t0) / 3
    print(f"native {t_nat*1000:.0f}ms vs numpy {t_np*1000:.0f}ms")
    assert t_nat < t_np
