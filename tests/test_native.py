"""Native C++ host-ops parity tests vs the numpy implementations."""
import numpy as np
import pytest

from captra_tpu.data import native
from captra_tpu.data.numpy_ops import _fps_numpy


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (no g++?)")
    return lib


def test_native_fps_matches_numpy(lib, rng):
    xyz = rng.randn(500, 3).astype(np.float32)
    got = native.fps(xyz, 64)
    want = _fps_numpy(xyz, 64, np.random)
    np.testing.assert_array_equal(got, want)


def test_native_fps_speed(lib, rng):
    import time
    xyz = rng.randn(20000, 3).astype(np.float32)
    t0 = time.perf_counter()
    native.fps(xyz, 4096)
    dt = time.perf_counter() - t0
    assert dt < 2.0  # numpy loop would take ~10s


def test_native_backproject_matches_oracle(lib, rng):
    from tests.test_preprocess import np_backproject
    depth = rng.randint(0, 2000, (40, 50)).astype(np.uint16)
    K = np.array([[577.5, 0, 24.5], [0, 577.5, 19.5], [0, 0, 1]])
    pts, valid = native.backproject(depth, K)
    o_pts, idxs = np_backproject(depth.astype(np.int32), K)
    flat = idxs[0] * 50 + idxs[1]
    assert valid.sum() == len(o_pts)
    np.testing.assert_allclose(pts[flat], o_pts, rtol=1e-5, atol=1e-6)


def test_native_backproject_mask(lib, rng):
    depth = np.full((10, 10), 1000, np.uint16)
    mask = np.zeros((10, 10), np.uint8)
    mask[2:4, 2:4] = 1
    pts, valid = native.backproject(depth, np.eye(3), mask)
    assert valid.sum() == 4
