"""Native threaded npy/npz loader: correctness vs numpy (skips gracefully to
the numpy fallback when the shared library is not built)."""

import os

import numpy as np
import pytest

from diffphycon_tpu.utils.native_io import (
    load_npy_batch,
    load_npz_batch,
    native_available,
    npy_info,
)


@pytest.fixture()
def files(tmp_path):
    rng = np.random.default_rng(0)
    arrs = [rng.normal(size=(6, 8, 2)).astype(np.float32) for _ in range(5)]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"a{i}.npy"
        np.save(p, a)
        paths.append(str(p))
    return paths, arrs


def test_npy_batch(files):
    paths, arrs = files
    out = load_npy_batch(paths, (6, 8, 2))
    np.testing.assert_array_equal(out, np.stack(arrs))


def test_npy_info(files):
    paths, _ = files
    shape, dtype = npy_info(paths[0])
    assert tuple(shape) == (6, 8, 2)


def test_dtype_conversion(tmp_path):
    rng = np.random.default_rng(1)
    a64 = rng.normal(size=(4, 4)).astype(np.float64)
    a16 = rng.normal(size=(4, 4)).astype(np.float16)
    p64, p16 = tmp_path / "a.npy", tmp_path / "b.npy"
    np.save(p64, a64)
    np.save(p16, a16)
    np.testing.assert_allclose(load_npy_batch([str(p64)], (4, 4))[0],
                               a64.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(load_npy_batch([str(p16)], (4, 4))[0],
                               a16.astype(np.float32), rtol=1e-3)


def test_npz_deflate(tmp_path):
    rng = np.random.default_rng(2)
    arrs = [rng.normal(size=(3, 5)).astype(np.float32) for _ in range(3)]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"z{i}.npz"
        np.savez_compressed(p, a=a, other=np.zeros(2, np.float32))
        paths.append(str(p))
    out = load_npz_batch(paths, "a", (3, 5))
    np.testing.assert_allclose(out, np.stack(arrs), rtol=1e-6)


def test_fortran_order_fallback(tmp_path):
    a = np.asfortranarray(
        np.random.default_rng(3).normal(size=(4, 6)).astype(np.float32))
    p = tmp_path / "f.npy"
    np.save(p, a)
    out = load_npy_batch([str(p)], (4, 6))
    np.testing.assert_array_equal(out[0], a)


def test_truncated_npy_rejected(tmp_path):
    """A header that declares more elements than the payload holds must not
    be heap-over-read by the native loader; it errors out and the numpy
    fallback then raises."""
    a = np.random.default_rng(4).normal(size=(32, 32)).astype(np.float32)
    p = tmp_path / "t.npy"
    np.save(p, a)
    data = p.read_bytes()
    p.write_bytes(data[: len(data) // 2])  # truncate the payload
    with pytest.raises(Exception):
        load_npy_batch([str(p)], (32, 32))
