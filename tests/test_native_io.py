"""Native C++ IO runtime vs the pure-Python implementations."""

import numpy as np
import pytest

from ocean_model_arch_tpu.io import grads, native
from ocean_model_arch_tpu.io.mask_io import write_mask


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


def test_native_mask_matches_python(tmp_path, lib):
    rng = np.random.RandomState(0)
    mask = (rng.rand(37, 23) < 0.4).astype(np.int32)
    p = str(tmp_path / "m.txt")
    write_mask(p, mask, "hdr")
    got = native.read_mask(p, 37, 23)
    np.testing.assert_array_equal(got, mask)


def test_native_record_roundtrip(tmp_path, lib):
    nx, ny = 24, 18
    rng = np.random.RandomState(1)
    lu = np.zeros((nx, ny), np.float32)
    lu[2:-2, 2:-2] = (rng.rand(nx - 4, ny - 4) < 0.7)
    f2 = rng.randn(nx, ny)
    p = str(tmp_path / "x.dat")
    # record 3 first: native pre-fills records 1-2 with undef
    assert native.write_record(p, 3, f2, lu, float(grads.UNDEF))
    rec1 = native.read_record(p, 1, (nx - 4) * (ny - 4))
    assert (rec1 == np.float32(grads.UNDEF)).all()
    # python reader agrees with native writer
    back = grads.read_record(p, 3, nx, ny)
    wet = lu > 0.5
    np.testing.assert_allclose(back[wet], f2[wet].astype(np.float32))
    assert (back[~wet] == 0).all()


def test_native_python_writers_agree(tmp_path, lib):
    nx, ny = 30, 26
    rng = np.random.RandomState(2)
    lu = np.zeros((nx, ny), np.float32)
    lu[2:-2, 2:-2] = (rng.rand(nx - 4, ny - 4) < 0.6)
    f = rng.randn(nx, ny)

    p_native = str(tmp_path / "n.dat")
    assert native.write_record(p_native, 1, f, lu, float(grads.UNDEF))

    # force the python fallback
    p_py = str(tmp_path / "p.dat")
    data = grads.interior(f).astype(np.float32)
    wet = grads.interior(lu) > 0.5
    data = np.where(wet, data, grads.UNDEF)
    with open(p_py, "wb") as fh:
        fh.write(data.flatten(order="F").tobytes())

    assert open(p_native, "rb").read() == open(p_py, "rb").read()
