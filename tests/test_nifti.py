import numpy as np
import pytest

from micformer_tpu.data.nifti import read_nifti, write_nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_roundtrip(tmp_path, suffix, dtype, rng):
    arr = (rng.uniform(0, 100, size=(5, 7, 9))).astype(dtype)
    p = tmp_path / f"vol{suffix}"
    write_nifti(p, arr)
    back = read_nifti(p)
    assert back.shape == arr.shape
    assert back.dtype == dtype
    np.testing.assert_array_equal(back, arr)


def test_orientation_is_zyx(tmp_path):
    # Asymmetric array: value = 100*z + 10*y + x must survive roundtrip exactly,
    # proving the (z,y,x) <-> Fortran (x,y,z) transposes are consistent.
    z, y, x = np.meshgrid(np.arange(3), np.arange(4), np.arange(5), indexing="ij")
    arr = (100 * z + 10 * y + x).astype(np.int16)
    p = tmp_path / "o.nii.gz"
    write_nifti(p, arr)
    np.testing.assert_array_equal(read_nifti(p), arr)


def test_affine_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((4, 4, 4)).astype(np.float32)
    affine = np.diag([1.5, 2.0, 2.5, 1.0])
    affine[:3, 3] = [10, -5, 3]
    p = tmp_path / "a.nii.gz"
    write_nifti(p, arr, affine=affine)
    back, hdr = read_nifti(p, with_header=True)
    np.testing.assert_allclose(hdr.affine, affine, atol=1e-5)
    np.testing.assert_allclose(hdr.pixdim, (1.5, 2.0, 2.5), atol=1e-5)


def test_scl_slope_applied(tmp_path):
    # hand-craft a file with scl_slope via struct patching
    import struct

    arr = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = tmp_path / "s.nii"
    write_nifti(p, arr)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)  # scl_slope
    struct.pack_into("<f", raw, 116, 1.0)  # scl_inter
    p.write_bytes(bytes(raw))
    back = read_nifti(p)
    np.testing.assert_allclose(back, arr * 2.0 + 1.0)
