"""Native C++ components: NIfTI reader + resize kernels vs Python references.

Skipped gracefully when the toolchain is unavailable (the framework never
hard-depends on the native build)."""

import numpy as np
import pytest

from micformer_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_reader_parity_f32(tmp_path, rng):
    from micformer_tpu.data.nifti import write_nifti, _parse_header, _open_maybe_gzip

    vol = (rng.normal(size=(33, 47, 21)) * 50).astype(np.float32)
    p = str(tmp_path / "v.nii.gz")
    write_nifti(p, vol)
    out = native.read_nifti_f32(p)
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_reader_parity_int16_uncompressed(tmp_path, rng):
    from micformer_tpu.data.nifti import write_nifti

    vol = (rng.normal(size=(20, 22, 24)) * 300).astype(np.int16)
    p = str(tmp_path / "v.nii")
    write_nifti(p, vol)
    out = native.read_nifti_f32(p)
    np.testing.assert_allclose(out, vol.astype(np.float32), atol=1e-4)


def test_resize_trilinear_parity(rng):
    from micformer_tpu.data.image_utils import _resize_trilinear_py

    vol = rng.normal(size=(30, 40, 25)).astype(np.float32)
    for shp in [(64, 64, 64), (16, 16, 16), (30, 40, 25)]:
        nat = native.resize_trilinear_f32(vol, shp)
        py = _resize_trilinear_py(vol, shp)
        np.testing.assert_allclose(nat, py, atol=1e-3)


def test_resize_nearest_parity(rng):
    from micformer_tpu.data.image_utils import resize_nearest

    vol = rng.normal(size=(33, 47, 21)).astype(np.float32)
    for shp in [(48, 48, 48), (16, 16, 16)]:
        nat = native.resize_nearest_f32(vol, shp)
        py = resize_nearest(vol, shp)
        np.testing.assert_array_equal(nat, py)


def test_read_nifti_dispatches_native(tmp_path, rng):
    """read_nifti must return identical arrays whether or not native is used."""
    from micformer_tpu.data import nifti as nmod

    vol = (rng.normal(size=(18, 19, 20)) * 10).astype(np.float32)
    p = str(tmp_path / "d.nii.gz")
    nmod.write_nifti(p, vol)
    fast = nmod.read_nifti(p, dtype=np.float32)
    # with_header path never uses native
    slow, hdr = nmod.read_nifti(p, with_header=True)
    np.testing.assert_allclose(fast, slow, atol=1e-6)
