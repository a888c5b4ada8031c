"""Tests for the pure-numpy NIfTI-1 reader/writer (multiplanarunet_tpu.io.nifti)."""
import gzip
import struct

import numpy as np
import pytest

from multiplanarunet_tpu.io import nifti


def _roundtrip(tmp_path, arr, affine, name="img.nii.gz"):
    p = tmp_path / name
    nifti.save(arr, p, affine=affine)
    return nifti.load(p)


def test_roundtrip_float32_gz(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.rand(12, 14, 16).astype(np.float32)
    affine = np.diag([1.0, 0.5, 0.1, 1.0])
    img = _roundtrip(tmp_path, arr, affine)
    assert img.shape == (12, 14, 16)
    np.testing.assert_allclose(img.affine, affine, atol=1e-6)
    np.testing.assert_allclose(img.get_fdata(), arr, rtol=1e-6)


def test_roundtrip_uncompressed(tmp_path):
    arr = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    affine = np.eye(4)
    img = _roundtrip(tmp_path, arr, affine, name="img.nii")
    assert img.get_data_dtype() == np.int16
    np.testing.assert_array_equal(img.get_raw_data(), arr)
    out = img.get_fdata()
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, arr)


def test_roundtrip_4d_channels(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.rand(5, 6, 7, 3).astype(np.float32)
    img = _roundtrip(tmp_path, arr, np.eye(4))
    assert img.shape == (5, 6, 7, 3)
    np.testing.assert_allclose(img.get_fdata(), arr, rtol=1e-6)


def test_fortran_order_matches_spec(tmp_path):
    """NIfTI data is stored x-fastest (Fortran order); verify the byte layout."""
    arr = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    p = tmp_path / "f.nii"
    nifti.save(arr, p, affine=np.eye(4))
    raw = p.read_bytes()
    vals = np.frombuffer(raw[352:], dtype=np.float32)
    # First stored element varies x first: arr[0,0,0], arr[1,0,0], arr[0,1,0]...
    assert vals[0] == arr[0, 0, 0]
    assert vals[1] == arr[1, 0, 0]
    assert vals[2] == arr[0, 1, 0]


def test_header_pixdim_and_shape(tmp_path):
    arr = np.zeros((12, 14, 16), np.float32)
    affine = np.diag([1.0, 0.5, 0.1, 1.0])
    img = _roundtrip(tmp_path, arr, affine)
    np.testing.assert_allclose(img.header.pixdim, [1.0, 0.5, 0.1], atol=1e-6)
    assert img.header.shape == (12, 14, 16)


def test_scl_slope_inter_applied(tmp_path):
    arr = np.arange(6, dtype=np.int16).reshape(1, 2, 3)
    p = tmp_path / "scaled.nii"
    nifti.save(arr, p, affine=np.eye(4))
    # Patch in slope=2.0, inter=10.0
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)
    struct.pack_into("<f", raw, 116, 10.0)
    p.write_bytes(bytes(raw))
    img = nifti.load(p)
    np.testing.assert_allclose(img.get_fdata(), arr * 2.0 + 10.0)


def test_qform_affine():
    """A qform header with identity quaternion gives diag(pixdim) + offset."""
    fields = {
        "dim": (3, 4, 5, 6, 1, 1, 1, 1),
        "pixdim": (1.0, 2.0, 3.0, 4.0, 0, 0, 0, 0),
        "datatype": 16,
        "qform_code": 1,
        "sform_code": 0,
        "quatern_b": 0.0,
        "quatern_c": 0.0,
        "quatern_d": 0.0,
        "qoffset_x": 1.0,
        "qoffset_y": -2.0,
        "qoffset_z": 3.0,
    }
    hdr = nifti.NiftiHeader(fields)
    aff = hdr.get_best_affine()
    np.testing.assert_allclose(aff[:3, :3], np.diag([2.0, 3.0, 4.0]))
    np.testing.assert_allclose(aff[:3, 3], [1.0, -2.0, 3.0])


def test_quaternion_tolerance():
    """|q| very slightly above 1 must be tolerated (clamped), like the reference
    relaxing nibabel's quaternion_threshold (mpunet/image/image_pair.py:24)."""
    b = np.sqrt(0.5)
    c = np.sqrt(0.5 + 5e-8)  # |q|^2 = 1 + 5e-8
    fields = {
        "dim": (3, 2, 2, 2, 1, 1, 1, 1),
        "pixdim": (1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0),
        "datatype": 16,
        "qform_code": 1,
        "sform_code": 0,
        "quatern_b": b,
        "quatern_c": c,
        "quatern_d": 0.0,
        "qoffset_x": 0.0,
        "qoffset_y": 0.0,
        "qoffset_z": 0.0,
    }
    aff = nifti.NiftiHeader(fields).get_qform()
    assert np.all(np.isfinite(aff))


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.nii"
    raw = bytearray(348)
    struct.pack_into("<i", raw, 0, 348)
    struct.pack_into("4s", raw, 344, b"XXXX")
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError):
        nifti.load(p)


def test_lazy_load_reads_header_only(tmp_path):
    arr = np.zeros((4, 4, 4), np.float32)
    p = tmp_path / "lazy.nii.gz"
    nifti.save(arr, p, affine=np.eye(4))
    img = nifti.load(p)
    assert img._data is None  # data untouched until requested
    assert img.shape == (4, 4, 4)
    img.get_fdata()
