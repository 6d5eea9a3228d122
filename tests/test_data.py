"""Data layer tests: NIfTI I/O round trips, read() semantics, HU transfer."""

import numpy as np
import pytest

from diffdrr_tpu import nifti
from diffdrr_tpu.data import (
    Image,
    Subject,
    read,
    load_example_ct,
    transform_hu_to_density,
    resample_subject,
)


def test_nifti_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(-1000, 2000, (17, 13, 9)).astype(np.int16)
    affine = np.array(
        [[0.7, 0, 0, -5.0], [0, 0.7, 0, -4.0], [0, 0, 2.5, -10.0], [0, 0, 0, 1]]
    )
    for name in ["vol.nii", "vol.nii.gz"]:
        path = tmp_path / name
        nifti.save(path, data, affine)
        back, aff_back = nifti.load(path)
        np.testing.assert_array_equal(back, data)
        np.testing.assert_allclose(aff_back, affine, atol=1e-5)


def test_orientation_utils():
    affine = np.diag([1.0, 1.0, 1.0, 1.0])
    assert nifti.aff2axcodes(affine) == ("R", "A", "S")
    lps = np.diag([-1.0, -1.0, 1.0, 1.0])
    assert nifti.aff2axcodes(lps) == ("L", "P", "S")
    # Reorient LPS data into RAS and back.
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(4, 5, 6))
    tf = nifti.ornt_transform(
        nifti.axcodes2ornt(("L", "P", "S")), nifti.axcodes2ornt(("R", "A", "S"))
    )
    out = nifti.apply_orientation(arr, tf)
    np.testing.assert_allclose(out, arr[::-1, ::-1, :])


def test_hu_to_density_segments():
    vol = np.array([[-1000.0, -900.0], [-100.0, 200.0], [400.0, 1500.0]],
                   np.float32)[..., None]
    d = transform_hu_to_density(vol, bone_attenuation_multiplier=2.0)
    assert d.min() == 0.0 and d.max() == 1.0
    # Air mapped to the soft-tissue minimum; bone doubled before normalize.
    flat = d.ravel()
    assert flat[0] == flat[1]  # both air -> same value
    assert flat[5] == 1.0  # densest bone is the max


def test_read_from_files(tmp_path):
    rng = np.random.default_rng(2)
    hu = rng.integers(-1000, 1500, (16, 14, 10)).astype(np.int16)
    labels = (rng.integers(0, 3, (16, 14, 10))).astype(np.int16)
    affine = np.diag([1.0, 1.0, 2.0, 1.0])
    vol_path = tmp_path / "ct.nii.gz"
    lab_path = tmp_path / "mask.nii.gz"
    nifti.save(vol_path, hu, affine)
    nifti.save(lab_path, labels, affine)

    subject = read(vol_path, lab_path, orientation="AP")
    assert subject.volume.data.shape == (16, 14, 10)
    assert subject.mask is not None
    assert subject.density.data.min() >= 0 and subject.density.data.max() <= 1
    # Isocenter centering: volume center lands at the world origin.
    np.testing.assert_allclose(subject.volume.get_center(), 0.0, atol=1e-6)
    # AP reorientation matrix as in the reference (data.py:87-97).
    np.testing.assert_array_equal(
        subject.reorient,
        np.array([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]]),
    )


def test_read_label_subset(tmp_path):
    rng = np.random.default_rng(3)
    hu = rng.integers(0, 300, (8, 8, 8)).astype(np.int16)
    labels = np.zeros((8, 8, 8), np.int16)
    labels[2:4] = 1
    labels[5:7] = 2
    affine = np.eye(4)
    vol_path = tmp_path / "ct.nii.gz"
    lab_path = tmp_path / "mask.nii.gz"
    nifti.save(vol_path, hu, affine)
    nifti.save(lab_path, labels, affine)
    subject = read(vol_path, lab_path, labels=1, orientation=None)
    # Everything outside label 1 is zeroed.
    assert (subject.density.data[5:7] == 0).all()
    assert (subject.density.data[2:4] > 0).any()


def test_pa_and_none_orientation():
    sub_pa = load_example_ct(shape=(16, 16, 8), orientation="PA")
    np.testing.assert_array_equal(
        sub_pa.reorient,
        np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]]),
    )
    sub_none = load_example_ct(shape=(16, 16, 8), orientation=None)
    np.testing.assert_array_equal(sub_none.reorient, np.eye(4))
    with pytest.raises(ValueError):
        load_example_ct(shape=(16, 16, 8), orientation="XX")


def test_resample(tmp_path):
    sub = load_example_ct(shape=(32, 32, 16))
    before = sub.volume.spacing.copy()
    sub2 = resample_subject(sub, float(before.max()))
    np.testing.assert_allclose(sub2.volume.spacing, before.max(), atol=1e-6)
    assert sub2.mask.data.dtype == sub.mask.data.dtype


def test_fiducials_follow_canonicalization():
    sub = load_example_ct(shape=(32, 32, 16))
    assert sub.fiducials is not None
    # Fiducials were given in pre-centering world coords near the volume
    # center; after centering they sit near the origin.
    assert np.abs(np.asarray(sub.fiducials)).max() < 50.0


def test_example_ct_structures():
    sub = load_example_ct(shape=(32, 32, 16))
    assert sub.structures is not None
    assert {"id", "name"} <= set(sub.structures.columns)
    assert int(np.asarray(sub.mask.data).max()) <= int(sub.structures["id"].max())


def test_native_hu_transfer_matches_numpy():
    """Fused C++ HU->density (native/nifti_loader.cpp) == NumPy reference."""
    import diffdrr_tpu.data as data_mod
    from diffdrr_tpu.data import _hu_to_density_native, transform_hu_to_density
    from diffdrr_tpu.native import native_available

    if not native_available("nifti_loader"):
        pytest.skip("no native loader (g++/zlib unavailable)")
    rng = np.random.default_rng(3)
    for dtype in (np.int16, np.float32):
        hu = rng.uniform(-1200, 2200, (48, 48, 17)).astype(dtype)
        native = _hu_to_density_native(hu, 1.7)
        orig = data_mod._hu_to_density_native
        data_mod._hu_to_density_native = lambda *a: None
        try:
            ref = transform_hu_to_density(hu, 1.7)
        finally:
            data_mod._hu_to_density_native = orig
        np.testing.assert_allclose(native, ref, atol=1e-6)
    # All-air edge case (no soft-tissue voxels).
    hu = np.full((8, 8, 8), -1000.0, np.float32)
    assert np.allclose(_hu_to_density_native(hu, 1.0), 0.0)


def test_native_gunzip_matches_gzip():
    """zlib-inflate decode path (incl. multi-member streams) == gzip module."""
    import gzip as gz

    from diffdrr_tpu.nifti import _gunzip_native
    from diffdrr_tpu.native import native_available

    if not native_available("nifti_loader"):
        pytest.skip("no native loader (g++/zlib unavailable)")
    rng = np.random.default_rng(4)
    payload = rng.bytes(500_000)
    assert _gunzip_native(gz.compress(payload)) == payload
    multi = gz.compress(payload[:1000]) + gz.compress(payload[1000:3000])
    assert _gunzip_native(multi) == payload[:3000]
    # Truncated stream reports failure (caller falls back to gzip module).
    assert _gunzip_native(gz.compress(payload)[:100]) is None


def test_read_label_subset_mismatched_orientations(tmp_path):
    """Volume in RAS, labelmap saved in LPS: the label test on the volume
    must use the REORIENTED mask, and the stored labelmap must be masked in
    ITS OWN frame (regression: the volume-frame keep was applied to the
    unreoriented mask, zeroing the wrong voxels)."""
    rng = np.random.default_rng(5)
    hu = rng.integers(0, 300, (8, 8, 8)).astype(np.int16)
    hu[1, 0, 3] = 1200  # the kept voxel must have nonzero density
    labels = np.zeros((8, 8, 8), np.int16)
    labels[6, 7, 3] = 1  # one labeled voxel, off-center so flips matter
    affine = np.eye(4)
    lps = np.diag([-1.0, -1.0, 1.0, 1.0])  # flip x and y
    lps[:3, 3] = [7.0, 7.0, 0.0]
    vol_path = tmp_path / "ct.nii.gz"
    lab_path = tmp_path / "mask.nii.gz"
    nifti.save(vol_path, hu, affine)
    nifti.save(lab_path, labels, lps)
    subject = read(vol_path, lab_path, labels=1, orientation=None,
                   center_volume=False)
    # Volume frame: LPS (6,7,3) maps to world/RAS (1,0,3).
    assert (subject.density.data > 0).sum() == 1
    assert subject.density.data[1, 0, 3] > 0
    # The stored labelmap keeps its own frame: exactly its labeled voxel.
    assert (subject.mask.data != 0).sum() == 1
    assert subject.mask.data[6, 7, 3] == 1


def test_read_labels_without_mask_raises(tmp_path):
    hu = np.zeros((4, 4, 4), np.int16)
    p = tmp_path / "ct.nii.gz"
    nifti.save(p, hu, np.eye(4))
    with pytest.raises(ValueError, match="labelmap"):
        read(p, labels=1, orientation=None)


def test_nifti_nan_scl_slope_ignored(tmp_path):
    """NaN scl_slope/inter mean 'unset' (nibabel semantics) — the volume
    must load unscaled, not as all-NaN."""
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = tmp_path / "v.nii"
    nifti.save(path, data, np.eye(4))
    raw = bytearray(path.read_bytes())
    import struct
    struct.pack_into("<2f", raw, 112, np.nan, np.nan)  # scl_slope, scl_inter
    path.write_bytes(bytes(raw))
    vol, affine = nifti.load(path)
    np.testing.assert_array_equal(np.asarray(vol), data)


def test_nifti_pair_magic_rejected(tmp_path):
    """'ni1' (header/image pair) magic must fail loudly — the data lives in
    a separate .img file this single-file reader does not open."""
    data = np.zeros((2, 2, 2), np.int16)
    path = tmp_path / "v.nii"
    nifti.save(path, data, np.eye(4))
    raw = bytearray(path.read_bytes())
    raw[344:348] = b"ni1\x00"
    hdr = tmp_path / "v.hdr"
    hdr.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="pair"):
        nifti.load(hdr)


def test_nifti_zero_slope_stale_inter_ignored(tmp_path):
    """scl_slope == 0 means NO scaling at all — a stale nonzero scl_inter
    must be ignored (spec/nibabel), not applied with slope 1."""
    import struct

    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = tmp_path / "v.nii"
    nifti.save(path, data, np.eye(4))
    raw = bytearray(path.read_bytes())
    struct.pack_into("<2f", raw, 112, 0.0, -1024.0)
    path.write_bytes(bytes(raw))
    vol, _ = nifti.load(path)
    np.testing.assert_array_equal(np.asarray(vol), data)
