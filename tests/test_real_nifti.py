"""Real-world NIfTI parity: decode the reference's actual TotalSegmentator
labelmap (/root/reference/diffdrr/data/mask.nii.gz — 118 structures, gzip,
uint8, non-trivial quaternion qform with qfac=-1) through the from-scratch
reader in diffdrr_tpu/nifti.py, and drive the structures.csv ingestion +
per-structure channel rendering end to end (reference: diffdrr/data.py:19-38,
140-174).

The oracle is an independent in-test decoder (stdlib gzip + struct on the
NIfTI-1 spec offsets) — deliberately NOT sharing any code with nifti.py's
native-zlib/header path — plus golden values recorded from the file.
"""

import gzip
import struct
from pathlib import Path

import numpy as np
import pytest

from diffdrr_tpu import nifti

MASK = Path("/root/reference/diffdrr/data/mask.nii.gz")
CSV = Path("/root/reference/diffdrr/data/structures.csv")

pytestmark = pytest.mark.skipif(
    not MASK.exists(), reason="reference data files not mounted"
)


def _independent_decode(path):
    """Minimal spec-level NIfTI-1 decoder: gzip + struct, no shared code."""
    raw = gzip.open(path, "rb").read()
    dim = struct.unpack_from("<8h", raw, 40)
    (datatype,) = struct.unpack_from("<h", raw, 70)
    (vox_offset,) = struct.unpack_from("<f", raw, 108)
    srow = np.array(
        [
            struct.unpack_from("<4f", raw, 280),
            struct.unpack_from("<4f", raw, 296),
            struct.unpack_from("<4f", raw, 312),
            (0.0, 0.0, 0.0, 1.0),
        ],
        np.float64,
    )
    assert datatype == 2  # uint8
    shape = dim[1 : 1 + dim[0]]
    data = np.frombuffer(
        raw, np.uint8, count=int(np.prod(shape)), offset=int(vox_offset)
    ).reshape(shape, order="F")
    return data, srow


def test_load_real_mask_bytes_and_affine():
    data, affine = nifti.load(MASK)
    ref_data, ref_affine = _independent_decode(MASK)

    # Golden facts about the file itself.
    assert data.shape == (512, 512, 133)
    assert data.dtype == np.uint8
    assert int(data.max()) == 118
    assert int(data.astype(np.int64).sum()) == 181762220

    # Byte-for-byte agreement with the independent decode.
    assert np.array_equal(np.asarray(data), ref_data)
    np.testing.assert_allclose(affine, ref_affine, atol=1e-6)


def test_qform_quaternion_affine_matches_sform(tmp_path):
    """Force the qform branch (sform_code=0) on the REAL header: the
    quaternion (b,c,d)=(0,1,0) with qfac=-1 must reconstruct the same
    affine the sform rows describe."""
    raw = bytearray(gzip.open(MASK, "rb").read())
    _, sform_affine = _independent_decode(MASK)
    qform_code, sform_code = struct.unpack_from("<2h", raw, 252)
    assert qform_code == 1 and sform_code == 1
    struct.pack_into("<h", raw, 254, 0)  # sform_code = 0 -> qform branch
    p = tmp_path / "qform_only.nii"
    p.write_bytes(bytes(raw))

    data, affine = nifti.load(p)
    assert data.shape == (512, 512, 133)
    np.testing.assert_allclose(affine, sform_affine, atol=1e-4)


def test_orientation_codes_of_real_affine():
    _, affine = nifti.load(MASK)
    # srow diag (-0.70, +0.70, +2.5) => x: R->L, y: P->A, z: I->S.
    assert nifti.aff2axcodes(affine) == ("L", "A", "S")


def test_structures_csv_ingest_and_channel_render():
    import pandas as pd

    import jax.numpy as jnp
    from diffdrr_tpu import DRR
    from diffdrr_tpu.data import Image, read

    structures = pd.read_csv(CSV)
    assert len(structures) == 118
    assert set(structures.columns) >= {"structure", "id"}
    assert structures["id"].max() == 118
    assert (structures["id"] == np.arange(1, 119)).all()

    mask_data, affine = nifti.load(MASK)
    # The CT scan itself is not redistributed with the reference checkout;
    # synthesize HU from the real labelmap (air outside, per-label soft
    # tissue inside) so the whole read() -> DRR -> per-structure channel
    # chain runs on the real-world geometry. The HU values need a RANGE:
    # the reference transfer maps air to the soft-tissue minimum
    # (diffdrr/data.py:214-227), so a single soft value would normalize to
    # a constant-zero density.
    hu = np.where(mask_data > 0, 40.0 + mask_data, -1000.0).astype(np.float32)
    subject = read(
        volume=Image(hu, affine),
        labelmap=Image(mask_data.astype(np.float32), affine),
        orientation="AP",
        structures=structures,
    )
    assert subject.structures is not None
    assert len(subject.structures) == 118

    drr = DRR(subject, sdd=1020.0, height=24, delx=16.0)
    rot = jnp.asarray([[0.0, np.pi / 2, 0.0]], jnp.float32)
    trans = jnp.asarray([[0.0, 850.0, 0.0]], jnp.float32)
    img = drr(rot, trans, parameterization="euler_angles", convention="ZXY",
              mask_to_channels=True)
    assert img.shape == (1, 119, 24, 24)  # labels 0..118 -> 119 channels
    total = drr(rot, trans, parameterization="euler_angles",
                convention="ZXY")
    np.testing.assert_allclose(
        np.asarray(img.sum(axis=1, keepdims=True)), np.asarray(total),
        rtol=2e-4, atol=2e-4,
    )
    # A mid-volume organ the AP view must see: liver (id 5).
    liver = structures.set_index("structure").loc["liver", "id"]
    assert float(img[0, int(liver)].sum()) > 0.0


def test_label_subset_masking_real_mask():
    from diffdrr_tpu.data import Image, read

    mask_data, affine = nifti.load(MASK)
    hu = np.where(mask_data > 0, 40.0 + mask_data, -1000.0).astype(np.float32)
    subject = read(
        volume=Image(hu, affine),
        labelmap=Image(mask_data.astype(np.float32), affine),
        labels=[5],  # liver
        orientation="AP",
    )
    dens = np.asarray(subject.density.data)
    # Density outside the selected label must be zeroed; inside preserved.
    sel = np.asarray(subject.mask.data) > 0
    assert sel.sum() == (mask_data == 5).sum()
    assert (dens[~sel] == 0).all()
    assert dens[sel].mean() > 0
