"""Native volume-IO tests: round-trips through both native and numpy paths."""
import numpy as np
import pytest

from torchregister_tpu.utils import volio


def test_native_lib_builds():
    lib = volio._get_lib()
    # The image ships g++ and zlib; the native path must be available here.
    assert lib is not None


def test_nifti_roundtrip_native(tmp_path):
    vol = np.random.default_rng(0).normal(size=(7, 9, 11)).astype(np.float32)
    p = str(tmp_path / "vol.nii")
    volio.write_volume(p, vol)
    back = volio.read_volume(p)
    assert back.shape == vol.shape
    np.testing.assert_allclose(back, vol, rtol=1e-6)


def test_nifti_roundtrip_numpy_fallback(tmp_path):
    vol = np.random.default_rng(1).normal(size=(5, 6, 4)).astype(np.float32)
    p = str(tmp_path / "vol.nii")
    volio._np_write_nifti(p, vol)
    back = volio._np_read_nifti(p)
    np.testing.assert_allclose(back, vol, rtol=1e-6)


def test_native_and_numpy_readers_agree(tmp_path):
    vol = np.random.default_rng(2).normal(size=(8, 5, 6)).astype(np.float32)
    p = str(tmp_path / "vol.nii")
    volio.write_volume(p, vol)
    np.testing.assert_allclose(volio._np_read_nifti(p), volio.read_volume(p))


def test_gzipped_nifti(tmp_path):
    import gzip

    vol = np.random.default_rng(3).normal(size=(4, 4, 4)).astype(np.float32)
    p = str(tmp_path / "vol.nii")
    volio.write_volume(p, vol)
    gz = str(tmp_path / "vol.nii.gz")
    with open(p, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    np.testing.assert_allclose(volio.read_volume(gz), vol, rtol=1e-6)


def test_load_batch(tmp_path):
    rng = np.random.default_rng(4)
    vols = [rng.normal(size=(6, 7, 8)).astype(np.float32) for _ in range(5)]
    paths = []
    for i, v in enumerate(vols):
        p = str(tmp_path / f"v{i}.nii")
        volio.write_volume(p, v)
        paths.append(p)
    batch = volio.load_batch(paths, (6, 7, 8), nthreads=4)
    assert batch.shape == (5, 6, 7, 8)
    for i, v in enumerate(vols):
        np.testing.assert_allclose(batch[i], v, rtol=1e-6)


def test_normalize_minmax():
    x = (np.random.default_rng(5).normal(size=(64, 64)) * 10 + 3).astype(np.float32)
    y = volio.normalize_minmax_(x.copy())
    assert abs(float(y.min())) < 1e-6
    assert abs(float(y.max()) - 1.0) < 1e-5


def test_int16_nifti_with_scaling(tmp_path):
    # Hand-build an int16 NIfTI with slope/intercept; both readers must scale.
    import struct

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)  # int16
    struct.pack_into("<h", hdr, 72, 16)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<2f", hdr, 112, 2.0, 10.0)  # slope 2, inter 10
    hdr[344:348] = b"n+1\x00"
    p = str(tmp_path / "i16.nii")
    with open(p, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4)
        f.write(np.asfortranarray(data).tobytes(order="F"))
    expected = data.astype(np.float32) * 2 + 10
    np.testing.assert_allclose(volio.read_volume(p), expected)
    np.testing.assert_allclose(volio._np_read_nifti(p), expected)


def test_scl_slope_zero_means_unscaled(tmp_path):
    # NIfTI-1 spec: scl_slope == 0 means "no scaling at all" — a stale
    # nonzero scl_inter must NOT shift intensities (ADVICE r1).
    import struct

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)  # int16
    struct.pack_into("<h", hdr, 72, 16)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<2f", hdr, 112, 0.0, 5.0)  # slope 0, stale inter 5
    hdr[344:348] = b"n+1\x00"
    p = str(tmp_path / "s0.nii")
    with open(p, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4)
        f.write(np.asfortranarray(data).tobytes(order="F"))
    expected = data.astype(np.float32)  # unscaled, unshifted
    np.testing.assert_allclose(volio.read_volume(p), expected)
    np.testing.assert_allclose(volio._np_read_nifti(p), expected)
