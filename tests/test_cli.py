"""CLI driver tests (register + apply round trip through volio NIfTI)."""
import numpy as np
import jax.numpy as jnp
import pytest

from torchregister_tpu.__main__ import main
from torchregister_tpu.ops.resample import warp_affine
from torchregister_tpu.ops.transforms import rigid_theta
from torchregister_tpu.utils.volio import read_volume, write_volume


@pytest.fixture()
def pair(tmp_path):
    rng = np.random.default_rng(0)
    g = np.meshgrid(*[np.linspace(-1, 1, 32)] * 2, indexing="ij")
    vol = sum(
        np.exp(-((g[0] - c0) ** 2 + (g[1] - c1) ** 2) / 0.08)
        for c0, c1 in rng.uniform(-0.4, 0.4, (4, 2))
    ).astype(np.float32)
    moving = jnp.asarray(vol[None, None])
    target = warp_affine(rigid_theta(jnp.asarray([0.08, 0.04, -0.03], jnp.float32))[None], moving)
    mp, tp = str(tmp_path / "m.nii"), str(tmp_path / "t.nii")
    write_volume(mp, vol)
    write_volume(tp, np.asarray(target)[0, 0])
    return mp, tp, tmp_path


def test_cli_register_rigid_and_apply(pair, capsys):
    mp, tp, tmp = pair
    out = str(tmp / "warped.nii")
    trf = str(tmp / "trf.npz")
    rc = main(["register", mp, tp, "--mode", "rigid", "--epochs", "120",
               "--lr", "5e-3", "--criterion", "mse", "-o", out,
               "--save-transform", trf])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "reduction" in msg
    warped = read_volume(out)
    assert warped.shape == (32, 32)

    out2 = str(tmp / "warped2.nii")
    rc = main(["apply", mp, trf, "-o", out2])
    assert rc == 0
    np.testing.assert_allclose(read_volume(out2), warped, atol=1e-5)


def test_cli_register_cascade(pair, capsys):
    mp, tp, tmp = pair
    rc = main(["register", mp, tp, "--mode", "cascade", "--epochs", "40",
               "--levels", "2", "--criterion", "mse",
               "--flow-dtype", "float32"])
    assert rc == 0
    assert "reduction" in capsys.readouterr().out


def test_cli_shape_mismatch_errors(pair, tmp_path):
    mp, tp, tmp = pair
    bad = str(tmp_path / "bad.nii")
    write_volume(bad, np.zeros((16, 16), np.float32))
    with pytest.raises(SystemExit):
        main(["register", mp, bad, "--mode", "rigid"])


def test_cli_register_flow_and_apply_roundtrip(pair, capsys):
    """Flow-mode register must save the field under the "flow" key; apply on
    that file reproduces the register output exactly. Regression: it was
    saved under "theta" and apply crashed trying to use it as a matrix."""
    mp, tp, tmp = pair
    out = str(tmp / "fwarped.nii")
    tr_path = str(tmp / "ft.npz")
    rc = main([
        "register", mp, tp, "--mode", "flow", "--epochs", "6", "--lr", "1e-3",
        "--criterion", "mse", "-o", out, "--save-transform", tr_path,
    ])
    assert rc == 0
    from torchregister_tpu.utils.io import load_pytree

    tr_ = load_pytree(tr_path)
    assert "flow" in tr_ and "theta" not in tr_
    applied = str(tmp / "fapplied.nii")
    assert main(["apply", mp, tr_path, "-o", applied]) == 0
    np.testing.assert_allclose(read_volume(applied), read_volume(out),
                               rtol=1e-6, atol=1e-7)


def test_cli_save_transform_without_npz_suffix(pair):
    """--save-transform without .npz: the CLI must report the real filename
    (np.savez appends the suffix) and apply must work on it."""
    mp, tp, tmp = pair
    trf = str(tmp / "bare_transform")
    rc = main(["register", mp, tp, "--mode", "rigid", "--epochs", "4",
               "--criterion", "mse", "--save-transform", trf])
    assert rc == 0
    import os

    assert os.path.exists(trf + ".npz")
    out = str(tmp / "ap.nii")
    assert main(["apply", mp, trf + ".npz", "-o", out]) == 0


def test_cli_transform_carries_mode_manifest(pair):
    """CLI-written transforms must record 'mode' so load_transform's
    misapply guard works on them (pre-fix they had no manifest)."""
    mp, tp, tmp = pair
    trf = str(tmp / "moded.npz")
    rc = main(["register", mp, tp, "--mode", "rigid", "--epochs", "4",
               "--criterion", "mse", "--save-transform", trf])
    assert rc == 0
    from torchregister_tpu.utils.io import load_pytree

    assert str(load_pytree(trf)["mode"]) == "rigid"


def test_cli_accepts_trailing_singleton_4d(pair, tmp_path):
    """NIfTI volumes stored as (X,Y,1) / (X,Y,Z,1) must be accepted."""
    mp, tp, tmp = pair
    v = read_volume(mp)
    mp4 = str(tmp_path / "m4.nii")
    write_volume(mp4, v[..., None])
    out = str(tmp_path / "w4.nii")
    rc = main(["register", mp4, tp, "--mode", "rigid", "--epochs", "4",
               "--criterion", "mse", "-o", out])
    assert rc == 0
