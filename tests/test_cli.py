"""CLI compatibility tests: our front-ends vs the reference binaries."""
import os
import subprocess
import sys

import numpy as np
import pytest

from mgm_tpu.io import read_image, write_image

REF_BIN = "/tmp/mgm_ref/mgm"
REF_MGM_O = "/tmp/mgm_ref/matlab/mgm_o"
REF_DATA = "/tmp/mgm_ref/data"

ENV = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"}


def run_ours(module, args, env=None):
    e = dict(os.environ)
    e.update(ENV)
    e.update({k: str(v) for k, v in (env or {}).items()})
    r = subprocess.run([sys.executable, "-m", module] + [str(a) for a in args],
                       env=e, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return r


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="reference not built")
def test_stereo_cli_matches_reference(tmp_path):
    u = read_image(f"{REF_DATA}/fountain23-imL.png")[220:252, 320:368]
    v = read_image(f"{REF_DATA}/fountain23-imR.png")[220:252, 320:368]
    write_image(str(tmp_path / "u.png"), u)
    write_image(str(tmp_path / "v.png"), v)
    args = ["-r", -10, "-R", 3, "-O", 4, "-s", "vfit"]
    env = {"TESTLRRL": 1, "TSGM": 2, "MEDIAN": 1}

    e = dict(os.environ)
    e.update({k: str(v) for k, v in env.items()})
    subprocess.run([REF_BIN] + [str(a) for a in args] +
                   [str(tmp_path / "u.png"), str(tmp_path / "v.png"),
                    str(tmp_path / "ref.tif"), str(tmp_path / "refc.tif"),
                    str(tmp_path / "refb.tif")],
                   check=True, env=e, capture_output=True)
    run_ours("mgm_tpu", args + [str(tmp_path / "u.png"), str(tmp_path / "v.png"),
                                str(tmp_path / "got.tif"),
                                str(tmp_path / "gotc.tif"),
                                str(tmp_path / "gotb.tif")], env)

    dr = read_image(str(tmp_path / "ref.tif"))[..., 0]
    dg = read_image(str(tmp_path / "got.tif"))[..., 0]
    assert np.mean(np.isnan(dr) == np.isnan(dg)) >= 0.98
    both = ~(np.isnan(dr) | np.isnan(dg))
    with np.errstate(invalid="ignore"):
        close = (dr[both] == dg[both]) | (np.abs(dr[both] - dg[both]) <= 0.125)
    assert np.mean(close) >= 0.98
    br = read_image(str(tmp_path / "refb.tif"))
    bg = read_image(str(tmp_path / "gotb.tif"))
    assert np.mean(np.isclose(br, bg, atol=1.0)) >= 0.97


@pytest.mark.skipif(not os.path.exists(REF_MGM_O), reason="mgm_o not built")
@pytest.mark.parametrize("mgm,vtype", [(2, 0), (4, 1), (1, 0)])
def test_mrf_cli_matches_mgm_o(tmp_path, rng, mgm, vtype):
    ncol, nrow, nlab, ndir = 13, 9, 7, 8
    unary = rng.uniform(0, 40, (nlab, nrow, ncol)).astype(np.float32)
    w8 = np.where(rng.random((8, nrow, ncol)) < 0.4, 0.5, 1.0).astype(np.float32)
    with open(tmp_path / "in.bin", "wb") as f:
        np.asarray([ncol, nrow, nlab, ndir], np.int32).tofile(f)
        unary.tofile(f)
        w8.tofile(f)

    subprocess.run([REF_MGM_O, str(tmp_path / "in.bin"),
                    str(tmp_path / "ref.bin"), "8", "32", str(mgm), str(vtype)],
                   check=True, capture_output=True,
                   env={**os.environ, "OMP_NUM_THREADS": "1"})
    run_ours("mgm_tpu.mrf_cli", [tmp_path / "in.bin", tmp_path / "got.bin",
                                 8, 32, mgm, vtype])

    ref = np.fromfile(tmp_path / "ref.bin", np.float32)
    got = np.fromfile(tmp_path / "got.bin", np.float32)
    assert ref.shape == got.shape
    assert np.mean(ref == got) >= 0.97  # integer labels; ties may differ


def test_stereo_cli_help():
    r = run_ours("mgm_tpu", ["--help"])
    assert "disparity" in r.stdout.lower()
