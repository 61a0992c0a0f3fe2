"""I/O tests: native iio_lite (when built) + Python fallbacks.

Round-trips per format, cross-reads against PIL/imageio, and reads of
the reference's own outputs (float TIFF written by iio).
"""
import os
import subprocess

import numpy as np
import pytest

from mgm_tpu import io as mio

HAVE_NATIVE = mio._native() is not None
REF_DATA = "/tmp/mgm_ref/data"


def rand_img(rng, C, lo=0, hi=255):
    return rng.uniform(lo, hi, (13, 17, C)).astype(np.float32)


@pytest.mark.parametrize("C", [1, 3])
def test_float_tiff_roundtrip(tmp_path, rng, C):
    img = rand_img(rng, C, -1000, 1000)
    p = str(tmp_path / "x.tif")
    mio.write_image(p, img)
    np.testing.assert_array_equal(mio.read_image(p), img)


@pytest.mark.parametrize("C", [1, 3])
def test_pfm_roundtrip(tmp_path, rng, C):
    img = rand_img(rng, C, -10, 10)
    p = str(tmp_path / "x.pfm")
    mio.write_image(p, img)
    np.testing.assert_array_equal(mio.read_image(p), img)


@pytest.mark.parametrize("C", [1, 3])
def test_png_roundtrip(tmp_path, rng, C):
    img = np.round(rand_img(rng, C))
    p = str(tmp_path / "x.png")
    mio.write_image(p, img)
    np.testing.assert_array_equal(mio.read_image(p), img)


def test_npy_roundtrip(tmp_path, rng):
    img = rand_img(rng, 2)
    p = str(tmp_path / "x.npy")
    mio.write_image(p, img)
    np.testing.assert_array_equal(mio.read_image(p), img)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib not built")
@pytest.mark.parametrize("fname", ["fountain23-imL.png", "rectified_ref.tif"])
@pytest.mark.skipif(not os.path.exists(REF_DATA), reason="no reference data")
def test_native_matches_python_readers(fname):
    """Native reader == the Python fallback readers on the bundled data."""
    path = f"{REF_DATA}/{fname}"
    native = mio._native_read(path)
    assert native is not None
    if fname.endswith(".png"):
        from PIL import Image

        with Image.open(path) as im:
            ref = np.asarray(im, np.float32)
    else:
        import imageio.v3 as iio3

        ref = np.asarray(iio3.imread(path), np.float32)
    if ref.ndim == 2:
        ref = ref[:, :, None]
    np.testing.assert_array_equal(native, ref)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib not built")
def test_native_reads_reference_float_tiff(tmp_path, rng):
    """Read a float TIFF written by the reference's iio."""
    if not os.path.exists("/tmp/mgm_ref/mgm"):
        pytest.skip("reference binary not built")
    u = mio.read_image(f"{REF_DATA}/fountain23-imL.png")[200:232, 300:348]
    v = mio.read_image(f"{REF_DATA}/fountain23-imR.png")[200:232, 300:348]
    mio.write_image(str(tmp_path / "u.png"), u)
    mio.write_image(str(tmp_path / "v.png"), v)
    env = {**os.environ, "TESTLRRL": "0", "TSGM": "2"}
    subprocess.run(["/tmp/mgm_ref/mgm", "-r", "-8", "-R", "2",
                    str(tmp_path / "u.png"), str(tmp_path / "v.png"),
                    str(tmp_path / "d.tif")], check=True, env=env,
                   capture_output=True)
    d = mio._native_read(str(tmp_path / "d.tif"))
    assert d is not None and d.shape == (32, 48, 1)
    assert np.isfinite(d).any()


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib not built")
def test_native_pnm(tmp_path, rng):
    img = np.round(rand_img(rng, 1)).astype(np.uint8)
    p = str(tmp_path / "x.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n# comment\n17 13\n255\n")
        f.write(img[:, :, 0].tobytes())
    got = mio.read_image(p)
    np.testing.assert_array_equal(got[:, :, 0], img[:, :, 0].astype(np.float32))


def test_ascii_formats_roundtrip(tmp_path):
    """iio's built-in ascii formats: ASC (w h 1 c header) and
    CSV/DLM single-plane matrices."""
    img = np.arange(24, dtype=np.float32).reshape(3, 4, 2) * 0.5
    p = str(tmp_path / "x.asc")
    mio.write_image(p, img)
    np.testing.assert_allclose(mio.read_image(p), img, rtol=1e-6)
    flat = img[:, :, :1]
    for ext in ("csv", "dlm"):
        p = str(tmp_path / f"x.{ext}")
        mio.write_image(p, flat)
        np.testing.assert_allclose(mio.read_image(p), flat, rtol=1e-6)
