"""Census-exact uint16 upload codec (ops/census_codec.py).

The codec's claim is strong — bit-identical pipeline outputs from a
2-byte wire form — so it is tested at three levels: the comparison-
preserving property itself, grouped-encode behaviour on data with
more distinct values than uint16 levels, and end-to-end pipeline
equality on the real satellite pair (BASELINE cfg3's data)."""
import numpy as np
import pytest

from mgm_tpu.models.presets import get_preset
from mgm_tpu.ops import census_codec
from mgm_tpu.stereo import compute_disparity


def _satellite_crop(h=96, w=104):
    from mgm_tpu.io import read_image
    u = read_image("/root/reference/data/rectified_ref.tif")[:h, :w]
    v = read_image("/root/reference/data/rectified_sec.tif")[:h, :w]
    return u, v


def test_eligibility_gates():
    sat = get_preset("satellite")
    assert census_codec.eligible(sat)
    assert census_codec.eligible(get_preset("census_tl"))
    assert not census_codec.eligible(get_preset("fast_ad"))  # ad cost
    assert not census_codec.eligible(get_preset("ncc"))  # value cost
    assert not census_codec.eligible(
        get_preset("sobelx_tl"))  # value prefilter
    assert not census_codec.eligible(get_preset("satellite", a_p2=8.0))


def test_codes_preserve_window_comparisons():
    rng = np.random.default_rng(7)
    img = rng.normal(size=(40, 52, 1)).astype(np.float32)
    img[3, 5, 0] = np.nan  # scrubbed to 0 like the device prep
    codes = census_codec.encode(img, win=5)
    assert codes is not None and codes.dtype == np.uint16
    assert census_codec.verify_codes(img, codes, radius=2)


def test_grouped_encode_when_over_u16():
    """> 65536 distinct values forces the grouped (merged-rank) path;
    the merge must stay comparison-exact.  A random-walk image has the
    structure the codec exploits: window-neighbour differences are
    orders of magnitude larger than the global value spacing."""
    rng = np.random.default_rng(3)
    img = np.cumsum(rng.normal(size=(300, 300)), axis=1)
    img = (img + rng.normal(scale=1e-4, size=img.shape)).astype(
        np.float32)[..., None]
    assert np.unique(img).size > 65536
    codes = census_codec.encode(img, win=3)
    assert codes is not None, "random-walk image must be groupable"
    assert census_codec.verify_codes(img, codes, radius=1)


def test_over_u16_random_data():
    """Even all-distinct random data must either encode exactly or be
    declined — never encode wrong.  (Co-occurrence is sparse — ~8
    partners per value — so grouping usually succeeds even here.)"""
    rng = np.random.default_rng(3)
    img = rng.normal(size=(300, 300, 1)).astype(np.float32)
    assert np.unique(img).size > 65536
    codes = census_codec.encode(img, win=3)
    if codes is not None:
        assert census_codec.verify_codes(img, codes, radius=1)


def test_satellite_fits_u16():
    u, v = _satellite_crop(271, 279)
    for img in (u, v):
        codes = census_codec.encode(img, win=5)
        assert codes is not None
        assert census_codec.verify_codes(img, codes, radius=2)


def test_pipeline_bit_identical_on_satellite(monkeypatch):
    """cfg3-class solve: uint16-coded upload == float32 upload, every
    output bitwise (NaNs included)."""
    u, v = _satellite_crop()
    cfg = get_preset("satellite", test_lr=True)
    monkeypatch.setenv("MGM_TPU_CODEC16", "0")
    raw = compute_disparity(u, v, cfg)
    monkeypatch.setenv("MGM_TPU_CODEC16", "1")
    coded = compute_disparity(u, v, cfg)
    assert raw.keys() == coded.keys()
    for k in raw:
        np.testing.assert_array_equal(raw[k], coded[k], err_msg=k)


def test_pipeline_bit_identical_grouped(monkeypatch):
    """Force the grouped path (distinct values > u16) on a smooth
    synthetic pair and require bitwise-equal pipeline outputs."""
    rng = np.random.default_rng(11)
    base = np.cumsum(rng.normal(size=(120, 600)), axis=1)
    u = (base + rng.normal(scale=1e-3, size=base.shape)).astype(
        np.float32)[..., None]
    v = np.roll(u, 3, axis=1)
    cfg = get_preset("satellite", dmin=-5, dmax=5)
    enc = census_codec.encode(u, win=5)
    if enc is None or np.unique(u).size <= 65536:
        pytest.skip("synthetic pair did not exercise the grouped path")
    monkeypatch.setenv("MGM_TPU_CODEC16", "0")
    raw = compute_disparity(u, v, cfg)
    monkeypatch.setenv("MGM_TPU_CODEC16", "1")
    coded = compute_disparity(u, v, cfg)
    for k in raw:
        np.testing.assert_array_equal(raw[k], coded[k], err_msg=k)


def test_fetch_buf_chunked_bit_exact():
    """_fetch_buf reassembles parallel chunk fetches verbatim."""
    import jax.numpy as jnp

    from mgm_tpu.stereo import _fetch_buf
    rng = np.random.default_rng(5)
    host = rng.integers(-2**15, 2**15, size=3_000_017).astype(np.int16)
    buf = jnp.asarray(host)
    np.testing.assert_array_equal(_fetch_buf(buf), host)


# ---- integer OUTPUT codec (stereo._pack_spec and friends) ----------------

def test_pack_spec_gates():
    """The static proof obligations of the integer output codec:
    integer disparities always pack; costs pack ONLY at mgm=1 (AD on
    uint8, integer P1/P2) — at mgm>=2 the /k compounds per front and
    the values leave every fixed-denominator lattice.  Refined,
    weighted, float-image and BT configs must not pack costs."""
    from mgm_tpu.stereo import _pack_spec

    cfg = get_preset("fast_ad", dmin=-120, dmax=30)  # mgm=2, no refine
    assert _pack_spec(cfg, 3, np.uint8, False) == ("int8", False)
    sgm = get_preset("fast_ad", mgm=1)  # plain SGM: ÷k never compounds
    assert _pack_spec(sgm, 3, np.uint8, False) == ("int8", True)
    assert _pack_spec(sgm, 3, np.uint8, True)[1] is False  # weights
    assert _pack_spec(sgm, 3, np.float32, False)[1] is False
    ref = get_preset("fast_ad", mgm=1, refinement="vfit")
    assert _pack_spec(ref, 3, np.uint8, False) == (None, False)
    bt = get_preset("fast_ad", mgm=1, distance="btad")
    assert _pack_spec(bt, 3, np.uint8, False)[1] is False  # half-pixels
    wide = get_preset("fast_ad", dmin=-300, dmax=30)
    assert _pack_spec(wide, 3, np.uint8, False)[0] == "int16"
    frac = get_preset("fast_ad", mgm=1, p1=2.5)  # 2.5*3 not integral
    assert _pack_spec(frac, 3, np.uint8, False)[1] is False
    assert _pack_spec(frac, 2, np.uint8, False)[1] is True  # 2.5*2 = 5


def test_output_codec_bit_identical(monkeypatch):
    """End-to-end equality of the packed-integer output wire form
    against the raw float32 fetch on a fountain23 crop (uint8 images,
    AD, mgm=2: disparities ship as int8, costs as int16 = 4*cost)."""
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import _pack_spec

    u = read_image("/root/reference/data/fountain23-imL.png")[:56, :64]
    v = read_image("/root/reference/data/fountain23-imR.png")[:56, :64]
    u, v = u.astype(np.uint8), v.astype(np.uint8)
    for mgm, want in ((1, ("int8", True)), (2, ("int8", False))):
        cfg = get_preset("fast_ad", dmin=-12, dmax=4, mgm=mgm)
        assert _pack_spec(cfg, 3, np.uint8, False) == want
        monkeypatch.setenv("MGM_TPU_PACKOUT", "0")
        raw = compute_disparity(u, v, cfg)
        monkeypatch.setenv("MGM_TPU_PACKOUT", "1")
        packed = compute_disparity(u, v, cfg)
        assert set(raw) == set(packed)
        for k in raw:
            assert packed[k].dtype == np.float32, k
            np.testing.assert_array_equal(raw[k], packed[k], err_msg=k)
        assert np.isnan(packed["disp"]).any()  # LR invalidations survive


def test_output_codec_batch_bit_identical(monkeypatch):
    """Same equality through compute_disparity_batch (the serving /
    scene-tile path packs in _postprocess_batch)."""
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import compute_disparity_batch

    u = read_image("/root/reference/data/fountain23-imL.png")[:48, :56]
    v = read_image("/root/reference/data/fountain23-imR.png")[:48, :56]
    us = np.stack([u, v]).astype(np.uint8)   # two distinct "pairs"
    vs = np.stack([v, u]).astype(np.uint8)
    cfg = get_preset("fast_ad", dmin=-8, dmax=4)
    # opt the CPU test into the fused batch path (Pallas interpreter)
    # so _postprocess_batch's packing actually runs
    monkeypatch.setenv("MGM_TPU_FUSED", "interpret")
    monkeypatch.setenv("MGM_TPU_PACKOUT", "0")
    raw = compute_disparity_batch(us, vs, cfg)
    monkeypatch.setenv("MGM_TPU_PACKOUT", "1")
    packed = compute_disparity_batch(us, vs, cfg)
    for k in raw:
        assert packed[k].dtype == np.float32, k
        np.testing.assert_array_equal(raw[k], packed[k], err_msg=k)


def test_batch_chunked_streaming_matches(monkeypatch):
    """The VMEM-chunked batch path (K > max_k) with its streamed
    per-chunk fetches must equal the unchunked batch run exactly."""
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import compute_disparity_batch

    u = read_image("/root/reference/data/fountain23-imL.png")[:40, :48]
    v = read_image("/root/reference/data/fountain23-imR.png")[:40, :48]
    us = np.stack([u, v, u]).astype(np.uint8)
    vs = np.stack([v, u, v]).astype(np.uint8)
    cfg = get_preset("fast_ad", dmin=-6, dmax=3)
    monkeypatch.setenv("MGM_TPU_FUSED", "interpret")
    whole = compute_disparity_batch(us, vs, cfg)
    monkeypatch.setenv("MGM_TPU_BATCH_K", "2")  # force 2 chunks + pad
    chunked = compute_disparity_batch(us, vs, cfg)
    for k in whole:
        assert chunked[k].dtype == np.float32, k
        np.testing.assert_array_equal(whole[k], chunked[k], err_msg=k)
