"""Golden tests for cost volumes, census, prefilters, weights,
refinement and post-processing vs the numpy oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from mgm_tpu.ops.census import census_transform, census_words
from mgm_tpu.ops.cost import build_cost_volume
from mgm_tpu.ops.prefilter import apply_prefilter
from mgm_tpu.ops.refine import subpixel_refine
from mgm_tpu.ops.weights import compute_weights
from mgm_tpu.ops import post

import oracle


def make_pair(rng, H=8, W=11, C=3):
    u = rng.uniform(0, 255, (H, W, C)).astype(np.float32)
    v = rng.uniform(0, 255, (H, W, C)).astype(np.float32)
    return u, v


# ------------------------------------------------------------- census

@pytest.mark.parametrize("winradius,C", [(1, 1), (1, 3), (2, 1), (2, 3)])
def test_census_transform(rng, winradius, C):
    img = rng.uniform(0, 255, (7, 9, C)).astype(np.float32)
    got = np.asarray(census_transform(jnp.asarray(img), winradius))
    want = oracle.census_transform_oracle(img, winradius)
    assert got.shape[-1] == census_words(C, winradius)
    np.testing.assert_array_equal(got, want)


# -------------------------------------------------------- cost volumes

@pytest.mark.parametrize("distance", ["ad", "sd", "btad", "btsd"])
@pytest.mark.parametrize("gmin", [-3, 0])
def test_cost_volume_pointwise(rng, distance, gmin):
    u, v = make_pair(rng)
    H, W, C = u.shape
    L = 5
    lo = np.zeros((H, W), np.int32)
    hi = np.full((H, W), L - 1, np.int32)
    want = oracle.cost_volume_oracle(u, v, lo, hi, gmin, L, distance, np.inf)
    got = np.asarray(build_cost_volume(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(lo), jnp.asarray(hi),
        int(gmin), distance=distance, L=L, trunc_dist=np.inf))
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-5)


def test_cost_volume_truncation_and_oob(rng):
    """Out-of-image q -> truncDist*nch; in-image costs clipped there."""
    u, v = make_pair(rng)
    H, W, C = u.shape
    L, gmin, td = 6, -8, 20.0
    lo = np.zeros((H, W), np.int32)
    hi = np.full((H, W), L - 1, np.int32)
    want = oracle.cost_volume_oracle(u, v, lo, hi, gmin, L, "ad", td)
    got = np.asarray(build_cost_volume(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(lo), jnp.asarray(hi),
        int(gmin), distance="ad", L=L, trunc_dist=td))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-6)


def test_cost_volume_census(rng):
    u, v = make_pair(rng)
    H, W, C = u.shape
    L, gmin = 5, -2
    lo = np.zeros((H, W), np.int32)
    hi = np.full((H, W), L - 1, np.int32)
    cu = oracle.census_transform_oracle(u, 1)
    cv = oracle.census_transform_oracle(v, 1)
    want = oracle.cost_volume_oracle(u, v, lo, hi, gmin, L, "census", np.inf,
                                     census_u=cu, census_v=cv)
    cu_j = census_transform(jnp.asarray(u), 1)
    cv_j = census_transform(jnp.asarray(v), 1)
    got = np.asarray(build_cost_volume(
        cu_j, cv_j, jnp.asarray(lo), jnp.asarray(hi), int(gmin),
        distance="census", L=L, trunc_dist=np.inf))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("win", [3, 5])
def test_cost_volume_ncc(rng, win):
    u, v = make_pair(rng, H=9, W=12)
    H, W, C = u.shape
    L, gmin = 4, -2
    lo = np.zeros((H, W), np.int32)
    hi = np.full((H, W), L - 1, np.int32)
    want = oracle.cost_volume_oracle(u, v, lo, hi, gmin, L, "ncc", np.inf,
                                     ncc_win=win)
    got = np.asarray(build_cost_volume(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(lo), jnp.asarray(hi),
        int(gmin), distance="ncc", L=L, trunc_dist=np.inf, ncc_win=win))
    fin = np.isfinite(want)
    assert np.array_equal(fin, np.isfinite(got))
    np.testing.assert_allclose(got[fin], want[fin], atol=0.05, rtol=1e-4)


def test_cost_volume_all_invalid_rule(rng):
    """A pixel whose whole window is +inf gets all-zero costs
    (mgm_costvolume.h:410-421): forced via trunc_dist=inf and windows
    entirely out of image."""
    u, v = make_pair(rng, W=5)
    H, W, C = u.shape
    L, gmin = 3, -30  # every q out of image -> tmax = inf -> all invalid
    lo = np.zeros((H, W), np.int32)
    hi = np.full((H, W), L - 1, np.int32)
    got = np.asarray(build_cost_volume(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(lo), jnp.asarray(hi),
        int(gmin), distance="ad", L=L, trunc_dist=np.inf))
    np.testing.assert_array_equal(got, np.zeros((H, W, L), np.float32))


# ----------------------------------------------------------- prefilter

def test_sobelx(rng):
    u = rng.uniform(0, 255, (7, 9, 3)).astype(np.float32)
    got = np.asarray(apply_prefilter(jnp.asarray(u), "sobelx"))
    want = oracle.apply_filter_oracle(u, oracle.SOBEL_X)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_gblur(rng):
    u = rng.uniform(0, 255, (7, 9, 1)).astype(np.float32)
    got = np.asarray(apply_prefilter(jnp.asarray(u), "gblur"))
    want = oracle.gblur_oracle(u, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_prefilter_none(rng):
    u = rng.uniform(0, 255, (5, 6, 2)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(apply_prefilter(jnp.asarray(u), "none")), u)


# ------------------------------------------------------------- weights

@pytest.mark.parametrize("aP,thresh", [(0.5, 5.0), (2.0, 10.0)])
def test_weights(rng, aP, thresh):
    u = rng.uniform(0, 20, (6, 8, 3)).astype(np.float32)
    got = np.asarray(compute_weights(jnp.asarray(u), aP, thresh))
    want = oracle.weights_oracle(u, np.float32(aP), np.float32(thresh))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------- refinement

@pytest.mark.parametrize("method", ["vfit", "parabola", "parabolaOCV", "cubic"])
def test_refinement(rng, method):
    H, W, L = 6, 7, 8
    S = rng.uniform(0, 100, (H, W, L)).astype(np.float32)
    s_lo = np.zeros((H, W), np.int32)
    s_hi = np.full((H, W), L - 1, np.int32)
    disp = rng.integers(0, L, (H, W)).astype(np.float32)
    cost = np.take_along_axis(S, disp.astype(np.int64)[..., None], -1)[..., 0]
    want_d, want_c = oracle.refine_oracle(S, disp, cost, s_lo, s_hi, method)
    got_d, got_c = subpixel_refine(
        jnp.asarray(S)[None], jnp.asarray(disp)[None], jnp.asarray(cost)[None],
        jnp.asarray(s_lo)[None], jnp.asarray(s_hi)[None],
        jnp.zeros((1,), jnp.int32), method=method)
    np.testing.assert_allclose(np.asarray(got_d[0]), want_d, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_c[0]), want_c, atol=1e-3)


# ------------------------------------------------------ postprocessing

def test_median_filter(rng):
    d = rng.uniform(-10, 10, (9, 11)).astype(np.float32)
    d[rng.random((9, 11)) < 0.2] = np.nan
    got = np.asarray(post.median_filter(jnp.asarray(d), radius=1))
    want = oracle.median_oracle(d[..., None], 1)[..., 0]
    np.testing.assert_allclose(got, want, equal_nan=True)


def test_lr_check(rng):
    H, W = 6, 10
    dl = rng.integers(-3, 1, (H, W)).astype(np.float32)
    dr = rng.integers(0, 3, (H, W)).astype(np.float32)
    dl[0, 0] = np.nan
    dr[2, 3] = np.nan
    got = np.asarray(post.leftright_test(jnp.asarray(dl), jnp.asarray(dr),
                                         jnp.float32(1.0)))
    want = oracle.lr_oracle(dl, dr, 1.0)
    np.testing.assert_allclose(got, want, equal_nan=True)


def test_update_dmin_dmax(rng):
    H, W = 7, 9
    d = rng.uniform(-20, 20, (H, W)).astype(np.float32)
    d[rng.random((H, W)) < 0.15] = np.nan
    lo = np.full((H, W), -30.0, np.float32)
    hi = np.full((H, W), 30.0, np.float32)
    want_lo, want_hi, _, _ = oracle.update_dmin_dmax_oracle(d, lo, hi)
    got_lo, got_hi, _, _ = post.update_dmin_dmax(
        jnp.asarray(d)[None], jnp.asarray(lo)[None], jnp.asarray(hi)[None])
    np.testing.assert_allclose(np.asarray(got_lo[0]), want_lo, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hi[0]), want_hi, atol=1e-5)


def test_backflow(rng):
    H, W, C = 5, 8, 2
    u = rng.uniform(0, 255, (H, W, C)).astype(np.float32)
    v = rng.uniform(0, 255, (H, W, C)).astype(np.float32)
    d = rng.integers(-2, 3, (H, W)).astype(np.float32)
    d[1, 1] = np.nan
    got = np.asarray(post.backflow(jnp.asarray(d), jnp.asarray(v), jnp.asarray(u)))
    # oracle: syn(p)=v(x+d) truncated toward zero if inside, else u(p)
    want = u.copy()
    for y in range(H):
        for x in range(W):
            t = x + d[y, x]
            if 0 <= t < W:
                want[y, x] = v[y, int(t)]
    np.testing.assert_allclose(got, want)
