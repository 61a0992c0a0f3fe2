"""Fused cost+wavefront path vs the dense-volume solver.

mgm_solve_fused computes the cost volume inside the wavefront kernel
(ops/pallas_fused.py); these tests pin it to solver.mgm_solve on the
equivalent dense volume across the config grid, in Pallas interpret
mode on CPU.  Disparity mismatches are accepted only at exact argmin
ties (the overcount fold changes float association by one step).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgm_tpu.ops.fused import mgm_solve_fused, fused_spec, split_passes

_N_RUN = [0]


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    """This module compiles dozens of big interpret-mode programs; the
    XLA CPU compiler has segfaulted under the accumulated live-
    executable state (see conftest), so drop it every few tests."""
    yield
    _N_RUN[0] += 1
    if _N_RUN[0] % 6 == 0:
        jax.clear_caches()
from mgm_tpu.ops.cost import build_cost_volume
from mgm_tpu.solver import mgm_solve


def _compare(rng, H=18, W=29, dmin=-6, dmax=4, ndir=4, mgm=2, mode="ad",
             C=2, use_fh=False, use_weights=False, fix_overcount=True,
             test_lr=True, trunc_dist=float("inf"), p1=8.0, p2=32.0):
    u = rng.uniform(0, 80, (H, W, C)).astype(np.float32)
    v = rng.uniform(0, 80, (H, W, C)).astype(np.float32)
    L = dmax - dmin + 1
    sides = ((dmin, 0, L - 1),)
    if test_lr:
        sides += ((-dmax, 0, L - 1),)
    N = len(sides)
    if mode == "census":
        from mgm_tpu.ops.census import census_transform
        u_p = census_transform(jnp.asarray(u), 1)
        v_p = census_transform(jnp.asarray(v), 1)
    else:
        u_p, v_p = jnp.asarray(u), jnp.asarray(v)
    nch = u_p.shape[2]
    w8 = None
    if use_weights:
        w8 = jnp.asarray(
            np.where(rng.random((N, H, W, 8)) < 0.5, 0.25, 1.0)
            .astype(np.float32))

    lefts, rights = [u_p, v_p][:N], [v_p, u_p][:N]
    lo = jnp.zeros((N, H, W), jnp.int32)
    hi = jnp.full((N, H, W), L - 1, jnp.int32)
    cc = jnp.stack([
        build_cost_volume(lefts[n], rights[n], lo[n], hi[n], g,
                          distance=mode, L=L, trunc_dist=trunc_dist,
                          backend="xla")
        for n, (g, _, _) in enumerate(sides)])
    gmins = jnp.asarray([g for g, _, _ in sides], jnp.int32)
    S0, d0, c0 = mgm_solve(cc, w8, lo, hi, lo, hi, gmins, p1=p1, p2=p2,
                           ndir=ndir, mgm=mgm, use_fh=use_fh,
                           use_weights=use_weights, per_pixel=False,
                           fix_overcount=fix_overcount)
    S1, d1, c1 = mgm_solve_fused(u_p, v_p, w8, lo, hi, sides=sides, L=L,
                                 ndir=ndir, mgm=mgm, p1=p1, p2=p2,
                                 mode=mode, nch=nch,
                                 trunc_dist=trunc_dist, use_fh=use_fh,
                                 use_weights=use_weights,
                                 fix_overcount=fix_overcount,
                                 backend="interpret")
    S0, d0, c0, S1, d1, c1 = map(np.asarray, (S0, d0, c0, S1, d1, c1))

    f0, f1 = np.isfinite(S0), np.isfinite(S1)
    np.testing.assert_array_equal(f0, f1)
    scale = max(1.0, np.abs(S0[f0]).max()) if f0.any() else 1.0
    np.testing.assert_allclose(S1[f0], S0[f0], atol=3e-5 * scale,
                               rtol=1e-5)
    np.testing.assert_allclose(c1, c0, atol=3e-5 * scale, rtol=1e-5,
                               equal_nan=True)
    # disparities equal except at exact argmin ties flipped by the
    # overcount fold's float association
    diff = np.argwhere(d0 != d1)
    for n, y, x in diff:
        la = int(d0[n, y, x]) - sides[n][0]
        lb = int(d1[n, y, x]) - sides[n][0]
        assert abs(S0[n, y, x, la] - S0[n, y, x, lb]) <= 3e-5 * scale, \
            f"non-tie disparity mismatch at {(n, y, x)}"


# Each interpret-mode case costs minutes of XLA CPU compile; the
# default run keeps one case per mechanism (spaces, costs, FH,
# weights, parity, overcount, wide windows) and MGM_TPU_FULL_TESTS=1
# restores the full cross-product matrix.
import os as _os

_FULL = bool(_os.environ.get("MGM_TPU_FULL_TESTS"))

CASES = [
    dict(ndir=1, mgm=1),
    dict(ndir=4, mgm=2),
    dict(ndir=4, mgm=2, mode="census", C=1),
    dict(ndir=8, mgm=4),
    dict(ndir=8, mgm=3),
    dict(ndir=8, mgm=3, use_fh=True, p1=2.0, p2=50.0),
    dict(ndir=4, mgm=2, dmin=-40, dmax=26),   # window wider than image
    # packed parity spaces (mgm=4 passes 2/3/5/7)
    dict(ndir=4, mgm=4),
    dict(ndir=4, mgm=4, mode="census", C=1),
    dict(ndir=8, mgm=4, use_weights=True, use_fh=True),
] + ([
    dict(ndir=4, mgm=2, test_lr=False),
    dict(ndir=4, mgm=2, mode="btad"),
    dict(ndir=8, mgm=2, use_weights=True),
    dict(ndir=8, mgm=3, use_weights=True, use_fh=True),
    dict(ndir=4, mgm=2, trunc_dist=20.0),
    dict(ndir=4, mgm=2, fix_overcount=False),
    dict(ndir=4, mgm=4, use_weights=True),
    dict(ndir=8, mgm=4, use_fh=True, p1=2.0, p2=50.0),
    dict(ndir=4, mgm=4, mode="btad"),
    dict(ndir=4, mgm=4, H=17, W=23, test_lr=False),
    dict(ndir=4, mgm=4, fix_overcount=False),
    dict(ndir=4, mgm=4, dmin=-40, dmax=26),
] if _FULL else [])


@pytest.mark.parametrize("case", CASES,
                         ids=[str(sorted(c.items())) for c in CASES])
def test_fused_matches_dense_solver(rng, case):
    _compare(rng, **case)


WTA_CASES = [
    dict(ndir=1, mgm=1),                      # single space, fwd only
    dict(ndir=2, mgm=2),                      # space A fwd+bwd
    dict(ndir=4, mgm=2),                      # both spaces, slope 1
    dict(ndir=4, mgm=2, mode="census", C=1),
    dict(ndir=4, mgm=3, use_fh=True, p1=2.0, p2=50.0),
    dict(ndir=2, mgm=4),                      # slope 2 (NE dep active)
    dict(ndir=8, mgm=3),                      # A+B+V, three-space sum
    dict(ndir=8, mgm=4),                      # A+B + parity PA+PB
    # L > 128: the WTA kernel's label axis spans two LB=128 blocks
    # (the multi-block running min/argmin fold)
    dict(ndir=8, mgm=4, dmin=-126, dmax=8, H=12, W=21),
    dict(ndir=4, mgm=2, dmin=-126, dmax=8, H=12, W=21),
] + ([
    dict(ndir=4, mgm=2, test_lr=False),
    dict(ndir=4, mgm=3, use_weights=True),
    dict(ndir=4, mgm=2, fix_overcount=False),
    dict(ndir=4, mgm=2, dmin=-40, dmax=26),
    dict(ndir=8, mgm=2, use_fh=True, p1=2.0, p2=50.0),
    dict(ndir=8, mgm=1),                      # slope-1 A+B, all 8 passes
    dict(ndir=4, mgm=4),                      # A + parity PB
    dict(ndir=8, mgm=4, use_weights=True),
    dict(ndir=8, mgm=4, use_fh=True, p1=2.0, p2=50.0),
] if _FULL else [])


@pytest.mark.parametrize("case", WTA_CASES,
                         ids=[str(sorted(c.items())) for c in WTA_CASES])
def test_fused_wta_fast_path(rng, case):
    """want_S=False + const_sw=True runs the fused unskew+WTA assembly
    (no unskewed volume); disp/cost must match the materialised path
    except at exact WTA ties."""
    kw = dict(H=18, W=29, dmin=-6, dmax=4, mode="ad", C=2, use_fh=False,
              use_weights=False, fix_overcount=True, test_lr=True,
              p1=8.0, p2=32.0)
    kw.update(case)
    H, W, dmin, dmax = kw["H"], kw["W"], kw["dmin"], kw["dmax"]
    u = rng.uniform(0, 80, (H, W, kw["C"])).astype(np.float32)
    v = rng.uniform(0, 80, (H, W, kw["C"])).astype(np.float32)
    L = dmax - dmin + 1
    sides = ((dmin, 0, L - 1),)
    if kw["test_lr"]:
        sides += ((-dmax, 0, L - 1),)
    N = len(sides)
    if kw["mode"] == "census":
        from mgm_tpu.ops.census import census_transform
        u_p = census_transform(jnp.asarray(u), 1)
        v_p = census_transform(jnp.asarray(v), 1)
    else:
        u_p, v_p = jnp.asarray(u), jnp.asarray(v)
    w8 = None
    if kw["use_weights"]:
        w8 = jnp.asarray(
            np.where(rng.random((N, H, W, 8)) < 0.5, 0.25, 1.0)
            .astype(np.float32))
    lo = jnp.zeros((N, H, W), jnp.int32)
    hi = jnp.full((N, H, W), L - 1, jnp.int32)
    common = dict(sides=sides, L=L, ndir=kw["ndir"], mgm=kw["mgm"],
                  p1=kw["p1"], p2=kw["p2"], mode=kw["mode"],
                  nch=u_p.shape[2], trunc_dist=float("inf"),
                  use_fh=kw["use_fh"], use_weights=kw["use_weights"],
                  fix_overcount=kw["fix_overcount"], backend="interpret")
    # no leftover passes: the fast gate must actually take the fused
    # WTA branch for every case here
    _, leftover = split_passes(kw["ndir"], kw["mgm"])
    assert not leftover
    S0, d0, c0 = mgm_solve_fused(u_p, v_p, w8, lo, hi, **common)
    S1, d1, c1 = mgm_solve_fused(u_p, v_p, w8, lo, hi, want_S=False,
                                 const_sw=True, **common)
    assert S1 is None
    S0, d0, c0, d1, c1 = map(np.asarray, (S0, d0, c0, d1, c1))
    np.testing.assert_allclose(c1, c0, atol=1e-5, rtol=1e-6,
                               equal_nan=True)
    diff = np.argwhere(d0 != d1)
    for n, y, x in diff:      # only exact WTA ties may flip
        la = int(d0[n, y, x]) - sides[n][0]
        lb = int(d1[n, y, x]) - sides[n][0]
        assert S0[n, y, x, la] == S0[n, y, x, lb], \
            f"non-tie disparity mismatch at {(n, y, x)}"


def test_fused_table():
    """Bidirectional space-assignment coverage per the pass dependency
    sets (mgm_core.cc:463-471): with the slope-0 column-front space V
    and the packed parity spaces PA/PB, every 8-dir pass fuses at every
    mgm; only knight passes fall back."""
    for mgm in (1, 2, 3, 4):
        ok = {p for p in range(8) if fused_spec(p, mgm) is not None}
        assert ok == set(range(8))
    # knight passes never fuse
    assert fused_spec(8, 1) is None
    groups, leftover = split_passes(8, 2)
    assert leftover == []
    assert sum(len(ms) for _, _, ls in groups for _, ms in ls) == 8
    vg = [g for g in groups if g[0] == 0]
    assert len(vg) == 1
    assert {p for _, ms in vg[0][2] for p, *_ in ms} == {5, 7}
    # mgm=1 runs every pass in the skewed group at slope 1
    groups1, leftover1 = split_passes(8, 1)
    assert leftover1 == [] and len(groups1) == 1 and groups1[0][0] == 1
    assert sum(len(ms) for _, ms in groups1[0][2]) == 8
    # mgm=4: passes 2,3,5,7 (vertical 4th dep) go to the parity group
    groups4, leftover4 = split_passes(8, 4)
    assert leftover4 == []
    assert [g[0] for g in groups4] == [2, -1]
    pg = groups4[1]
    assert pg[1] == ["PA", "PB"]
    assert {p for _, ms in pg[2] for p, *_ in ms} == {2, 3, 5, 7}
    # ndir=4, mgm=4 (the reference's DEFAULT config): A + PB only
    groups44, leftover44 = split_passes(4, 4)
    assert leftover44 == []
    assert [(g[0], g[1]) for g in groups44] == [(2, ["A"]), (-1, ["PB"])]


def test_fused_pipeline_deferred_windows_uint8(rng, monkeypatch):
    """compute_disparity with NO refinement/iterations defers the
    constant-window arrays entirely (mgm_solve_fused gets s_lo=None);
    uint8 input images must give the identical result to float32.
    Covers both the fast-WTA (mgm=2) and leftover-mix (mgm=4) fused
    geometries against the dense path."""
    from mgm_tpu.config import MGMConfig
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import compute_disparity

    u = read_image("/root/reference/data/fountain23-imL.png")[200:240,
                                                              300:364]
    v = read_image("/root/reference/data/fountain23-imR.png")[200:240,
                                                              300:364]
    for mgm in (2, 4):
        cfg = MGMConfig(dmin=-20, dmax=6, ndir=4, mgm=mgm, distance="ad",
                        test_lr=True)
        monkeypatch.setenv("MGM_TPU_FUSED", "0")
        a = compute_disparity(u, v, cfg)
        monkeypatch.setenv("MGM_TPU_FUSED", "interpret")
        b = compute_disparity(u.astype(np.uint8), v.astype(np.uint8), cfg)
        for k in a:
            x, y = np.asarray(a[k]), np.asarray(b[k])
            fx, fy = np.isfinite(x), np.isfinite(y)
            np.testing.assert_array_equal(fx, fy, err_msg=f"mgm{mgm} {k}")
            np.testing.assert_allclose(y[fx], x[fx], atol=2e-3,
                                       err_msg=f"mgm{mgm} {k}")


def test_fused_per_pixel_windows(rng, monkeypatch):
    """-m/-M per-pixel disparity windows on the fused path == dense
    path: SGM, census+FH (exercises the in-kernel fh_restrict), and the
    mgm=4 leftover mix."""
    from mgm_tpu.config import MGMConfig
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import compute_disparity

    u = read_image("/root/reference/data/fountain23-imL.png")[200:240,
                                                              300:364]
    v = read_image("/root/reference/data/fountain23-imR.png")[200:240,
                                                              300:364]
    H, W, _ = u.shape
    dmin_img = (-20 + 6 * rng.random((H, W))).astype(np.float32)
    dmax_img = (dmin_img + 4 + 10 * rng.random((H, W))).astype(np.float32)
    dmin_img[5, 5] = np.nan  # NaN windows -> global range (mgm.cc:341)
    cases = [
        MGMConfig(dmin=-20, dmax=6, ndir=4, mgm=2, distance="ad",
                  test_lr=True),
        MGMConfig(dmin=-20, dmax=6, ndir=8, mgm=3, distance="census",
                  prefilter="census", use_trunc_linear=True, p1=2,
                  p2=20000, refinement="vfit", test_lr=True),
        MGMConfig(dmin=-20, dmax=6, ndir=4, mgm=4, distance="ad",
                  test_lr=True),
        # mgm=4 parity spaces with the in-kernel fh_restrict
        MGMConfig(dmin=-20, dmax=6, ndir=8, mgm=4, distance="census",
                  prefilter="census", use_trunc_linear=True, p1=2,
                  p2=20000, refinement="vfit", test_lr=True),
    ]
    for cfg in cases:
        monkeypatch.setenv("MGM_TPU_FUSED", "0")
        a = compute_disparity(u, v, cfg, dmin_img=dmin_img,
                              dmax_img=dmax_img)
        monkeypatch.setenv("MGM_TPU_FUSED", "interpret")
        b = compute_disparity(u, v, cfg, dmin_img=dmin_img,
                              dmax_img=dmax_img)
        for k in a:
            x, y = np.asarray(a[k]), np.asarray(b[k])
            fx, fy = np.isfinite(x), np.isfinite(y)
            np.testing.assert_array_equal(fx, fy,
                                          err_msg=f"mgm{cfg.mgm} {k}")
            # fused planes and dense groups sum the per-pass volumes in
            # a different order; the float-epsilon S difference can
            # shift a near-tie vfit by ~0.01 px on isolated pixels
            d = np.abs(y[fx] - x[fx])
            tol = 2e-3 + 1e-5 * np.abs(x[fx])
            frac = (d > tol).mean()
            assert frac <= 0.005 and (d.max() if d.size else 0) <= 0.26, \
                f"mgm{cfg.mgm} {k}: frac={frac} max={d.max()}"


def test_fused_full_pipeline_crop(rng, monkeypatch):
    """compute_disparity end-to-end: fused (interpret) == default path
    on a real image crop, cfg2-style config."""
    from mgm_tpu.config import MGMConfig
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import compute_disparity

    u = read_image("/root/reference/data/fountain23-imL.png")[200:248,
                                                              300:372]
    v = read_image("/root/reference/data/fountain23-imR.png")[200:248,
                                                              300:372]
    cfg = MGMConfig(dmin=-30, dmax=6, ndir=8, mgm=3, distance="census",
                    prefilter="census", use_trunc_linear=True, p1=2,
                    p2=20000, refinement="vfit", median_radius=1,
                    test_lr=True)
    monkeypatch.setenv("MGM_TPU_FUSED", "0")
    a = compute_disparity(u, v, cfg)
    monkeypatch.setenv("MGM_TPU_FUSED", "interpret")
    b = compute_disparity(u, v, cfg)
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        fx, fy = np.isfinite(x), np.isfinite(y)
        np.testing.assert_array_equal(fx, fy, err_msg=k)
        np.testing.assert_allclose(y[fx], x[fx], atol=2e-3, err_msg=k)


def test_fused_dense_fold_escape_hatch(rng, monkeypatch):
    """MGM_TPU_FOLD=dense (the miscompile escape hatch) folds the
    overcount term on a materialised CC for groups-only configs and
    must match the default path."""
    import jax
    from mgm_tpu.config import MGMConfig
    from mgm_tpu.io import read_image
    from mgm_tpu.stereo import compute_disparity

    u = read_image("/root/reference/data/fountain23-imL.png")[200:240,
                                                              300:364]
    v = read_image("/root/reference/data/fountain23-imR.png")[200:240,
                                                              300:364]
    cfg = MGMConfig(dmin=-20, dmax=6, ndir=8, mgm=3, distance="ad",
                    test_lr=True)
    monkeypatch.setenv("MGM_TPU_FUSED", "0")
    a = compute_disparity(u, v, cfg)
    monkeypatch.setenv("MGM_TPU_FUSED", "interpret")
    monkeypatch.setenv("MGM_TPU_FOLD", "dense")
    jax.clear_caches()  # the fold mode is read at trace time
    try:
        b = compute_disparity(u, v, cfg)
    finally:
        jax.clear_caches()
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        fx, fy = np.isfinite(x), np.isfinite(y)
        np.testing.assert_array_equal(fx, fy, err_msg=k)
        np.testing.assert_allclose(y[fx], x[fx], atol=2e-3, rtol=1e-5,
                                   err_msg=k)


def test_batched_pairs_match_single(rng, monkeypatch):
    """compute_disparity_batch solves K pairs in one launch set; each
    pair must equal its individual compute_disparity solve bitwise
    (the fused kernels batch over the plane axis, so per-plane math is
    identical)."""
    from mgm_tpu.config import MGMConfig
    from mgm_tpu.stereo import compute_disparity, compute_disparity_batch

    monkeypatch.setenv("MGM_TPU_FUSED", "interpret")
    H, W, K = 18, 26, 3
    us, vs = [], []
    for k in range(K):
        u = rng.uniform(0, 50, (H, W, 1)).astype(np.float32)
        v = (np.roll(u, 2 + k, axis=1)
             + rng.normal(0, 1, (H, W, 1)).astype(np.float32))
        us.append(u)
        vs.append(v)
    us, vs = np.stack(us), np.stack(vs)
    for cfg in (MGMConfig(dmin=-6, dmax=2, ndir=4, mgm=2, test_lr=True),
                MGMConfig(dmin=-6, dmax=2, ndir=8, mgm=3,
                          distance="census", prefilter="census",
                          use_trunc_linear=True, p1=2, p2=100,
                          refinement="vfit", median_radius=1,
                          test_lr=True)):
        out = compute_disparity_batch(us, vs, cfg)
        for k in range(K):
            ref = compute_disparity(us[k], vs[k], cfg,
                                    outputs=("disp", "cost"))
            np.testing.assert_array_equal(out["disp"][k], ref["disp"])
            np.testing.assert_array_equal(out["cost"][k], ref["cost"])
