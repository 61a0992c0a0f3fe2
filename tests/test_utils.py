"""Checkpoint and profiling helper tests."""
import numpy as np

from mgm_tpu.utils import save_state, load_state, timed


def test_checkpoint_roundtrip(tmp_path, rng):
    p = str(tmp_path / "state.npz")
    S = rng.uniform(0, 1, (4, 5, 6)).astype(np.float32)
    disp = rng.uniform(-10, 10, (4, 5)).astype(np.float32)
    save_state(p, S=S, disp=disp, tile=np.int32(3))
    st = load_state(p)
    np.testing.assert_array_equal(st["S"], S)
    np.testing.assert_array_equal(st["disp"], disp)
    assert int(st["tile"]) == 3


def test_checkpoint_missing(tmp_path):
    assert load_state(str(tmp_path / "nope.npz")) is None


def test_timed(capsys):
    with timed("x"):
        pass
    assert "[x]" in capsys.readouterr().out


def test_fetch_packed_bit_exact(rng):
    """_fetch_packed ships every output in ONE int16 buffer (f32
    bitcast to halves); the unpack must be bit-exact for NaN, inf,
    subnormals and the int16 NaN sentinel."""
    import jax.numpy as jnp
    import numpy as np
    from mgm_tpu.stereo import _fetch_packed, _I16_NAN

    a = rng.normal(0, 10, (7, 11)).astype(np.float32)
    a[0, 0] = np.nan
    a[1, 1] = np.inf
    a[2, 2] = -np.inf
    a[3, 3] = 1e-42  # subnormal
    b = rng.integers(-100, 100, (5, 3)).astype(np.int16)
    b[0, 0] = _I16_NAN
    c = rng.normal(0, 1, (2, 4, 3)).astype(np.float32)  # 3-D (backflow)
    d = rng.integers(-128, 128, (9, 5)).astype(np.int8)  # packed disp
    out = _fetch_packed({"cost": jnp.asarray(a), "disp": jnp.asarray(b),
                         "backflow": jnp.asarray(c),
                         "disp_nolr": jnp.asarray(d)})
    np.testing.assert_array_equal(out["cost"], a)
    np.testing.assert_array_equal(out["disp"], b)
    np.testing.assert_array_equal(out["backflow"], c)
    np.testing.assert_array_equal(out["disp_nolr"], d)
    assert out["cost"].dtype == np.float32
    assert out["disp"].dtype == np.int16
    assert out["disp_nolr"].dtype == np.int8
    out["cost"][0, 0] = 0.0  # unpacked arrays must be writable
