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
