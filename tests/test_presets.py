"""Preset registry tests."""
import pytest

from mgm_tpu.models import PRESETS, get_preset


def test_presets_valid():
    for name, cfg in PRESETS.items():
        assert 1 <= cfg.ndir <= 16, name
        assert cfg.mgm in (1, 2, 3, 4), name


def test_sobelx_quirk_preserved():
    # "sobel_x" must resolve to none, like the reference registry
    assert get_preset("sobelx_tl").prefilter == "none"


def test_census_coupling():
    cfg = get_preset("census_tl")
    assert cfg.distance == "census" and cfg.prefilter == "census"


def test_override():
    cfg = get_preset("satellite", dmin=-50, dmax=50)
    assert (cfg.dmin, cfg.dmax) == (-50, 50)
    assert cfg.distance == "census"
