"""Construction tests: GA sanity + GA/MC cross-agreement (SURVEY.md §4)."""
import numpy as np

from polar_tpu.construction.ga import construct_ga, ga_leaf_means
from polar_tpu.construction.montecarlo import construct_mc


def test_ga_known_extremes():
    mask = construct_ga(8, 4, 2.0)
    # u7 (all-g path) is the most reliable leaf, u0 the least
    assert mask[7] == 0 and mask[0] == 1
    assert mask.sum() == 4


def test_ga_means_monotone_in_snr():
    lo = ga_leaf_means(6, 2.0)
    hi = ga_leaf_means(6, 4.0)
    assert (hi >= lo - 1e-9).all()


def test_ga_matches_mc_arikan():
    fg = construct_ga(64, 32, 2.0)
    fm = construct_mc((2,) * 6, 32, 2.0, frames=1 << 13, seed=0)
    # the two methods may disagree on a few borderline subchannels
    assert (fg == fm).mean() >= 0.9


def test_mc_bch_kernel_runs():
    mask = construct_mc((16,), 8, 2.0, frames=1 << 10, seed=1)
    assert mask.sum() == 8
    # input 15 of the eBCH kernel (partial distance 16) must be unfrozen
    assert mask[15] == 0
    # input 0 (partial distance 1) must be frozen at rate 1/2
    assert mask[0] == 1
