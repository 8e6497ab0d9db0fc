"""Adaptive phase-2 tier planner unit tests (models/overlapper._plan_tiers).

The planner only optimizes WORK — any (lo, hi] partition is correct by
construction (tier membership selects a kernel row count; emission is
canonically re-sorted) — so these tests pin the work-model properties:
coverage of every populated dove length, quantized bounds, tight tiers
on concentrated data, and few fat tiers on skewed data."""

import numpy as np

from sequence_aligner_tpu.models.overlapper import _dove_tiers, _plan_tiers


def _hist(pairs):  # counts[v + 1] = #pairs with dove length v
    h = np.zeros(102, np.int64)
    for v, c in pairs:
        h[v + 1] = c
    return h


def _covers(tiers, hist, lo0):
    for v in range(lo0 + 1, 101):
        if hist[v + 1]:
            assert any(a < v <= b for a, b in tiers), (v, tiers)


def test_uniform_beats_thirds():
    h = np.zeros(102, np.int64)
    h[28:102] = 75_000
    tiers = _plan_tiers(h, 26, 100)
    _covers(tiers, h, 26)
    def cost(ts):
        return sum(int(h[a + 2 : b + 2].sum()) * (b + 1) for a, b in ts)
    thirds = _dove_tiers(100, 12, 40, 0.98)
    assert cost(tiers) <= cost(thirds)
    assert all(b % 8 == 0 or b == 100 for _, b in tiers)


def test_skewed_short_mass_gets_cheap_low_tier():
    # dense short doves + sparse long tail: the dense mass must not pay
    # anywhere near full rows (static thirds would put it in a 36-row
    # tier; a fat single tier would charge it 100)
    h = _hist([(v, 200_000) for v in range(27, 41)]
              + [(v, 2_000) for v in range(41, 101)])
    tiers = _plan_tiers(h, 26, 100)
    _covers(tiers, h, 26)
    lo_tier = min(tiers)
    assert lo_tier[0] == 26 and lo_tier[1] <= 48


def test_concentrated_gets_tight_single_tier():
    h = _hist([(50, 300)])
    tiers = _plan_tiers(h, 26, 100)
    _covers(tiers, h, 26)
    assert len(tiers) == 1 and tiers[0][1] < 100  # not full-row fallback


def test_empty_histogram_falls_back():
    assert _plan_tiers(np.zeros(102, np.int64), 26, 100) == ((26, 100),)


def test_max_tiers_bound():
    h = np.zeros(102, np.int64)
    h[28:102] = np.random.RandomState(0).randint(1, 10**6, 74)
    tiers = _plan_tiers(h, 26, 100, max_tiers=5)
    _covers(tiers, h, 26)
    assert len(tiers) <= 5
