"""Scanline optimizer vs. naive DP oracle."""

import numpy as np

import oracles
from stereo_match_traditional_tpu.config import ScanlineConfig
from stereo_match_traditional_tpu.ops import scanline


def _case(seed=0, d=5, h=6, w=8):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 4, size=(d, h, w)).astype(np.float32)
    gray = rng.integers(0, 256, size=(h, w)).astype(np.float32)
    return cost, gray


def test_four_direction_sum_matches_oracle():
    cost, gray = _case()
    cfg = ScanlineConfig(p1=1.0, p2=8.0)
    got = np.asarray(scanline.scanline_optimize(cost, gray, cfg))
    want = sum(
        oracles.scanline_pass(cost, gray, 1.0, 8.0, dr) for dr in ("lr", "rl", "ud", "du")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_faithful_vertical_quirk():
    cost, gray = _case(seed=2)
    cfg = ScanlineConfig(p1=2.0, p2=20.0, faithful_vertical_l2=True)
    got = np.asarray(scanline.scanline_optimize(cost, gray, cfg))
    want = (
        oracles.scanline_pass(cost, gray, 2.0, 20.0, "lr")
        + oracles.scanline_pass(cost, gray, 2.0, 20.0, "rl")
        + oracles.scanline_pass(cost, gray, 2.0, 20.0, "ud", l2_uses_dm1=False)
        + oracles.scanline_pass(cost, gray, 2.0, 20.0, "du", l2_uses_dm1=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_constant_cost_stays_constant():
    """With P1 large and uniform cost, aggregation must not distort argmin."""
    d, h, w = 4, 5, 7
    cost = np.zeros((d, h, w), np.float32)
    cost[2] = -1.0  # best plane
    gray = np.zeros((h, w), np.float32)
    out = np.asarray(scanline.scanline_optimize(cost, gray, ScanlineConfig(p1=10, p2=150)))
    assert (np.argmin(out, axis=0) == 2).all()
