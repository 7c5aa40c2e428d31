"""Arm growth + aggregation vs. brute-force oracles."""

import numpy as np
import pytest

import oracles
from stereo_match_traditional_tpu.config import CrossArmConfig, CrossAggregatorParams
from stereo_match_traditional_tpu.ops import aggregate


def _img(seed=0, h=20, w=26, color=False):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w) + ((3,) if color else ()), dtype=np.uint8)
    # add flat regions so arms actually grow
    base[5:15, 4:20] = base[5, 4]
    return base


@pytest.mark.parametrize("color", [False, True])
def test_cross_arms_match_oracle(color):
    img = _img(color=color)
    cfg = CrossArmConfig(tao1=25, tao2=6, max_length=12, sec_length=5)
    arms = aggregate.cross_arms(img, cfg)
    for name, got in zip(("left", "right", "up", "down"), arms):
        want = oracles.arm_length(img, cfg.tao1, cfg.tao2, cfg.max_length, cfg.sec_length, name)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=name)


@pytest.mark.parametrize("color", [False, True])
def test_canonical_arms_match_oracle(color):
    img = _img(seed=2, color=color)
    p = CrossAggregatorParams(cross_l1=10, cross_l2=4, cross_t1=20, cross_t2=6)
    arms = aggregate.canonical_cross_arms(img, p)
    for name, got in zip(("left", "right", "up", "down"), arms):
        want = oracles.canonical_arm(img, p.cross_t1, p.cross_t2, p.cross_l1, p.cross_l2, name)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=name)


def test_rect_mean_matches_bruteforce():
    rng = np.random.default_rng(7)
    vol = rng.standard_normal((4, 12, 14)).astype(np.float32)
    img = _img(seed=1, h=12, w=14)
    cfg = CrossArmConfig(tao1=25, max_length=6, sec_length=3)
    arms = aggregate.cross_arms(img, cfg)
    got = np.asarray(aggregate.rect_mean_aggregate(vol, arms))
    l, r, u, d = (np.asarray(a) for a in arms)
    want = oracles.rect_mean_aggregate(vol, l, r, u, d, inclusive=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cross_two_pass_matches_bruteforce():
    rng = np.random.default_rng(8)
    vol = rng.standard_normal((3, 10, 12)).astype(np.float64)
    img = _img(seed=3, h=10, w=12, color=True)
    p = CrossAggregatorParams(cross_l1=6, cross_l2=3, cross_t1=25, cross_t2=8)
    arms = aggregate.canonical_cross_arms(img, p)
    got = np.asarray(aggregate.cross_aggregate(vol, arms, num_iters=4))
    l, r, u, d = (np.asarray(a) for a in arms)
    want = oracles.cross_two_pass(vol, (l, r, u, d), num_iters=4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cross_aggregate_banded_matches_gather():
    """max_arm banded shift+select picks == take/gather picks, bitwise,
    including the 2-D support-count path and odd arm caps."""
    rng = np.random.default_rng(11)
    vol = rng.standard_normal((5, 23, 31)).astype(np.float32)
    img = _img(seed=9, h=23, w=31, color=False)
    p = CrossAggregatorParams(cross_l1=7, cross_l2=3, cross_t1=30, cross_t2=10)
    arms = aggregate.canonical_cross_arms(img, p)
    a = np.asarray(aggregate.cross_aggregate(vol, arms, num_iters=3, method="gather"))
    b = np.asarray(aggregate.cross_aggregate(vol, arms, num_iters=3, max_arm=7))
    np.testing.assert_array_equal(a, b)
    # the MXU banded-matmul path sums spans directly (no prefix-sum
    # cancellation) — fp-rounding-close, not bitwise
    m = np.asarray(aggregate.cross_aggregate(vol, arms, num_iters=3, method="matmul"))
    np.testing.assert_allclose(m, a, rtol=1e-4, atol=1e-5)
    c = np.asarray(aggregate._hsum(vol, arms.left, arms.right))
    d = np.asarray(aggregate._hsum(vol, arms.left, arms.right, max_arm=7))
    np.testing.assert_array_equal(c, d)
    e = np.asarray(aggregate._vsum(vol, arms.up, arms.down))
    f = np.asarray(aggregate._vsum(vol, arms.up, arms.down, max_arm=7))
    np.testing.assert_array_equal(e, f)


def test_arm_bounds():
    """Arms never cross the image border (aggregation reads stay in-bounds)."""
    img = _img(seed=4)
    cfg = CrossArmConfig()
    arms = aggregate.cross_arms(img, cfg)
    h, w = img.shape
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    assert (np.asarray(arms.left) <= jj).all()
    assert (np.asarray(arms.right) <= w - 1 - jj).all()
    assert (np.asarray(arms.up) <= ii).all()
    assert (np.asarray(arms.down) <= h - 1 - ii).all()


def test_rect_mean_exclusive_empty_region_keeps_center():
    """inclusive=False with up=down=0 at a border row: the clipped-empty
    rectangle must keep the centre cost (the reference divides 0/0)."""
    import jax.numpy as jnp

    vol = jnp.asarray(np.arange(2 * 2 * 3, dtype=np.float32).reshape(2, 2, 3))
    zeros = jnp.zeros((2, 3), jnp.int32)
    arms = aggregate.Arms(left=zeros, right=zeros, up=zeros, down=zeros)
    out = np.asarray(aggregate.rect_mean_aggregate(vol, arms, inclusive=False))
    np.testing.assert_array_equal(out, np.asarray(vol))


def test_rect_mean_pixel_major_matches_dmajor():
    """The pixel-major rect SAT+picks (layout='pixel_major', D lane-padded
    to 64) equals the documented d-major path to the SAT-cancellation fp
    envelope, in both the small-source and row-chunked regimes."""
    rng = np.random.default_rng(17)
    img = _img(seed=7, h=41, w=53, color=False)
    arms = aggregate.cross_arms(img, CrossArmConfig())
    vol = rng.standard_normal((60, 41, 53)).astype(np.float32)
    a = np.asarray(aggregate.rect_mean_aggregate(
        vol, arms, max_span=34, layout="dmajor"))
    b = np.asarray(aggregate.rect_mean_aggregate(
        vol, arms, max_span=34, layout="pixel_major"))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    # chunked regime: force tiny chunk thresholds so the row-banded pm
    # source path runs at test size (bit-identical picks of the same SAT)
    import unittest.mock as mock
    with mock.patch.object(aggregate, "_GATHER_CHUNK_MIN_BYTES", 1 << 16), \
         mock.patch.object(aggregate, "_GATHER_CHUNK_TARGET_BYTES", 1 << 17), \
         mock.patch.object(aggregate, "_GATHER_FAST_SRC_BYTES", 1 << 18):
        c = np.asarray(aggregate.rect_mean_aggregate(
            vol, arms, max_span=34, layout="pixel_major"))
    np.testing.assert_allclose(a, c, rtol=2e-4, atol=2e-5)


def test_cross_aggregate_pixel_major_matches_gather():
    """The D >= _CROSS_PM_MIN_D pixel-major path (zero per-pass layout
    moves — the serving-size executor's aggregation) equals the documented
    [D, H, W] prefix-sum/gather path (method='gather' is never rerouted)
    to the SAT-cancellation fp envelope, and span_cap (a chunk-halo hint)
    never changes values."""
    rng = np.random.default_rng(13)
    h, w, d = 37, 45, aggregate._CROSS_PM_MIN_D + 2
    img = _img(seed=5, h=h, w=w, color=False)
    p = CrossAggregatorParams()
    arms = aggregate.canonical_cross_arms(img, p)
    vol = rng.standard_normal((d, h, w)).astype(np.float32)
    pm = np.asarray(aggregate.cross_aggregate(
        vol, arms, 4, method="pixel_major", span_cap=p.cross_l1))
    ga = np.asarray(aggregate.cross_aggregate(vol, arms, 4, method="gather"))
    np.testing.assert_allclose(pm, ga, rtol=2e-4, atol=2e-5)
    pm2 = np.asarray(aggregate.cross_aggregate(vol, arms, 4, method="pixel_major"))
    np.testing.assert_array_equal(pm, pm2)
