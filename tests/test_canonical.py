"""Canonical AD-Census components (the `ADCensusOption` fields the
reference declares but never implements, `CBLSM/adcensus_types.h:72-75`):
tso-scheduled scanline, iterative region voting, discontinuity adjustment.
Each is validated against a dead-simple NumPy oracle (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_match_traditional_tpu import config as cfgs
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.ops import aggregate, post, scanline
from stereo_match_traditional_tpu.utils.synthetic import make_pair

INF = np.inf


# ------------------------------------------------------------------ oracles


def oracle_canonical_pass(cost, g1, g2, p1, p2, tso):
    """Naive sequential DP along axis 0 of cost [N, D]."""
    n, d_n = cost.shape
    out = np.zeros_like(cost)
    out[0] = cost[0]
    for t in range(1, n):
        d1 = abs(g1[t] - g1[t - 1])
        prev_min = out[t - 1].min()
        for d in range(d_n):
            d2 = abs(g2[t, d] - g2[t - 1, d])
            if d1 < tso and d2 < tso:
                s = 1.0
            elif d1 >= tso and d2 >= tso:
                s = 0.1
            else:
                s = 0.25
            c1, c2 = p1 * s, p2 * s
            best = out[t - 1, d]
            if d > 0:
                best = min(best, out[t - 1, d - 1] + c1)
            if d < d_n - 1:
                best = min(best, out[t - 1, d + 1] + c1)
            best = min(best, prev_min + c2)
            out[t, d] = cost[t, d] + best - prev_min
    return out


def oracle_irv(disp, arms, disp_range, ts, th, iters):
    d = disp.copy()
    h, w = d.shape
    for _ in range(iters):
        nxt = d.copy()
        for i in range(h):
            for j in range(w):
                if np.isfinite(d[i, j]):
                    continue
                votes = np.zeros(disp_range)
                # two-pass cross region: horizontal span of every pixel in
                # the vertical arm span of (i, j)
                for t in range(-arms.up[i, j], arms.down[i, j] + 1):
                    ii = i + t
                    for s in range(-arms.left[ii, j], arms.right[ii, j] + 1):
                        v = d[ii, j + s]
                        if np.isfinite(v):
                            votes[int(round(v))] += 1
                total = votes.sum()
                if total > ts and votes.max() > th * total:
                    nxt[i, j] = float(votes.argmax())
        d = nxt
    return d


# -------------------------------------------------------------------- tests


def test_canonical_pass_matches_oracle():
    rng = np.random.default_rng(0)
    n, d_n, m = 12, 5, 4
    cost = rng.random((n, d_n, m)).astype(np.float32) * 2
    g1 = (rng.random((n, m)) * 255).astype(np.float32)
    g2 = (rng.random((n, d_n, m)) * 255).astype(np.float32)
    got = np.asarray(
        scanline._canonical_pass(
            jnp.asarray(cost), jnp.asarray(g1), jnp.asarray(g2), 1.0, 3.0, 15.0
        )
    )
    for lane in range(m):
        want = oracle_canonical_pass(
            cost[:, :, lane], g1[:, lane], g2[:, :, lane], 1.0, 3.0, 15.0
        )
        np.testing.assert_allclose(got[:, :, lane], want, rtol=1e-5, atol=1e-5)


def test_canonical_scanline_reduces_bad_pixels():
    """End-to-end sanity: canonical scanline on a noisy volume must not
    *hurt* and typically improves the WTA map."""
    from stereo_match_traditional_tpu.ops import volume, wta
    from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate

    L, R, gt = make_pair(48, 64, 10, seed=11)
    vol = volume.ad_volume(jnp.asarray(L), jnp.asarray(R), 10, "left") / 64.0
    raw = np.asarray(wta.wta(vol, "min"))
    opt = scanline.scanline_optimize_canonical(
        vol, jnp.asarray(L), jnp.asarray(R), 1.0, 3.0, 15.0, "left"
    )
    sm = np.asarray(wta.wta(opt, "min"))
    assert bad_pixel_rate(sm[:, 10:], gt[:, 10:]) <= bad_pixel_rate(
        raw[:, 10:], gt[:, 10:]
    )


def test_iterative_region_voting_matches_oracle():
    rng = np.random.default_rng(3)
    h, w, d_n = 14, 18, 6
    disp = rng.integers(0, d_n, (h, w)).astype(np.float32)
    holes = rng.random((h, w)) < 0.3
    disp[holes] = INF
    img = (rng.random((h, w)) * 40).astype(np.uint8)  # low contrast: real arms
    arms = aggregate.canonical_cross_arms(
        jnp.asarray(img), cfgs.CrossAggregatorParams(cross_l1=3, cross_l2=2)
    )
    arms_np = type(arms)(*[np.asarray(a) for a in arms])
    got = np.asarray(
        post.iterative_region_voting(
            jnp.asarray(disp), arms, d_n, ts=4.0, th=0.4, num_iters=2
        )
    )
    want = oracle_irv(disp, arms_np, d_n, 4.0, 0.4, 2)
    np.testing.assert_array_equal(got, want)


def test_iterative_region_voting_d_chunked_bitwise():
    """Chunked voting histograms (the streamed executor's memory bound) are
    the SAME function: per-bin counts are d-independent, f32 totals are
    exact integers, the running strict-> argmax keeps argmax's first-max
    rule — including a chunk count that does not divide disp_range."""
    rng = np.random.default_rng(7)
    h, w, d_n = 17, 23, 11
    disp = rng.integers(0, d_n, (h, w)).astype(np.float32)
    disp[rng.random((h, w)) < 0.35] = INF
    img = (rng.random((h, w)) * 40).astype(np.uint8)
    arms = aggregate.canonical_cross_arms(
        jnp.asarray(img), cfgs.CrossAggregatorParams(cross_l1=3, cross_l2=2)
    )
    want = np.asarray(
        post.iterative_region_voting(
            jnp.asarray(disp), arms, d_n, ts=4.0, th=0.4, num_iters=2
        )
    )
    for dc in (1, 3, 4, 11, 64):
        got = np.asarray(
            post.iterative_region_voting(
                jnp.asarray(disp), arms, d_n, ts=4.0, th=0.4, num_iters=2,
                d_chunk=dc,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"d_chunk={dc}")


def test_discontinuity_adjustment_picks_cheaper_neighbor():
    d_n, h, w = 4, 3, 5
    vol = np.full((d_n, h, w), 5.0, np.float32)
    disp = np.zeros((h, w), np.float32)
    disp[:, 2] = 3.0  # discontinuity vs neighbors at disparity 0
    # make the neighbor disparity (0) strictly cheaper at column 2
    vol[0, :, 2] = 1.0
    vol[3, :, 2] = 4.0
    out = np.asarray(
        post.discontinuity_adjustment(jnp.asarray(disp), jnp.asarray(vol))
    )
    np.testing.assert_array_equal(out[:, 2], np.zeros(h))
    # non-edge pixels untouched
    np.testing.assert_array_equal(out[:, 0], disp[:, 0])


def test_discontinuity_adjustment_keeps_cheaper_self():
    d_n, h, w = 4, 3, 5
    vol = np.full((d_n, h, w), 5.0, np.float32)
    disp = np.zeros((h, w), np.float32)
    disp[:, 2] = 3.0
    vol[3, :, 2] = 1.0  # own disparity already cheapest
    out = np.asarray(
        post.discontinuity_adjustment(jnp.asarray(disp), jnp.asarray(vol))
    )
    np.testing.assert_array_equal(out, disp)


@pytest.mark.slow
def test_canonical_pipeline_end_to_end():
    """cross_two_pass + scanline + run_post exercises every canonical
    component; output must be finite-filled and deterministic."""
    L, R, gt = make_pair(48, 64, 10, seed=4)
    cfg = cfgs.ADCensusConfig(
        disp_range=10,
        aggregation="cross_two_pass",
        scanline=cfgs.ScanlineConfig(),
        run_post=True,
        cross_params=cfgs.CrossAggregatorParams(
            num_iters=2, do_discontinuity_adjustment=True
        ),
    )
    fn, _ = get_pipeline("ad_census")
    a = fn(jnp.asarray(L), jnp.asarray(R), cfg)
    b = fn(jnp.asarray(L), jnp.asarray(R), cfg)
    np.testing.assert_array_equal(np.asarray(a.disp_final), np.asarray(b.disp_final))
    final = np.asarray(a.disp_final)
    assert np.isfinite(final[:, 10:]).mean() > 0.9
    assert final[np.isfinite(final)].max() < 10
    from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate

    ok = np.isfinite(final[:, 10:])
    assert bad_pixel_rate(final[:, 10:], gt[:, 10:], valid=ok) < 0.2
