"""Dormant-variant ops vs brute-force oracles (SURVEY.md §2 completeness:
NCC alt impl, ASW Lab weights, bilateral filter, CBLSM V4 / local-mean /
color-SAD costs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_match_traditional_tpu import config as cfgs
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.ops import aggregate, filters, volume
from stereo_match_traditional_tpu.utils.synthetic import make_pair

rng = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# NCC shifted alt impl (`NCC/NCC.h:117-272`)
# ---------------------------------------------------------------------------


def _ncc_shifted_oracle(left, right, max_offset, k, depth_scale=3):
    h, w = left.shape
    left = left.astype(np.float64)
    right = right.astype(np.float64)
    best = np.full((h, w), -2.0)
    depth = np.zeros((h, w))
    for off in range(1, max_offset + 1):
        tmp = right.copy()
        tmp[:, off:] = right[:, :-off]
        for y in range(h):
            for x in range(w):
                y0, y1 = max(0, y - k), min(h - 1, y + k)
                x0, x1 = max(0, x - k), min(w - 1, x + k)
                n = (y1 - y0) * (x1 - x0)
                lw = left[y0 : y1 + 1, x0 : x1 + 1]
                rw = tmp[y0 : y1 + 1, x0 : x1 + 1]
                ml, mr = lw.sum() / n, rw.sum() / n
                num = ((lw - ml) * (rw - mr)).sum() / n
                vl = ((lw - ml) ** 2).sum() / n
                vr = ((rw - mr) ** 2).sum() / n
                denom = np.sqrt(vl) * np.sqrt(vr)
                res = num / denom / n if denom > 0 else np.nan
                if not np.isnan(res) and res > best[y, x]:
                    best[y, x] = res
                    depth[y, x] = off * depth_scale
    return depth


def test_ncc_shifted_matches_oracle():
    L = rng.integers(0, 256, (10, 14), dtype=np.uint8)
    R = rng.integers(0, 256, (10, 14), dtype=np.uint8)
    got = np.asarray(volume.ncc_shifted_depth(L, R, max_offset=5, kernel_size=2))
    want = _ncc_shifted_oracle(L, R, 5, 2)
    np.testing.assert_array_equal(got, want)


def test_ncc_pipeline_shifted_variant():
    L, R, _ = make_pair(24, 40, 6, seed=2)
    fn, _ = get_pipeline("ncc")
    cfg = cfgs.NCCConfig(variant="shifted", alt_max_offset=8, alt_kernel=2)
    res = fn(jnp.asarray(L), jnp.asarray(R), cfg)
    d = np.asarray(res.disp_left)
    assert d.shape == (24, 40)
    assert d.max() <= 8 * 3 and d.min() >= 0


# ---------------------------------------------------------------------------
# ASW Lab-weight variant (`ASW/ASW.h:49-175`)
# ---------------------------------------------------------------------------


def _asw_lab_oracle(lg, rg, llab, rlab, d_range, radius, ss, sc, trunc):
    h, w = lg.shape
    lgp = np.pad(lg.astype(np.float64), radius, mode="edge")
    rgp = np.pad(rg.astype(np.float64), radius, mode="edge")
    llp = np.pad(llab.astype(np.float64), ((radius,) * 2, (radius,) * 2, (0, 0)), mode="edge")
    rlp = np.pad(rlab.astype(np.float64), ((radius,) * 2, (radius,) * 2, (0, 0)), mode="edge")
    ax = np.arange(-radius, radius + 1)
    space = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2 * ss * ss))
    vol = np.zeros((d_range, h, w))
    for d in range(d_range):
        for i in range(h):
            for j in range(w):
                pi, pj = i + radius, j + radius
                qj = max(pj - d, radius)  # clamp like shifted_stack (unpadded col 0)
                wl = np.exp(
                    -((llp[pi - radius : pi + radius + 1, pj - radius : pj + radius + 1]
                       - llp[pi, pj]) ** 2) / (2 * sc * sc)
                ).mean(-1) * space
                wr = np.exp(
                    -((rlp[pi - radius : pi + radius + 1, qj - radius : qj + radius + 1]
                       - rlp[pi, qj]) ** 2) / (2 * sc * sc)
                ).mean(-1) * space
                lw = lgp[pi - radius : pi + radius + 1, pj - radius : pj + radius + 1]
                rw_cols = np.clip(np.arange(pj - radius, pj + radius + 1) - d, 0, None)
                rw = rgp[pi - radius : pi + radius + 1][:, rw_cols]
                wgt = wl * wr
                vol[d, i, j] = min((wgt * np.abs(lw - rw)).sum() / wgt.sum(), trunc)
    # border fill d > j
    for d in range(d_range):
        for j in range(w):
            if d > j:
                vol[d, :, j] = vol[d - 1, :, j]
    return vol


def test_asw_lab_volume_matches_oracle():
    Lc, Rc, _ = make_pair(10, 14, 4, seed=4, color=True)
    lg = Lc[..., 0]
    rg = Rc[..., 0]
    got = np.asarray(
        volume.asw_lab_volume(lg, rg, Lc, Rc, 4, win_size=1, space_sigma=50,
                              color_sigma=30, truncation=40)
    )
    want = _asw_lab_oracle(lg, rg, Lc, Rc, 4, 2, 50, 30, 40)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_asw_pipeline_lab_variant_runs():
    Lc, Rc, gt = make_pair(20, 28, 5, seed=1, color=True)
    fn, _ = get_pipeline("asw")
    cfg = cfgs.ASWConfig(disp_range=5, win_size=1, run_post=False, variant="lab",
                         use_pallas=False)
    res = fn(jnp.asarray(Lc[..., 0]), jnp.asarray(Rc[..., 0]), cfg,
             left_lab=jnp.asarray(Lc), right_lab=jnp.asarray(Rc))
    assert np.asarray(res.disp_left).shape == (20, 28)

    with pytest.raises(ValueError):
        fn(jnp.asarray(Lc[..., 0]), jnp.asarray(Rc[..., 0]), cfg)


# ---------------------------------------------------------------------------
# bilateral filter (`ASW/ASW.h:260-327`, `BiliteralFilter.h`)
# ---------------------------------------------------------------------------


def test_bilateral_filter_matches_oracle_gray():
    img = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    r, ss, sc = 2, 50.0, 30.0
    got = np.asarray(filters.bilateral_filter(img, r, ss, sc))
    pad = np.pad(img.astype(np.float64), r, mode="edge")
    ax = np.arange(-r, r + 1)
    space = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2 * ss * ss))
    want = np.zeros(img.shape)
    for i in range(9):
        for j in range(11):
            winv = pad[i : i + 2 * r + 1, j : j + 2 * r + 1]
            wgt = np.exp(-((winv - pad[i + r, j + r]) ** 2) / (2 * sc * sc)) * space
            want[i, j] = (wgt * winv).sum() / wgt.sum()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_bilateral_filter_color_shape_and_smoothing():
    img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    out = np.asarray(filters.bilateral_filter(img, 3, 50.0, 30.0))
    assert out.shape == (12, 16, 3)
    assert np.var(out) < np.var(img.astype(np.float64))


# ---------------------------------------------------------------------------
# CBLSM dormant costs / aggregation
# ---------------------------------------------------------------------------


def test_rect_mean_aggregate_volume_oracle():
    d_range, h, w = 3, 7, 9
    vol = rng.standard_normal((d_range, h, w)).astype(np.float32)
    arms = [rng.integers(0, 3, (d_range, h, w)).astype(np.int32) for _ in range(4)]
    got = np.asarray(
        aggregate.rect_mean_aggregate_volume(jnp.asarray(vol), *map(jnp.asarray, arms))
    )
    al, ar, au, ad_ = arms
    want = vol.copy()
    for d in range(d_range):
        for i in range(h):
            for j in range(w):
                # clamped-gather semantics (the reference reads OOB here)
                i0 = np.clip(i - au[d, i, j], 0, h - 1)
                i1 = np.clip(i + ad_[d, i, j] - 1, 0, h - 1)
                j0 = np.clip(j - al[d, i, j], 0, w - 1)
                j1 = np.clip(j + ar[d, i, j] - 1, 0, w - 1)
                cnt = (au[d, i, j] + ad_[d, i, j]) * (al[d, i, j] + ar[d, i, j])
                if cnt > 0:
                    want[d, i, j] = vol[d, i0 : i1 + 1, j0 : j1 + 1].sum() / cnt
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_local_mean_cost_oracle():
    L, R, _ = make_pair(10, 14, 4, seed=6)
    cfg = cfgs.CrossArmConfig(tao1=25, max_length=4, sec_length=2)
    arms_l = aggregate.cross_arms(jnp.asarray(L), cfg)
    arms_r = aggregate.cross_arms(jnp.asarray(R), cfg)
    got = np.asarray(aggregate.local_mean_cost(jnp.asarray(L), jnp.asarray(R), arms_l, arms_r, 4))
    al = {k: np.asarray(getattr(arms_l, k)) for k in ("left", "right", "up", "down")}
    ar = {k: np.asarray(getattr(arms_r, k)) for k in ("left", "right", "up", "down")}
    h, w = L.shape
    Lf, Rf = L.astype(np.float64), R.astype(np.float64)
    for d in (0, 2):
        for i in (0, 4, 9):
            for j in (0, 5, 13):
                def region_mean(img, a, shift):
                    i0 = max(i - a["up"][i, j], 0)
                    i1 = min(i + a["down"][i, j], h - 1)
                    j0 = np.clip(j - a["left"][i, j] - shift, 0, w - 1)
                    j1 = np.clip(j + a["right"][i, j] - shift, 0, w - 1)
                    return img[i0 : i1 + 1, j0 : j1 + 1].mean()
                want = abs(region_mean(Lf, al, 0) - region_mean(Rf, ar, d))
                assert abs(got[d, i, j] - want) < 1e-3, (d, i, j)


def test_sad_channel_min_oracle():
    Lc, Rc, _ = make_pair(10, 12, 4, seed=8, color=True)
    got = np.asarray(
        volume.sad_volume(Lc, Rc, 4, winsize=0, view="left", mean=True, channel_min=True)
    )
    r = 1
    lp = np.pad(Lc.astype(np.float64), ((r, r), (r, r), (0, 0)), mode="edge")
    rp = np.pad(Rc.astype(np.float64), ((r, r), (r, r), (0, 0)), mode="edge")
    h, w = 10, 12
    for d in (0, 3):
        for i in (0, 5):
            for j in (5, 11):
                cols = np.clip(np.arange(j - r, j + r + 1) + r - d, 0, None)
                lw = lp[i : i + 2 * r + 1, j : j + 2 * r + 1]
                rw = rp[i : i + 2 * r + 1][:, cols]
                err = np.abs(lw - rw).min(-1).mean()
                if d <= j:
                    assert abs(got[d, i, j] - err) < 1e-3, (d, i, j)


@pytest.mark.slow
def test_cblsm_pipeline_variants_run(tiny_pair):
    L, R, _ = tiny_pair
    fn, _ = get_pipeline("cblsm")
    for cost, agg in [
        ("sad_mean", "rect_mean"),
        ("local_mean", "none"),
        ("ad", "rect_mean_v4"),
        ("ad", "cross_two_pass"),
    ]:
        cfg = cfgs.CBLSMConfig(
            disp_range=6, cost=cost, aggregation=agg,
            arms=cfgs.CrossArmConfig(tao1=25, max_length=6, sec_length=3),
        )
        res = fn(jnp.asarray(L), jnp.asarray(R), cfg)
        assert np.asarray(res.disp_left).shape == L.shape, (cost, agg)

    with pytest.raises(ValueError):
        fn(jnp.asarray(L), jnp.asarray(R), cfgs.CBLSMConfig(cost="bogus"))
