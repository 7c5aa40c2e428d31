"""Robustness probes: unusual inputs every pipeline must survive.

The reference would crash or read out of bounds on most of these (fixed
450x375 assumptions everywhere); the engine treats them as first-class.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_match_traditional_tpu import config as cfgs
from stereo_match_traditional_tpu.models import PIPELINES, get_pipeline
from stereo_match_traditional_tpu.utils.synthetic import make_pair


def _cfg_for(name, **kw):
    cfg_cls = get_pipeline(name)[1]
    valid = {f for f in cfg_cls.__dataclass_fields__}
    return cfg_cls(**{k: v for k, v in kw.items() if k in valid})


@pytest.mark.parametrize("name", sorted(PIPELINES))
def test_float32_inputs(name):
    """float32 images (not u8) run and produce in-range disparities."""
    L, R, _ = make_pair(24, 40, 6, seed=0)
    cfg = _cfg_for(name, disp_range=6, max_disparity=6, win_size=2, winsize=1,
                   run_post=False)
    fn, _ = get_pipeline(name)
    res = fn(jnp.asarray(L, jnp.float32) / 2.0, jnp.asarray(R, jnp.float32) / 2.0, cfg)
    d = np.asarray(res.disp_left)
    assert d.shape == (24, 40) and np.isfinite(d).all()
    assert d.min() >= 0 and d.max() <= 6


@pytest.mark.parametrize("name", ["sad", "ad_census", "cblsm"])
def test_disp_range_exceeds_width(name):
    """disparity range wider than the image: the border-fill/clamp path."""
    L, R, _ = make_pair(16, 12, 4, seed=1)
    cfg = _cfg_for(name, disp_range=20, max_disparity=20, winsize=1, run_post=False)
    fn, _ = get_pipeline(name)
    d = np.asarray(fn(jnp.asarray(L), jnp.asarray(R), cfg).disp_left)
    assert d.shape == (16, 12) and np.isfinite(d).all()


@pytest.mark.parametrize("name", sorted(PIPELINES))
def test_tiny_nonsquare(name):
    L, R, _ = make_pair(9, 33, 3, seed=2)
    cfg = _cfg_for(name, disp_range=3, max_disparity=3, win_size=1, winsize=0,
                   run_post=False)
    fn, _ = get_pipeline(name)
    d = np.asarray(fn(jnp.asarray(L), jnp.asarray(R), cfg).disp_left)
    assert d.shape == (9, 33)


@pytest.mark.slow
def test_constant_images_all_pipelines():
    """Perfectly flat pair: no NaNs anywhere, NCC yields 0 everywhere."""
    L = np.full((20, 30), 97, np.uint8)
    R = np.full((20, 30), 97, np.uint8)
    for name in sorted(PIPELINES):
        cfg = _cfg_for(name, disp_range=5, max_disparity=5, win_size=2,
                       winsize=1, run_post=False)
        fn, _ = get_pipeline(name)
        d = np.asarray(fn(jnp.asarray(L), jnp.asarray(R), cfg).disp_left)
        assert np.isfinite(d).all(), name
    cfg = cfgs.NCCConfig(disp_range=5, win_size=2)
    d = np.asarray(get_pipeline("ncc")[0](jnp.asarray(L), jnp.asarray(R), cfg).disp_left)
    np.testing.assert_array_equal(d, 0.0)


@pytest.mark.slow
def test_full_post_on_degenerate_map():
    """Post chain on a map that is entirely invalid after LR check."""
    from stereo_match_traditional_tpu.ops import post

    dl = jnp.zeros((12, 16)) + 3.0
    dr = jnp.zeros((12, 16)) + 9.0  # inconsistent everywhere
    lr = post.lr_check_consistency(dl, dr, 1.0)
    d = post.remove_speckles(lr.disp, 1.0, 5)
    d = post.fill_holes_8dir(d, lr.occlusion, lr.mismatch, max_search=5)
    d = post.median_filter(d, 3)
    assert np.asarray(d).shape == (12, 16)  # must not crash or hang


# ---------------------------------------------------------------------------
# config-lattice sweep: every documented enum/flag combination per pipeline
# runs end to end at tiny shapes — the cross-flag interactions (e.g. the
# canonical scanline+post chain under cross_two_pass) that per-flag unit
# tests cannot catch.
# ---------------------------------------------------------------------------


def _lattice():
    cases = []
    for subpixel in (False, True):
        for right in (False, True):
            cases.append(("sad", dict(max_disparity=6, winsize=2,
                                      subpixel=subpixel, compute_right=right,
                                      run_post=right)))
    for mode in ("ignore", "sentinel"):
        cases.append(("ncc", dict(disp_range=6, win_size=2, invalid_mode=mode)))
    cases.append(("ncc", dict(disp_range=6, win_size=2, variant="shifted",
                              alt_max_offset=6)))
    for variant in ("fused", "lab"):
        for post_on in (False, True):
            cases.append(("asw", dict(disp_range=6, win_size=2, variant=variant,
                                      use_pallas=False, run_post=post_on)))
    for agg in ("rect_mean", "cross_two_pass", "none"):
        for scan in (False, True):
            for post_on in (False, True):
                cases.append(("ad_census", dict(disp_range=6, aggregation=agg,
                                                scanline=scan, run_post=post_on)))
    for cost in ("ad", "sad_mean", "local_mean"):
        for agg in ("rect_mean", "rect_mean_v4", "cross_two_pass", "none"):
            cases.append(("cblsm", dict(disp_range=6, win_size=2, cost=cost,
                                        aggregation=agg)))
    cases.append(("cblsm", dict(disp_range=6, second_pass_left_arms=False,
                                run_post=True)))
    return cases


@pytest.mark.slow
@pytest.mark.parametrize("name,kw", _lattice())
def test_config_lattice(name, kw):
    if kw.pop("scanline", False):
        kw["scanline"] = cfgs.ScanlineConfig()
    L, R, _ = make_pair(20, 36, 6, seed=4)
    cfg = _cfg_for(name, **kw)
    fn, _ = get_pipeline(name)
    extra = {}
    if name == "asw" and kw.get("variant") == "lab":
        # the lab variant weights from L*a*b* planes (`ASWeight.cpp:33-34`)
        extra = dict(
            left_lab=jnp.stack([jnp.asarray(L)] * 3, -1),
            right_lab=jnp.stack([jnp.asarray(R)] * 3, -1),
        )
    res = fn(jnp.asarray(L), jnp.asarray(R), cfg, **extra)
    d = np.asarray(res.disp_left)
    assert d.shape == (20, 36)
    finite = d[np.isfinite(d)]
    assert finite.size and finite.min() >= 0
    if kw.get("run_post"):
        assert res.disp_final is not None
        assert np.asarray(res.disp_final).shape == (20, 36)
