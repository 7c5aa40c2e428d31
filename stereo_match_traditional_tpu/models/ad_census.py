"""Flagship AD-Census pipeline (`AD-CensusV1/main.cpp:13-121`)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig
from stereo_match_traditional_tpu.models.base import StereoResult
from stereo_match_traditional_tpu.ops import aggregate, post, scanline, volume, wta


def ad_census_post(disp_l, disp_r, cfg: ADCensusConfig):
    """Dormant AD-Census post chain (`main.cpp:91-94`): LeftRightConsistency
    -> RemoveSpeckles -> 8-direction FillTheHole -> MedianFilter."""
    lr = post.lr_check_consistency(disp_l, disp_r, cfg.lr_gate, post.INVALID)
    dmap = post.remove_speckles(
        lr.disp, cfg.speckle_diff, cfg.speckle_area, invalid_value=post.INVALID
    )
    dmap = post.fill_holes_8dir(
        dmap, lr.occlusion, lr.mismatch, post.INVALID, max_search=cfg.disp_range
    )
    dmap = post.median_filter(dmap, cfg.median_size, border="truncate")
    return dmap, lr.occlusion, lr.mismatch


def ad_census_pipeline(
    left,
    right,
    cfg: ADCensusConfig = ADCensusConfig(),
    left_color: Optional[object] = None,
    right_color: Optional[object] = None,
) -> StereoResult:
    """Active path (`main.cpp:58-84`): fused AD+Census volumes L+R ->
    cross arms per image -> vertical-first rectangle-mean aggregation ->
    WTA per volume.  Dormant stages made first-class:

    * ``cfg.scanline``: 4-path scanline optimization of the aggregated left
      volume + WTA (`main.cpp:86-89`);
    * ``cfg.run_post``: LeftRightConsistency -> RemoveSpeckles ->
      MedianFilter (`main.cpp:91-94`);
    * ``cfg.aggregation='cross_two_pass'``: the vendored CrossAggregator's
      exact two-pass cross aggregation (`CBLSM/cross_aggregator.cpp`) with
      ``cfg.cross_params`` — arms from the color image when provided.
    """
    d = cfg.disp_range
    vol_l = volume.ad_census_volume(
        left, right, d, cfg.sigma_c, cfg.sigma_s, cfg.census_rows, cfg.census_cols, "left"
    )
    vol_r = volume.ad_census_volume(
        left, right, d, cfg.sigma_c, cfg.sigma_s, cfg.census_rows, cfg.census_cols, "right"
    )

    if cfg.aggregation == "rect_mean":
        arms_l = aggregate.cross_arms(left, cfg.arms)
        arms_r = aggregate.cross_arms(right, cfg.arms)
        agg_l, agg_r = vol_l, vol_r
        for _ in range(cfg.agg_iters):
            agg_l = aggregate.rect_mean_aggregate(agg_l, arms_l)
            agg_r = aggregate.rect_mean_aggregate(agg_r, arms_r)
    elif cfg.aggregation == "cross_two_pass":
        img_l = left_color if left_color is not None else left
        img_r = right_color if right_color is not None else right
        arms_l = aggregate.canonical_cross_arms(img_l, cfg.cross_params)
        arms_r = aggregate.canonical_cross_arms(img_r, cfg.cross_params)
        agg_l = aggregate.cross_aggregate(vol_l, arms_l, cfg.cross_params.num_iters)
        agg_r = aggregate.cross_aggregate(vol_r, arms_r, cfg.cross_params.num_iters)
    elif cfg.aggregation == "none":
        agg_l, agg_r = vol_l, vol_r
    else:
        raise ValueError(
            f"unknown aggregation {cfg.aggregation!r}; "
            "expected 'rect_mean', 'cross_two_pass' or 'none'"
        )

    if cfg.scanline is not None:
        agg_l = scanline.scanline_optimize(agg_l, left, cfg.scanline)

    disp_l = wta.wta(agg_l, "min")
    disp_r = wta.wta(agg_r, "min")

    disp_final = None
    occl = mism = None
    if cfg.run_post:
        disp_final, occl, mism = ad_census_post(disp_l, disp_r, cfg)
    return StereoResult(disp_l, disp_r, disp_final, occl, mism)
