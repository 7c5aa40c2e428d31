"""Cross-based local stereo matching pipeline (`CBLSM/CBLSM.cpp:13-213`)."""

from __future__ import annotations

import jax.numpy as jnp

from stereo_match_traditional_tpu.config import CBLSMConfig
from stereo_match_traditional_tpu.models.base import StereoResult
from stereo_match_traditional_tpu.ops import aggregate, post, volume, wta


def cblsm_post(disp_l, disp_r, cfg: CBLSMConfig):
    """Dormant CBLSM post chain (`CBLSM.cpp:160-162`): LR consistency ->
    RemoveSpeckles -> MedianFilter."""
    lr = post.lr_check_consistency(disp_l, disp_r, cfg.lr_gate, post.INVALID)
    dmap = post.remove_speckles(
        lr.disp, cfg.speckle_diff, cfg.speckle_area, invalid_value=post.INVALID
    )
    dmap = post.median_filter(dmap, cfg.median_size, border="truncate")
    return dmap, lr.occlusion, lr.mismatch


def cblsm_pipeline(left, right, cfg: CBLSMConfig = CBLSMConfig()) -> StereoResult:
    """Active path (`CBLSM.cpp:64-153`): four arms per image on the raw gray
    images (the median-blurred `armImage`s at `CBLSM.cpp:24-25` are computed
    but never used) -> AD cost volumes L+R (`CBLSM.h:327-381`) -> two
    rectangle-mean passes per volume (`costAggregationV5`,
    `CBLSM.cpp:146-150`; the right volume's second pass reuses the *left*
    arms when ``cfg.second_pass_left_arms`` — the committed quirk) -> plain
    WTA (`ComputeDispOringin`, `CBLSM.h:383-407`).

    ``run_post`` enables the dormant chain (`CBLSM.cpp:160-162`).
    """
    d = cfg.disp_range
    arms_l = aggregate.cross_arms(left, cfg.arms)
    arms_r = aggregate.cross_arms(right, cfg.arms)

    vol_l = volume.ad_volume(left, right, d, "left")
    vol_r = volume.ad_volume(left, right, d, "right")

    agg_l = aggregate.rect_mean_aggregate(vol_l, arms_l)
    agg_r = aggregate.rect_mean_aggregate(vol_r, arms_r)
    for _ in range(cfg.agg_passes - 1):
        agg_l = aggregate.rect_mean_aggregate(agg_l, arms_l)
        agg_r = aggregate.rect_mean_aggregate(
            agg_r, arms_l if cfg.second_pass_left_arms else arms_r
        )

    disp_l = wta.wta(agg_l, "min")
    disp_r = wta.wta(agg_r, "min")

    disp_final = None
    occl = mism = None
    if cfg.run_post:
        disp_final, occl, mism = cblsm_post(disp_l, disp_r, cfg)
    return StereoResult(disp_l, disp_r, disp_final, occl, mism)
