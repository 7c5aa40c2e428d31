"""Cross-based local stereo matching pipeline (`CBLSM/CBLSM.cpp:13-213`)."""

from __future__ import annotations

import jax.numpy as jnp

from stereo_match_traditional_tpu.config import CBLSMConfig
from stereo_match_traditional_tpu.models.base import StereoResult
from stereo_match_traditional_tpu.ops import aggregate, post, volume, wta
from stereo_match_traditional_tpu.utils.profiling import stage_scope


def cblsm_post(disp_l, disp_r, cfg: CBLSMConfig):
    """Dormant CBLSM post chain (`CBLSM.cpp:160-162`): LR consistency ->
    RemoveSpeckles -> MedianFilter."""
    lr = post.lr_check_consistency(
        disp_l, disp_r, cfg.lr_gate, post.INVALID, disp_range=cfg.disp_range
    )
    dmap = post.remove_speckles(
        lr.disp, cfg.speckle_diff, cfg.speckle_area, invalid_value=post.INVALID
    )
    dmap = post.median_filter(dmap, cfg.median_size, border="truncate")
    return dmap, lr.occlusion, lr.mismatch


def cblsm_pipeline(
    left, right, cfg: CBLSMConfig = CBLSMConfig(), return_stages: bool = False
) -> StereoResult:
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
    with stage_scope("arms"):
        arms_l = aggregate.cross_arms(left, cfg.arms)
        arms_r = aggregate.cross_arms(right, cfg.arms)

    if cfg.cost == "ad":
        with stage_scope("cost_volume"):
            vol_l = volume.ad_volume(left, right, d, "left")
            vol_r = volume.ad_volume(left, right, d, "right")
    elif cfg.cost == "sad_mean":
        # dormant ComputeDispLeft/Right (`CBLSM.h:409-489`): mean SAD window
        with stage_scope("cost_volume"):
            vol_l = volume.sad_volume(left, right, d, cfg.win_size, "left", mean=True)
            vol_r = volume.sad_volume(left, right, d, cfg.win_size, "right", mean=True)
    elif cfg.cost == "sad_mean_v4":
        # dormant ComputeDispV4 (`CBLSM.h:494-532`): min-channel color SAD;
        # inputs must be [H, W, 3]
        with stage_scope("cost_volume"):
            vol_l = volume.sad_volume(
                left, right, d, cfg.win_size, "left", mean=True, channel_min=True
            )
            vol_r = volume.sad_volume(
                left, right, d, cfg.win_size, "right", mean=True, channel_min=True
            )
    elif cfg.cost == "local_mean":
        # dormant on-the-fly aggregated cost (`CBLSM.h:969-1085`)
        with stage_scope("cost_volume"):
            vol_l = aggregate.local_mean_cost(left, right, arms_l, arms_r, d)
            vol_r = aggregate.local_mean_cost(
                right[:, ::-1], left[:, ::-1],
                aggregate.cross_arms(right[:, ::-1], cfg.arms),
                aggregate.cross_arms(left[:, ::-1], cfg.arms),
                d,
            )[:, :, ::-1]
    else:
        raise ValueError(
            f"unknown cost {cfg.cost!r}; expected 'ad', 'sad_mean', "
            "'sad_mean_v4' or 'local_mean'"
        )

    if cfg.aggregation == "rect_mean":
        with stage_scope("aggregate"):
            agg_l = aggregate.rect_mean_aggregate(vol_l, arms_l, max_span=cfg.arms.max_length)
            agg_r = aggregate.rect_mean_aggregate(vol_r, arms_r, max_span=cfg.arms.max_length)
            for _ in range(cfg.agg_passes - 1):
                if cfg.second_pass_left_arms:
                    # the committed quirk (`CBLSM.cpp:150`) aggregates BOTH
                    # volumes with the left arms — one stacked [2D, H, W]
                    # pass halves the per-pixel gather picks (the rect
                    # corner gathers fetch contiguous D-rows, so doubling
                    # the row length is free; bit-identical per slice)
                    both = jnp.concatenate([agg_l, agg_r], axis=0)
                    both = aggregate.rect_mean_aggregate(both, arms_l, max_span=cfg.arms.max_length)
                    agg_l, agg_r = both[:d], both[d:]
                else:
                    agg_l = aggregate.rect_mean_aggregate(agg_l, arms_l, max_span=cfg.arms.max_length)
                    agg_r = aggregate.rect_mean_aggregate(agg_r, arms_r, max_span=cfg.arms.max_length)
    elif cfg.aggregation == "rect_mean_v4":
        # dormant disparity-conditioned support (`CBLSM.cpp:108-111` +
        # `costAggregationV4`, `CBLSM.h:1128-1176`)
        with stage_scope("aggregate"):
            vl, vr, vu, vd = aggregate.cblsm_arm_volumes(
                arms_l, arms_r, d, max_steps=cfg.arms.max_length
            )
            agg_l = aggregate.rect_mean_aggregate_volume(vol_l, vl, vr, vu, vd)
            agg_r = aggregate.rect_mean_aggregate_volume(vol_r, vl, vr, vu, vd)
    elif cfg.aggregation == "cross_two_pass":
        # the vendored CrossAggregator path (`CBLSM.cpp:138-143`, commented)
        with stage_scope("aggregate"):
            c_arms_l = aggregate.canonical_cross_arms(left, cfg.cross_params)
            c_arms_r = aggregate.canonical_cross_arms(right, cfg.cross_params)
            agg_l = aggregate.cross_aggregate(vol_l, c_arms_l, cfg.cross_params.num_iters,
                                          span_cap=cfg.cross_params.cross_l1)
            agg_r = aggregate.cross_aggregate(vol_r, c_arms_r, cfg.cross_params.num_iters,
                                          span_cap=cfg.cross_params.cross_l1)
    elif cfg.aggregation == "none":
        agg_l, agg_r = vol_l, vol_r
    else:
        raise ValueError(
            f"unknown aggregation {cfg.aggregation!r}; expected 'rect_mean', "
            "'rect_mean_v4', 'cross_two_pass' or 'none'"
        )

    with stage_scope("wta"):
        disp_l = wta.wta(agg_l, "min")
        disp_r = wta.wta(agg_r, "min")

    disp_final = None
    occl = mism = None
    if cfg.run_post:
        with stage_scope("post"):
            disp_final, occl, mism = cblsm_post(disp_l, disp_r, cfg)
    result = StereoResult(disp_l, disp_r, disp_final, occl, mism)
    if return_stages:
        return result, {
            "cost_left": vol_l, "cost_right": vol_r,
            "aggregated_left": agg_l, "aggregated_right": agg_r,
        }
    return result
