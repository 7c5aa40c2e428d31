"""SAD block-matching pipeline (`SAD/SADmain.cpp:24-99`)."""

from __future__ import annotations


from stereo_match_traditional_tpu.config import SADConfig
from stereo_match_traditional_tpu.models.base import StereoResult
from stereo_match_traditional_tpu.ops import post, volume, wta
from stereo_match_traditional_tpu.utils.profiling import stage_scope


def sad_post(disp_l, disp_r, cfg: SADConfig):
    """Dormant SAD post chain (`SADmain.cpp:68-79`): LR cross-check with
    occlusion/mismatch classes (`Sad.h:184-222`), speckle removal
    (`Sad.h:251-315`), 8-direction hole fill (`Sad.h:317-400`), and the
    truncate-border median (`Sad.h:224-249`)."""
    lr = post.lr_check_simple(
        disp_l, disp_r, cfg.lr_gate, post.INVALID, disp_range=cfg.max_disparity
    )
    d = post.remove_speckles(
        lr.disp,
        cfg.speckle_diff,
        cfg.speckle_area,
        invalid_value=post.INVALID,
        background=0.0,  # Sad.h:265 skips zero-disparity seeds
    )
    d = post.fill_holes_8dir(
        d, lr.occlusion, lr.mismatch, post.INVALID,
        max_search=cfg.fill_max_search,  # None = faithful unbounded rays
    )
    d = post.median_filter(d, 3, border="truncate")
    return d, lr.occlusion, lr.mismatch


def sad_pipeline(
    left, right, cfg: SADConfig = SADConfig(), return_stages: bool = False
) -> StereoResult:
    """Active path: 9x9 SAD volume -> uniqueness WTA, left map only
    (`SADmain.cpp:66`).  ``compute_right`` / ``run_post`` enable the dormant
    stages (`SADmain.cpp:67-79`): plain-argmin right map
    (`GetPointDepthRight` + `GetMinSadIndex`, `Sad.h:141-182,22-38`),
    LR cross-check with occlusion/mismatch classes (`Sad.h:184-222`),
    speckle removal (`Sad.h:251-315`), 8-direction hole fill
    (`Sad.h:317-400`) and the truncate-border median (`Sad.h:224-249`).
    """
    with stage_scope("cost_volume"):
        vol_l = volume.sad_volume(left, right, cfg.max_disparity, cfg.winsize, "left")
    with stage_scope("wta"):
        disp_l = wta.optimal_disparity(vol_l, cfg.uniqueness_eps, cfg.subpixel)

    vol_r = None
    disp_r = None
    disp_final = None
    occl = None
    mism = None
    if cfg.compute_right or cfg.run_post:
        with stage_scope("cost_volume_right"):
            vol_r = volume.sad_volume(left, right, cfg.max_disparity, cfg.winsize, "right")
        with stage_scope("wta"):
            disp_r = wta.wta(vol_r, "min")
    if cfg.run_post:
        with stage_scope("post"):
            disp_final, occl, mism = sad_post(disp_l, disp_r, cfg)
    result = StereoResult(disp_l, disp_r, disp_final, occl, mism)
    if return_stages:
        stages = {"cost_left": vol_l}
        if vol_r is not None:
            stages["cost_right"] = vol_r
        return result, stages
    return result
