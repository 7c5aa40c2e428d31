"""NCC window-matching pipeline (`NCC/NCC_main.cpp:8-60`)."""

from __future__ import annotations

import jax.numpy as jnp

from stereo_match_traditional_tpu.config import NCCConfig
from stereo_match_traditional_tpu.models.base import StereoResult
from stereo_match_traditional_tpu.ops import volume, wta
from stereo_match_traditional_tpu.utils.profiling import stage_scope


def ncc_pipeline(
    left, right, cfg: NCCConfig = NCCConfig(), return_stages: bool = False
) -> StereoResult:
    """21x21 NCC similarity volume -> argmax WTA (`NCC/NCC.h:69-95`).

    Border pixels outside the loop range (`NCC.h:72-75`) keep 0 disparity
    (the `Mat::zeros` init at `NCC_main.cpp:20`).

    ``cfg.variant='shifted'`` runs the dormant whole-image shifted-NCC
    alternative (`NCC.h:117-272`, disabled at `NCC_main.cpp:24`) whose
    output is the display-scaled depth ``best_offset * 3``.
    """
    if cfg.variant == "shifted":
        with stage_scope("cost_volume"):
            depth = volume.ncc_shifted_depth(
                left, right, cfg.alt_max_offset, cfg.alt_kernel, "left",
                cfg.alt_add_constant, cfg.alt_depth_scale,
            )
        result = StereoResult(depth)
        return (result, {}) if return_stages else result
    with stage_scope("cost_volume"):
        vol, interior = volume.ncc_volume(
            left, right, cfg.disp_range, cfg.win_size, cfg.invalid_mode, cfg.eps
        )
    # zero-variance windows are masked to the never-wins value inside
    # ncc_volume (the reference's NaN-never-wins semantics, `NCC.h:46,59`)
    with stage_scope("wta"):
        disp = wta.wta(vol, "max")
        disp = jnp.where(interior, disp, 0.0)
    result = StereoResult(disp)
    if return_stages:
        return result, {"cost_left": vol}
    return result
