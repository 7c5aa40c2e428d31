"""Shared pipeline result container.

Every pipeline is a pure jittable function
``(left_gray, right_gray, cfg[, color]) -> StereoResult`` — the functional
re-design of the reference's five `main()` drivers (SURVEY.md §3: the whole
control flow is `(imgL, imgR, params) -> (dispL, dispR, masks)`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class StereoResult(NamedTuple):
    disp_left: jax.Array
    disp_right: Optional[jax.Array] = None
    disp_final: Optional[jax.Array] = None
    occlusion: Optional[jax.Array] = None
    mismatch: Optional[jax.Array] = None
