"""Standalone image filters.

Covers the reference's dormant bilateral-filter surface: `bilateralfiter`
(`ASW/ASW.h:260-327`, exercised by the uncompiled `ASW/TeddyBilateral.cpp`
driver) and the 1/3-channel variants in `ASW/BiliteralFilter.h:49-242`
(not part of any .vcxproj).  The reference implementation stores float
weights into uchar masks and normalizes after rounding (`ASW.h:296-300`) —
catalogued bugs; this is the intended bilateral: per-channel range weight
``exp(-dI^2 / 2 sigma_c^2)`` x spatial Gaussian, normalized per channel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.ops.volume import _space_mask


def bilateral_filter(
    img: jax.Array,
    radius: int = 12,
    space_sigma: float = 50.0,
    color_sigma: float = 30.0,
) -> jax.Array:
    """Edge-preserving bilateral smoothing, gray [H, W] or color [H, W, C].

    Replicate-padded borders (`copyMakeBorder(BORDER_REPLICATE)`,
    `ASW.h:267`); each channel weighted independently
    (`BiliteralFilter.h:146-238` 3-channel loop).  Output stays float;
    callers quantize for display (the reference clamps to 255 then casts,
    `ASW.h:318-323`).
    """
    squeeze = img.ndim == 2
    x = img.astype(jnp.float32)
    if squeeze:
        x = x[..., None]
    h, w, c = x.shape
    side = 2 * radius + 1

    xp = jnp.pad(x, ((radius,) * 2, (radius,) * 2, (0, 0)), mode="edge")
    space = _space_mask(radius, space_sigma).reshape(-1)
    offsets = jnp.stack(
        jnp.meshgrid(jnp.arange(side), jnp.arange(side), indexing="ij"), -1
    ).reshape(-1, 2)
    inv2sc = 1.0 / (2.0 * color_sigma * color_sigma)
    center = jax.lax.dynamic_slice(xp, (radius, radius, 0), (h, w, c))

    def step(carry, xs):
        num, den = carry
        (dy, dx), sp = xs
        sh = jax.lax.dynamic_slice(xp, (dy, dx, 0), (h, w, c))
        wgt = jnp.exp(-((sh - center) ** 2) * inv2sc) * sp
        return (num + wgt * sh, den + wgt), None

    num0 = jnp.zeros((h, w, c), jnp.float32)
    den0 = jnp.zeros((h, w, c), jnp.float32)
    (num, den), _ = jax.lax.scan(step, (num0, den0), (offsets, space))
    out = num / jnp.maximum(den, 1e-20)
    return out[..., 0] if squeeze else out
