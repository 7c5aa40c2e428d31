"""Single-chip memory-bounded streaming over row bands.

The reference allocates every volume densely and is capped by host RAM
(`AD-CensusV1/main.cpp:35-44` mallocs 6 full float volumes).  On TPU the
dense [D, H, W] volume also caps the image size: 4K at D=256 is 8.5 GB per
volume — several live intermediates exceed the 16 GB HBM.  This runner
reuses the row-tile cores of :mod:`parallel.tiled` (same exact halos from
`receptive_field_rows`) but iterates the bands *sequentially inside one
XLA program* (`lax.map`) instead of sharding them over devices, so only
one band's intermediates are ever live.  That makes single-chip 4K/D=256
runs possible (and keeps every gather source under the on-chip fast-source
cliff, see `aggregate._rect_sums_shared_bounds`).

Scanline configs are rejected: the 4-path optimizer needs the full
aggregated volume (its vertical recurrences span all rows); use
`tiled_pipeline` (cross-tile scan carries) or the untiled pipeline.

Equality: band-local SAT cumsums accumulate in a different order than the
full-image ones, so results match the untiled pipeline up to argmin tie
flips on near-exact cost ties (same envelope as the tiled invariance
tests); SAD is exact (no resharded reduction feeds its argmin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from stereo_match_traditional_tpu.models.base import StereoResult
from stereo_match_traditional_tpu.parallel.tiled import (
    _check_tiled_support,
    _POST,
    _TILE_CORES,
    receptive_field_rows,
)


def streamed_pipeline(name: str, cfg, row_tile: int = 128):
    """Build a jittable ``(left, right) -> StereoResult`` running ``name``
    over sequential row bands of ``row_tile`` rows (plus exact halos).

    Peak live memory ~ one band's cost volume
    (``D x (row_tile + 2*halo) x W`` floats, double-buffered by XLA)
    instead of the full ``D x H x W`` volume.
    """
    _check_tiled_support(name, cfg)
    if getattr(cfg, "scanline", None) is not None:
        raise NotImplementedError(
            "streamed execution cannot run the scanline optimizer (full-"
            "image vertical recurrence); use tiled_pipeline or the untiled"
            " pipeline"
        )
    core = _TILE_CORES[name]
    halo = receptive_field_rows(name, cfg)
    t = row_tile

    def run(left, right):
        h = left.shape[0]
        nb = -(-h // t)
        hp = nb * t
        pad = [(halo, hp - h + halo)] + [(0, 0)] * (left.ndim - 1)
        lp = jnp.pad(left, pad, mode="edge")
        rp = jnp.pad(right, pad, mode="edge")

        def band(b):
            le = lax.dynamic_slice_in_dim(lp, b * t, t + 2 * halo, 0)
            re = lax.dynamic_slice_in_dim(rp, b * t, t + 2 * halo, 0)
            return core(le, re, cfg, b * t - halo, h, halo, None)

        tiles = lax.map(band, jnp.arange(nb))

        def unband(x):
            return None if x is None else x.reshape((hp,) + x.shape[2:])[:h]

        disp_l = unband(tiles["disp_left"])
        disp_r = unband(tiles.get("disp_right"))

        disp_final = occl = mism = None
        if getattr(cfg, "run_post", False) and name in _POST:
            disp_final, occl, mism = _POST[name](disp_l, disp_r, cfg)
        return StereoResult(disp_l, disp_r, disp_final, occl, mism)

    return run


_STREAMED_CACHE = {}


def run_streamed(name: str, left, right, cfg=None, row_tile: int = 128) -> StereoResult:
    """One-shot convenience wrapper (compiled program cached per config)."""
    if cfg is None:
        from stereo_match_traditional_tpu.models.registry import get_pipeline

        cfg = get_pipeline(name)[1]()
    key = (name, cfg, row_tile)
    fn = _STREAMED_CACHE.get(key)
    if fn is None:
        fn = _STREAMED_CACHE[key] = jax.jit(streamed_pipeline(name, cfg, row_tile))
    return fn(jnp.asarray(left), jnp.asarray(right))
