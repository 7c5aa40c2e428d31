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

The legacy 4-path scanline optimizer streams too (VERDICT r2 item 2):
its horizontal passes are row-local, and the vertical recurrences carry
exactly ``(last aggregated row [D, W], its min [W])`` across bands — the
same carry `ops.scanline._scan_unrolled` returns.  Two band sweeps run
inside one XLA program: a backward `lax.scan` re-deriving each band's
aggregated volume and collecting the bottom-up pass's incoming carries
(only those [D, W] boundary rows are kept — never a full volume), then a
forward `lax.scan` that re-derives the volume once more, runs the two
horizontal passes plus both vertical band continuations, sums the four
directional volumes and WTAs.  The aggregation is computed twice per
band — the memory-for-FLOPs trade that makes scanline possible at sizes
where the dense [D, H, W] volume (8.5 GB at 4K/D=256) cannot exist.
The vertical band chains are bit-identical to the monolithic pass (the
recurrence is evaluated step-for-step in the same order; a d-constant
zero carry reproduces the path seed exactly), so streamed == direct up
to the band-local SAT tie-flip envelope below.

The canonical (cross_two_pass) tso-scheduled scanline is not streamed:
its per-(pixel, d) penalties need the D-deep matched-image stack per
band — use `gspmd_pipeline` or the untiled pipeline.

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
from stereo_match_traditional_tpu.ops import wta
from stereo_match_traditional_tpu.ops.scanline import (
    _directional_pass,
    directional_pass_banded,
)
from stereo_match_traditional_tpu.parallel.halo import crop_row_halo
from stereo_match_traditional_tpu.parallel.tiled import (
    _ad_census_band_volumes,
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
    if name == "ad_census" and cfg.aggregation == "cross_two_pass" and (
        cfg.scanline is not None or cfg.run_post
    ):
        raise NotImplementedError(
            "streamed execution does not implement the canonical "
            "(cross_two_pass) scanline/post: the tso-scheduled penalties "
            "need the D-deep matched-image stack per band and the region-"
            "voting post has 5x-arm reach; use tiled_pipeline (sharded "
            "canonical scanline + gathered canonical post), gspmd_pipeline "
            "or the untiled pipeline"
        )
    if getattr(cfg, "scanline", None) is not None:
        if name != "ad_census":
            raise NotImplementedError(
                f"streamed scanline is implemented for ad_census, not {name!r}"
            )
        return _ad_census_scanline_streamed(cfg, row_tile)
    core = _TILE_CORES[name]
    halo = receptive_field_rows(name, cfg)
    t = row_tile

    def run(left, right, *aux):
        # ``aux``: extra per-pair images banded like left/right (asw 'lab')
        h = left.shape[0]
        nb = -(-h // t)
        hp = nb * t

        def padded(x):
            pad = [(halo, hp - h + halo)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad, mode="edge")

        lp, rp = padded(left), padded(right)
        ap = tuple(padded(a) for a in aux)

        def band(b):
            le = lax.dynamic_slice_in_dim(lp, b * t, t + 2 * halo, 0)
            re = lax.dynamic_slice_in_dim(rp, b * t, t + 2 * halo, 0)
            ae = tuple(
                lax.dynamic_slice_in_dim(a, b * t, t + 2 * halo, 0) for a in ap
            )
            return core(le, re, cfg, b * t - halo, h, halo, None, ae)

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


def _ad_census_scanline_streamed(cfg, row_tile: int):
    """Full AD-Census — cost, aggregation, legacy 4-path scanline
    (`ScanlineOptimizer.h:104-253` semantics incl. both vertical quirk
    flags), WTA, optional post — over sequential row bands on one chip.

    See the module docstring for the two-sweep band-carry design.  Only
    ``O(nb * D * W)`` boundary carries and the ``[H, W]`` maps are ever
    materialized beyond one band's working set.
    """
    sl = cfg.scanline
    p1, p2_init = sl.effective_penalties(cfg.disp_range)
    vert_dm1 = not sl.faithful_vertical_l2
    vert_first = sl.faithful_vertical_p2
    halo = receptive_field_rows("ad_census", cfg)
    t = row_tile
    d = cfg.disp_range

    def p2_of(g_cur, g_ref):
        return jnp.maximum(p1, p2_init / (jnp.abs(g_cur - g_ref) + 1.0))

    def run(left, right):
        h, w = left.shape[:2]
        nb = -(-h // t)
        hp = nb * t
        pad = [(halo, hp - h + halo)] + [(0, 0)] * (left.ndim - 1)
        lp = jnp.pad(left, pad, mode="edge")
        rp = jnp.pad(right, pad, mode="edge")
        # path-start gray rows for the faithful_vertical_p2 ('first') quirk
        gf = lp[halo].astype(jnp.float32)          # global row 0
        gl = lp[halo + h - 1].astype(jnp.float32)  # global row h-1

        def band_parts(b):
            le = lax.dynamic_slice_in_dim(lp, b * t, t + 2 * halo, 0)
            re = lax.dynamic_slice_in_dim(rp, b * t, t + 2 * halo, 0)
            agg_l, agg_r = _ad_census_band_volumes(le, re, cfg, b * t - halo, h)
            agg_l = crop_row_halo(agg_l, halo, 1)   # [D, t, W]
            agg_r = crop_row_halo(agg_r, halo, 1)
            g = le[halo:halo + t].astype(jnp.float32)           # band rows
            gp = le[halo - 1:halo + t - 1].astype(jnp.float32)  # row above
            gn = le[halo + 1:halo + t + 1].astype(jnp.float32)  # row below
            return agg_l, agg_r, g, gp, gn

        def up_inputs(b, agg_l, g, gn):
            """(cost, p2, reset) of the bottom-up pass, band rows reversed.

            The up-path 'prev' of global row r is row r+1 (gn from the
            halo); reset marks the true last image row so the padded tail
            rows (present only when h is not a band multiple) cannot leak
            into the real path — the step swaps in the exact identity
            carry there.
            """
            c_up = jnp.transpose(agg_l, (1, 0, 2))[::-1]        # [t, D, W]
            p2_up = p2_of(g, gl[None] if vert_first else gn)[::-1]
            rows_g = b * t + jnp.arange(t)
            reset_up = (rows_g == h - 1)[::-1]
            return c_up, p2_up, reset_up

        zc = (jnp.zeros((d, w), jnp.float32), jnp.zeros((w,), jnp.float32))

        # Sweep 1 (backward over bands): chain the bottom-up vertical pass,
        # emitting each band's INCOMING carry.  agg_r and the band outputs
        # are unused here and dead-code-eliminated by XLA — only the carry
        # chain's steps execute.
        def sweep_up(carry, b_rev):
            b = nb - 1 - b_rev
            agg_l, _, g, _, gn = band_parts(b)
            c_up, p2_up, reset_up = up_inputs(b, agg_l, g, gn)
            _, new_carry = directional_pass_banded(
                c_up, p2_up, carry, reset_up, p1, vert_dm1
            )
            return new_carry, carry

        _, up_in_rev = lax.scan(sweep_up, zc, jnp.arange(nb))
        up_in = jax.tree_util.tree_map(lambda a: a[::-1], up_in_rev)

        # Sweep 2 (forward): re-derive the band volume, run the two
        # horizontal passes (row-local) + both vertical continuations,
        # sum the four directional volumes, WTA both views.
        def sweep_down(carry, xs):
            b, up_c = xs
            agg_l, agg_r, g, gp, gn = band_parts(b)
            c_wdt = jnp.transpose(agg_l, (2, 0, 1))             # [W, D, t]
            g_wt = g.T
            lr_, _ = _directional_pass(c_wdt, g_wt, p1, p2_init, True)
            rl_, _ = _directional_pass(c_wdt[::-1], g_wt[::-1], p1, p2_init, True)
            horiz = jnp.transpose(lr_ + rl_[::-1], (2, 1, 0))   # [t, D, W]
            c_dn = jnp.transpose(agg_l, (1, 0, 2))              # [t, D, W]
            p2_dn = p2_of(g, gf[None] if vert_first else gp)
            down, carry = directional_pass_banded(
                c_dn, p2_dn, carry, None, p1, vert_dm1
            )
            c_up, p2_up, reset_up = up_inputs(b, agg_l, g, gn)
            up, _ = directional_pass_banded(
                c_up, p2_up, up_c, reset_up, p1, vert_dm1
            )
            total = horiz + down + up[::-1]                     # [t, D, W]
            disp_l = wta.wta(jnp.transpose(total, (1, 0, 2)), "min")
            disp_r = wta.wta(agg_r, "min")
            return carry, (disp_l, disp_r)

        _, (dls, drs) = lax.scan(sweep_down, zc, (jnp.arange(nb), up_in))
        disp_l = dls.reshape(hp, w)[:h]
        disp_r = drs.reshape(hp, w)[:h]
        disp_final = occl = mism = None
        if cfg.run_post:
            disp_final, occl, mism = _POST["ad_census"](disp_l, disp_r, cfg)
        return StereoResult(disp_l, disp_r, disp_final, occl, mism)

    return run


_STREAMED_CACHE = {}


def run_streamed(
    name: str, left, right, cfg=None, row_tile: int = 128, aux=()
) -> StereoResult:
    """One-shot convenience wrapper (compiled program cached per config)."""
    if cfg is None:
        from stereo_match_traditional_tpu.models.registry import get_pipeline

        cfg = get_pipeline(name)[1]()
    key = (name, cfg, row_tile)
    fn = _STREAMED_CACHE.get(key)
    if fn is None:
        fn = _STREAMED_CACHE[key] = jax.jit(streamed_pipeline(name, cfg, row_tile))
    return fn(jnp.asarray(left), jnp.asarray(right), *(jnp.asarray(a) for a in aux))
