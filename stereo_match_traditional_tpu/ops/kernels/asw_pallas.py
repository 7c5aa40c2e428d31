"""Pallas TPU kernel for the adaptive-support-weight cost volume.

The FLOP-heaviest op in the framework (SURVEY.md §2.6: 25x25 window x 60
disparities per pixel, `ASW/ASW.h:210-257,329-431`) and the designated
first speed-of-light target (SURVEY.md §7 step 3).

Why a kernel: the jnp reference (`ops.volume.asw_volume`) scans over the
(2R+1)^2 window offsets carrying [D, H, W] accumulators — XLA keeps that
80 MB carry in HBM, so 625 steps move ~100 GB.  Here each grid tile DMAs
its left-image window and per-disparity shifted right stack into VMEM once
and accumulates entirely on-chip; HBM traffic collapses to ~2x the volume
size.

Mosaic constraints shape the design: dynamic offsets along the 128-lane
axis must be provably 128-aligned, so

* the per-d horizontal shifts are materialized *outside* the kernel as a
  `shifted_stack` in HBM and brought in with per-tile async copies (DMAs
  take arbitrary offsets);
* the window's horizontal offsets are a statically unrolled loop (static
  lane rotations), while the vertical offsets stay a `fori_loop` (dynamic
  sublane offsets are fine).

Weight algebra (exactly the reference's product, fused into one
transcendental per (pixel, offset, d)):

    w = exp(-dL^2/2sc^2) * exp(-dR^2/2sc^2) * exp(-|o|^2/2ss^2)^2
      = exp(-(dL^2 + dR^2)/2sc^2 - |o|^2/ss^2)

(`bilateralfiterWight` multiplies the space mask into *both* the left and
right masks — `ASW/ASW.h:222-248` — hence the squared space term.)

Why the fused form and not the reference's factored wL(p,o)*wR(p-d,o)
(`ASW.h:222-248`), which needs D-fold fewer exps?  Both measured dead
ends on v5e (Teddy 450x375, D=60, left volume):

* exp ablation: deleting the exp from this kernel entirely leaves the
  runtime unchanged (78.7 vs 78.0 ms) — the transcendental pipelines for
  free behind the surrounding vector ops, so reducing exp *count* cannot
  help; the kernel is bound by its ~9 essential VPU ops per
  (pixel, offset, d).
* factored rewrite (measured, then reverted — see git history): computing
  aL/aR once per (pixel, offset) at pixel rank and realizing
  w = aL * aR(p-d) via per-d static lane slices of the unshifted right
  tile removes ~5 D-rank arithmetic ops but adds 2 unaligned 128-wide
  lane-slice extractions per (offset, d) to build the shifted stacks
  in-register.  Mosaic lowers each unaligned lane slice to ~2-3
  rotate/select vreg ops, which costs more than the arithmetic it saves:
  113.4 ms vs 78.0 ms fused (bit-accurate to 4e-6 relative).  The HBM
  shifted stack below is precisely what makes the per-d shifts free (the
  DMA engine does them), at the price of recomputing dR at D-rank — the
  cheaper side of the trade on this hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_match_traditional_tpu.ops.volume import border_fill, shifted_stack

_TH = 8     # sublane tile rows
_TW = 128   # lane tile cols


def _scr_h(radius: int) -> int:
    return -(-(_TH + 2 * radius) // 8) * 8       # sublane-aligned scratch rows


def _scr_w(radius: int) -> int:
    return -(-(_TW + 2 * radius) // 128) * 128   # lane-aligned scratch cols


def _asw_kernel(
    l_hbm, s_hbm, out_ref, l_scr, rs_scr, num_ref, den_ref, sem,
    *, radius: int, disp_range: int, inv2sc: float, inv_ss: float, trunc: float,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    r = radius
    side = 2 * r + 1
    sh, sw = _scr_h(r), _scr_w(r)

    # copy slice shapes must be (8, 128)-tile aligned; the scratch is padded
    # accordingly and only its leading (TH+2r, TW+2r) window is ever read.
    cp_l = pltpu.make_async_copy(
        l_hbm.at[pl.ds(i * _TH, sh), pl.ds(j * _TW, sw)], l_scr, sem.at[0]
    )
    cp_s = pltpu.make_async_copy(
        s_hbm.at[:, pl.ds(i * _TH, sh), pl.ds(j * _TW, sw)], rs_scr, sem.at[1]
    )
    cp_l.start()
    cp_s.start()
    cp_l.wait()
    cp_s.wait()

    l_c = l_scr[r : r + _TH, r : r + _TW]                   # [TH, TW]
    rs_c = rs_scr[:, r : r + _TH, r : r + _TW]              # [D, TH, TW]

    # Mosaic requires dynamic slice offsets to be tile-aligned in both minor
    # dims.  Vertical window offsets advance by *rolling* the VMEM-resident
    # tiles one row per fori iteration (static shift); horizontal offsets
    # are a statically unrolled loop of static lane slices (compiled to lane
    # rotations).  Structure variants measured on v5e: per-offset lane-roll
    # carries 96 ms, ref-accumulate-per-offset 78 ms, chunked flushes 78 ms,
    # TH=16 78 ms — the plateau is the rotate+exp floor, 3.4x the XLA scan.
    num_ref[:] = jnp.zeros((disp_range, _TH, _TW), jnp.float32)
    den_ref[:] = jnp.zeros((disp_range, _TH, _TW), jnp.float32)

    def dy_body(dy, carry):
        l_cur, rs_cur = carry
        vspace = ((dy - r) * (dy - r)).astype(jnp.float32)
        l_top = l_cur[0:_TH, :]                             # [TH, SW]
        rs_top = rs_cur[:, 0:_TH, :]                        # [D, TH, SW]
        # chunked value accumulation: Mosaic keeps every unrolled
        # iteration's temporaries live on the scoped-VMEM stack (a full
        # 25-wide value chain OOMs at ~28 MB); 6-wide chunks flushed to
        # scratch refs stay under the 16 MB budget.
        chunk = 6
        for c0 in range(0, side, chunk):
            num = jnp.zeros((disp_range, _TH, _TW), jnp.float32)
            den = jnp.zeros((disp_range, _TH, _TW), jnp.float32)
            for dx in range(c0, min(c0 + chunk, side)):
                l_o = l_top[:, dx : dx + _TW]
                r_o = rs_top[:, :, dx : dx + _TW]
                dl = l_o - l_c                              # [TH, TW]
                dr = r_o - rs_c                             # [D, TH, TW]
                space = vspace + float((dx - r) * (dx - r))
                w = jnp.exp(
                    -(dl[None] * dl[None] + dr * dr) * inv2sc - space * inv_ss
                )
                e = jnp.minimum(jnp.abs(l_o[None] - r_o), trunc)
                num = num + w * e
                den = den + w
            num_ref[:] += num
            den_ref[:] += den
        # up-by-one row advance (roll shift must be non-negative)
        return pltpu.roll(l_cur, sh - 1, 0), pltpu.roll(rs_cur, sh - 1, 1)

    jax.lax.fori_loop(0, side, dy_body, (l_scr[:], rs_scr[:]))
    out_ref[:] = num_ref[:] / jnp.maximum(den_ref[:], 1e-20)


@functools.partial(
    jax.jit,
    static_argnames=(
        "disp_range", "win_size", "space_sigma", "color_sigma", "truncation",
        "interpret",
    ),
)
def _asw_pallas_left(
    left: jax.Array,
    right: jax.Array,
    disp_range: int,
    win_size: int,
    space_sigma: float,
    color_sigma: float,
    truncation: float,
    interpret: bool = False,
) -> jax.Array:
    radius = win_size + 1
    h, w = left.shape
    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW
    sh, sw = _scr_h(radius), _scr_w(radius)
    # padded input extents so the last tile's aligned (sh, sw) copy slice
    # stays in bounds: rows hp - TH + sh, cols wp - TW + sw
    bot = (hp - _TH + sh) - h - radius
    rgt = (wp - _TW + sw) - w - radius

    lf = left.astype(jnp.float32)
    rf = right.astype(jnp.float32)
    lp = jnp.pad(lf, ((radius, bot), (radius, rgt)), "edge")
    rp = jnp.pad(rf, ((radius, bot), (radius, rgt)), "edge")
    # HBM shifted stack: S[d] = rp shifted by d with left-edge clamping —
    # identical semantics to `ops.volume.shifted_stack` (clip at padded col
    # 0); the d > j border triangle is overwritten by border_fill below.
    s = shifted_stack(rp, disp_range, "left")

    grid = (hp // _TH, wp // _TW)
    kernel = functools.partial(
        _asw_kernel,
        radius=radius,
        disp_range=disp_range,
        inv2sc=1.0 / (2.0 * color_sigma * color_sigma),
        inv_ss=1.0 / (space_sigma * space_sigma),
        trunc=float(truncation),
    )
    vol = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # lp stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # shifted stack in HBM
        ],
        out_specs=pl.BlockSpec(
            (disp_range, _TH, _TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((disp_range, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.VMEM((disp_range, sh, sw), jnp.float32),
            pltpu.VMEM((disp_range, _TH, _TW), jnp.float32),
            pltpu.VMEM((disp_range, _TH, _TW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lp, s)
    return border_fill(vol[:, :h, :w], "left")


def asw_volume_pallas(
    left: jax.Array,
    right: jax.Array,
    disp_range: int,
    win_size: int = 11,
    space_sigma: float = 50.0,
    color_sigma: float = 30.0,
    truncation: float = 40.0,
    view: str = "left",
    interpret: bool = None,
) -> jax.Array:
    """Drop-in replacement for `ops.volume.asw_volume` (`ASW/ASW.h:329-431`).

    ``interpret=None`` auto-selects interpreter mode off-TPU (CPU tests run
    the same kernel through the Pallas interpreter, SURVEY.md §4).
    The right view reuses the left kernel through the mirror identity
    (`ops.volume.asw_volume_right`).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if view == "right":
        lf = jnp.asarray(left)[:, ::-1]
        rf = jnp.asarray(right)[:, ::-1]
        vol = _asw_pallas_left(
            rf, lf, disp_range, win_size, space_sigma, color_sigma, truncation,
            interpret,
        )
        return vol[:, :, ::-1]
    return _asw_pallas_left(
        jnp.asarray(left), jnp.asarray(right), disp_range, win_size,
        space_sigma, color_sigma, truncation, interpret,
    )
