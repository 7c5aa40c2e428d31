"""Cost-volume construction (layer L1).

All volumes are dense ``[D, H, W]`` float32 arrays.  ``W`` sits on the TPU
128-lane axis and each disparity slice is a contiguous image, so elementwise
fusion, box sums (MXU banded matmuls) and the WTA reduction over axis 0 all
map cleanly onto the hardware.  The reference stores ``[row, col, disp]``
(`AD-CensusV1/AD-Census.h:87`); with D=60 that would waste the lane axis.

Border semantics: the reference copies the previous-d cost when the match
column underflows (`SAD/Sad.h:125-128`, `AD-Census.h:88-92`).  Recursively
that equals evaluating the cost at the last valid disparity ``min(d, j)``
(or ``min(d, W-1-j)`` for right-view volumes), which is what
:func:`border_fill` implements as a gather — no sequential scan needed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

INVALID = jnp.inf


# ---------------------------------------------------------------------------
# shifted stacks & border fill
# ---------------------------------------------------------------------------


def shifted_stack(
    img: jax.Array, disp_range: int, view: str = "left", d_offset: int = 0
) -> jax.Array:
    """Stack of horizontally shifted copies: ``S[d, i, j]``.

    view='left':  ``S[d, i, j] = img[i, max(j - d, 0)]``   (search leftward,
    matching `SAD/Sad.h:130` / `AD-Census.h:95`).
    view='right': ``S[d, i, j] = img[i, min(j + d, W-1)]`` (mirror search,
    `SAD/Sad.h:173` / `AD-Census.h:123`).

    ``d_offset`` shifts the disparity block — a disparity-sharded device
    builds its local slice ``d in [d_offset, d_offset + disp_range)``
    (parallel.tiled.ad_census_tile_disp).
    """
    w = img.shape[-1]
    cols = jnp.arange(w)[None, :]
    ds = jnp.arange(disp_range)[:, None] + d_offset
    if view == "left":
        idx = jnp.clip(cols - ds, 0, w - 1)  # [D, W]
    elif view == "right":
        idx = jnp.clip(cols + ds, 0, w - 1)
    else:
        raise ValueError(view)
    # img [..., H, W] -> take over last axis with [D, W] indices -> [..., H, D, W]
    out = jnp.take(img, idx, axis=-1)
    return jnp.moveaxis(out, -2, 0)


def border_fill(vol: jax.Array, view: str = "left") -> jax.Array:
    """Replace the invalid triangle with the last-valid-d cost.

    Equivalent to the reference's ``cost[d] = cost[d-1]`` copy at
    out-of-range disparities (`SAD/Sad.h:125-128`, `ASW/ASW.h:371`,
    `AD-Census.h:88-92`): ``out[d, i, j] = vol[min(d, j), i, j]`` for the
    left view and ``min(d, W-1-j)`` for the right view.
    """
    d, _, w = vol.shape
    cols = jnp.arange(w)[None, :]
    ds = jnp.arange(d)[:, None]
    limit = cols if view == "left" else (w - 1 - cols)
    eff = jnp.minimum(ds, limit)  # [D, W]
    return jnp.take_along_axis(vol, eff[:, None, :], axis=0)


# ---------------------------------------------------------------------------
# MXU box sums
# ---------------------------------------------------------------------------


def _band_matrix(n_in: int, n_out: int, radius: int, dtype=jnp.float32) -> jax.Array:
    """0/1 banded matrix B ``[n_in, n_out]`` with ``B[p, i] = 1`` iff
    ``i <= p <= i + 2*radius`` — a window sum as a matmul (runs on the MXU)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
    return ((p >= i) & (p <= i + 2 * radius)).astype(dtype)


def box_sum_valid(x: jax.Array, radius_r: int, radius_c: int) -> jax.Array:
    """Sum over (2rr+1)x(2rc+1) windows, 'valid' mode.

    ``x`` is ``[..., Hp, Wp]`` (already padded); output is
    ``[..., Hp-2rr, Wp-2rc]``.  Implemented as two banded matmuls so the
    reduction runs on the MXU instead of scalar window loops
    (`SAD/Sad.h:15-20` does this per-pixel with OpenCV Mat slicing).
    """
    hp, wp = x.shape[-2], x.shape[-1]
    h, w = hp - 2 * radius_r, wp - 2 * radius_c
    br = _band_matrix(hp, h, radius_r, x.dtype)
    bc = _band_matrix(wp, w, radius_c, x.dtype)
    t = jnp.einsum("ph,...pq->...hq", br, x, preferred_element_type=jnp.float32)
    return jnp.einsum("...hq,qw->...hw", t, bc, preferred_element_type=jnp.float32)


def box_sum_same(x: jax.Array, radius_r: int, radius_c: int) -> jax.Array:
    """Box sum with zero padding, output same shape as input."""
    pad = [(0, 0)] * (x.ndim - 2) + [(radius_r, radius_r), (radius_c, radius_c)]
    return box_sum_valid(jnp.pad(x, pad), radius_r, radius_c)


def replicate_pad(img: jax.Array, pad_r: int, pad_c: int = None) -> jax.Array:
    """Device-side `copyMakeBorder(BORDER_REPLICATE)` on the last two axes."""
    if pad_c is None:
        pad_c = pad_r
    width = [(0, 0)] * (img.ndim - 2) + [(pad_r, pad_r), (pad_c, pad_c)]
    return jnp.pad(img, width, mode="edge")


# ---------------------------------------------------------------------------
# AD cost
# ---------------------------------------------------------------------------


def ad_volume(
    left: jax.Array,
    right: jax.Array,
    disp_range: int,
    view: str = "left",
    d_offset: int = 0,
) -> jax.Array:
    """Pixelwise absolute-difference volume (`AD-Census.h:75-129`,
    `CBLSM/CBLSM.h:327-381`).

    The reference's previous-d copy at the border coincides exactly with the
    clamped-column gather for a pixelwise cost, so no fill pass is needed —
    which also makes any d-slice (``d_offset`` != 0) locally computable.
    """
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    if view == "left":
        return jnp.abs(left[None] - shifted_stack(right, disp_range, "left", d_offset))
    return jnp.abs(shifted_stack(left, disp_range, "right", d_offset) - right[None])


# ---------------------------------------------------------------------------
# SAD cost
# ---------------------------------------------------------------------------


def sad_volume(
    left: jax.Array, right: jax.Array, disp_range: int, winsize: int, view: str = "left",
    mean: bool = False,
) -> jax.Array:
    """Windowed SAD volume (`SAD/Sad.h:96-182`; mean variant
    `CBLSM/CBLSM.h:409-489` via ``sadvalueMean`` `CBLSM.h:17-22`).

    ``winsize`` follows the reference driver convention: the actual radius is
    ``winsize + 1`` (`SAD/Sad.h:109`), i.e. a 9x9 window for winsize=3.
    Inputs are the *unpadded* images; replicate padding happens here
    (`SAD/SADmain.cpp:47-48`).
    """
    r = winsize + 1
    lp = replicate_pad(left.astype(jnp.float32), r)
    rp = replicate_pad(right.astype(jnp.float32), r)
    if view == "left":
        stack = shifted_stack(rp, disp_range, "left")
        diff = jnp.abs(lp[None] - stack)
    else:
        stack = shifted_stack(lp, disp_range, "right")
        diff = jnp.abs(stack - rp[None])
    vol = box_sum_valid(diff, r, r)
    if mean:
        vol = vol / float((2 * r + 1) ** 2)
    return border_fill(vol, view)


# ---------------------------------------------------------------------------
# NCC cost
# ---------------------------------------------------------------------------


def ncc_interior_mask(
    h: int, w: int, win_size: int, row_offset: int = 0, global_rows: int = None
) -> jax.Array:
    """Pixels the NCC reference actually computes (loop bounds
    `NCC/NCC.h:72-75`); everything else keeps 0 disparity from `Mat::zeros`
    (`NCC_main.cpp:20`).  ``row_offset``/``global_rows`` let a row tile use
    global bounds (parallel.tiled)."""
    if global_rows is None:
        global_rows = h
    rows = jnp.arange(h) + row_offset
    cols = jnp.arange(w)
    return (
        (rows[:, None] >= win_size)
        & (rows[:, None] < global_rows - win_size)
        & (cols[None, :] >= win_size)
        & (cols[None, :] < w - win_size)
    )


def ncc_volume(
    left: jax.Array,
    right: jax.Array,
    disp_range: int,
    win_size: int,
    invalid_mode: str = "ignore",
    eps: float = 1e-12,
    row_offset: int = 0,
    global_rows: int = None,
) -> Tuple[jax.Array, jax.Array]:
    """Normalized cross-correlation volume (`NCC/NCC.h:15-95`).

    Returns ``(volume, interior_mask)``.  The volume holds the correlation
    coefficient in [-1, 1] (`NCC.h:46`); invalid (d, j) entries — where the
    right window would cross the left edge (`NCC.h:81-89`) — get -2 under
    ``invalid_mode='ignore'`` so argmax never selects them, or +255 under
    ``'sentinel'`` to reproduce the reference quirk where the 0xff sentinel
    wins the similarity argmax (`NCC.h:59,88` — catalogued to fix, not copy).
    Pixels outside the interior mask are not computed by the reference
    (loop bounds `NCC.h:72-75`) and read 0 disparity from `Mat::zeros`.
    """
    w = win_size
    n = float((2 * w + 1) ** 2)
    lf = left.astype(jnp.float32)
    rf = right.astype(jnp.float32)
    h, wd = lf.shape

    sum_l = box_sum_same(lf, w, w)
    sum_l2 = box_sum_same(lf * lf, w, w)
    sum_r = box_sum_same(rf, w, w)
    sum_r2 = box_sum_same(rf * rf, w, w)

    s_r = shifted_stack(rf, disp_range, "left")           # [D, H, W]
    sum_lr = box_sum_same(lf[None] * s_r, w, w)           # [D, H, W]
    sum_r_d = shifted_stack(sum_r, disp_range, "left")
    sum_r2_d = shifted_stack(sum_r2, disp_range, "left")

    # numerator = sum((L-mL)(R-mR)) = sum(LR) - sumL*sumR/n
    num = sum_lr - sum_l[None] * sum_r_d / n
    var_l = jnp.maximum(sum_l2 - sum_l * sum_l / n, 0.0)
    var_r = jnp.maximum(sum_r2_d - sum_r_d * sum_r_d / n, 0.0)
    ncc = num / jnp.sqrt(jnp.maximum(var_l[None] * var_r, eps))

    cols = jnp.arange(wd)[None, None, :]
    ds = jnp.arange(disp_range)[:, None, None]
    valid = (cols - w - ds) >= 0                          # NCC.h:81
    sentinel = 255.0 if invalid_mode == "sentinel" else -2.0
    vol = jnp.where(valid, ncc, sentinel)

    interior = ncc_interior_mask(h, wd, w, row_offset, global_rows)
    return vol, interior


# ---------------------------------------------------------------------------
# Census transform + Hamming volume
# ---------------------------------------------------------------------------


def census_transform(
    img: jax.Array,
    rows: int = 9,
    cols: int = 3 * 2 + 1,
    row_offset: int = 0,
    global_rows: int = None,
) -> Tuple[jax.Array, jax.Array]:
    """Census signature per pixel as two int32 words (hi: first 31 offsets,
    lo: remaining 32) for a rows x cols neighborhood.

    Bit semantics follow `AD-Census.h:166-192`: for each offset in row-major
    order the code shifts left and gains a 1 iff ``center > neighbor`` and
    the neighbor is inside the image (out-of-image bits stay 0,
    `AD-Census.h:173-174`).  The center offset participates (always 0).

    ``row_offset``/``global_rows`` let a row tile inside `shard_map` use
    *global* image bounds for the out-of-image bit, so a halo-exchanged
    tiled run is bit-identical to the untiled run (parallel.tiled).
    """
    rr, rc = rows // 2, cols // 2
    h, w = img.shape
    if global_rows is None:
        global_rows = h
    x = img.astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + row_offset
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    total = rows * cols
    hi = jnp.zeros((h, w), jnp.int32)
    lo = jnp.zeros((h, w), jnp.int32)
    k = 0
    for r in range(-rr, rr + 1):
        for c in range(-rc, rc + 1):
            shifted = jnp.roll(x, shift=(-r, -c), axis=(0, 1))
            inb = (
                (row_ids + r >= 0)
                & (row_ids + r < global_rows)
                & (col_ids + c >= 0)
                & (col_ids + c < w)
            )
            bit = ((x > shifted) & inb).astype(jnp.int32)
            if k < total - 32:
                hi = hi * 2 + bit
            else:
                lo = lo * 2 + bit
            k += 1
    return hi, lo


def _popcount(x: jax.Array) -> jax.Array:
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def census_volume(
    left: jax.Array,
    right: jax.Array,
    disp_range: int,
    rows: int = 9,
    cols: int = 7,
    view: str = "left",
    row_offset: int = 0,
    global_rows: int = None,
    d_offset: int = 0,
) -> jax.Array:
    """Hamming-distance census volume (`AD-Census.h:142-269`).

    The reference recomputes the right-image signature per (pixel, d) with
    per-neighbor column clamping to 0 (`AD-Census.h:160,178`); here the
    signatures are computed once and gathered at the clamped match column —
    identical except inside the d > j invalid triangle (documented deviation;
    parity is checked at the bad-pixel-rate level, SURVEY.md §7).
    """
    hi_l, lo_l = census_transform(left, rows, cols, row_offset, global_rows)
    hi_r, lo_r = census_transform(right, rows, cols, row_offset, global_rows)
    if view == "left":
        hi_s = shifted_stack(hi_r, disp_range, "left", d_offset)
        lo_s = shifted_stack(lo_r, disp_range, "left", d_offset)
        ham = _popcount(hi_l[None] ^ hi_s) + _popcount(lo_l[None] ^ lo_s)
    else:
        hi_s = shifted_stack(hi_l, disp_range, "right", d_offset)
        lo_s = shifted_stack(lo_l, disp_range, "right", d_offset)
        ham = _popcount(hi_s ^ hi_r[None]) + _popcount(lo_s ^ lo_r[None])
    return ham.astype(jnp.float32)


def ad_census_volume(
    left: jax.Array,
    right: jax.Array,
    disp_range: int,
    sigma_c: float = 10.0,
    sigma_s: float = 30.0,
    census_rows: int = 9,
    census_cols: int = 7,
    view: str = "left",
    row_offset: int = 0,
    global_rows: int = None,
    d_offset: int = 0,
) -> jax.Array:
    """Fused AD-Census cost (`AD-Census.h:271-318`):
    ``(1 - exp(-AD/sigmaC)) + (1 - exp(-census/sigmaS))``."""
    ad = ad_volume(left, right, disp_range, view, d_offset)
    cen = census_volume(
        left, right, disp_range, census_rows, census_cols, view,
        row_offset, global_rows, d_offset,
    )
    return (1.0 - jnp.exp(-ad / sigma_c)) + (1.0 - jnp.exp(-cen / sigma_s))


# ---------------------------------------------------------------------------
# ASW (adaptive support weight) cost
# ---------------------------------------------------------------------------


def _space_mask(radius: int, space_sigma: float) -> jax.Array:
    """Gaussian proximity mask over the support window
    (`ASW/ASW.h:16-35`; never normalized — the sum at `ASW.h:32` is unused)."""
    ax = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2.0 * space_sigma**2))
    return g


def asw_volume(
    left: jax.Array,
    right: jax.Array,
    disp_range: int,
    win_size: int = 11,
    space_sigma: float = 50.0,
    color_sigma: float = 30.0,
    truncation: float = 40.0,
    view: str = "left",
) -> jax.Array:
    """Adaptive-support-weight cost volume (`ASW/ASW.h:210-257,329-431`).

    cost(p, d) = sum_o wL(p,o) * wR(p-d,o) * e(p,o,d) / sum_o wL*wR with
    w(p,o) = exp(-|I(p)-I(p+o)|^2 / 2 sigma_c^2) * exp(-|o|^2 / 2 sigma_s^2)
    and e = min(|L(p+o) - R(p+o-d)|, T) (truncation applied to the uchar
    error before weighting, `ASW.h:358-366`).  The reference looks up the
    color term in a 256-entry LUT of exactly this exponential
    (`ASW.h:41-47`) — computed directly here.

    This is the jnp reference implementation: a `lax.scan` over the
    (2R+1)^2 window offsets with fully vectorized [D, H, W] work per step.
    The Pallas kernel in ``ops.kernels.asw_pallas`` is the fast path.

    Inputs are unpadded uint8/float grayscale; replicate padding (radius+? )
    matches `ASW/ASWeight.cpp:54-55` (pad = win_size + 1 = radius).
    """
    radius = win_size + 1
    lf = left.astype(jnp.float32)
    rf = right.astype(jnp.float32)
    h, w = lf.shape

    if view == "right":
        return asw_volume_right(
            left, right, disp_range, win_size, space_sigma, color_sigma, truncation
        )

    space = _space_mask(radius, space_sigma)
    side = 2 * radius + 1

    lp = replicate_pad(lf, radius)
    rp = replicate_pad(rf, radius)

    # A[d] = min(|L - R(. - d)|, T) on padded images; the shift stack clamps
    # at the left edge but those entries are overwritten by border_fill.
    s_rp = shifted_stack(rp, disp_range, "left")
    err = jnp.minimum(jnp.abs(lp[None] - s_rp), truncation)  # [D, Hp, Wp]

    offsets = jnp.stack(
        jnp.meshgrid(jnp.arange(side), jnp.arange(side), indexing="ij"), -1
    ).reshape(-1, 2)
    space_flat = space.reshape(-1)

    hp, wp = lp.shape

    def step(carry, xs):
        num, den = carry
        (dy, dx), sp = xs
        # windows: for output pixel p (origin at radius), offset o=(dy-R, dx-R)
        l_sh = jax.lax.dynamic_slice(lp, (dy, dx), (h, w))
        r_sh = jax.lax.dynamic_slice(rp, (dy, dx), (h, w))
        l_c = jax.lax.dynamic_slice(lp, (radius, radius), (h, w))
        r_c = jax.lax.dynamic_slice(rp, (radius, radius), (h, w))
        w_l = jnp.exp(-((l_sh - l_c) ** 2) / (2.0 * color_sigma**2)) * sp
        w_r = jnp.exp(-((r_sh - r_c) ** 2) / (2.0 * color_sigma**2)) * sp
        # wR evaluated at p - d: gather the weight map shifted by d.
        w_r_d = shifted_stack(w_r, disp_range, "left")     # [D, H, W]
        e = jax.lax.dynamic_slice(err, (0, dy, dx), (disp_range, h, w))
        wlr = w_l[None] * w_r_d
        return (num + wlr * e, den + wlr), None

    num0 = jnp.zeros((disp_range, h, w), jnp.float32)
    den0 = jnp.zeros((disp_range, h, w), jnp.float32)
    (num, den), _ = jax.lax.scan(step, (num0, den0), (offsets, space_flat))
    vol = num / jnp.maximum(den, 1e-20)
    return border_fill(vol, "left")


def asw_volume_right(
    left: jax.Array,
    right: jax.Array,
    disp_range: int,
    win_size: int = 11,
    space_sigma: float = 50.0,
    color_sigma: float = 30.0,
    truncation: float = 40.0,
) -> jax.Array:
    """Right-view ASW volume (`ASW/ASW.h:382-431`) by mirror symmetry:
    searching rightward from the right image equals the left-view problem on
    horizontally flipped images with (left,right) roles swapped."""
    lf = jnp.asarray(left)[:, ::-1]
    rf = jnp.asarray(right)[:, ::-1]
    vol = asw_volume(
        rf, lf, disp_range, win_size, space_sigma, color_sigma, truncation, "left"
    )
    return vol[:, :, ::-1]
