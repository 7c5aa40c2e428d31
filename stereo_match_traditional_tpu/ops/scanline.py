"""4-path scanline (SGM-style) cost optimization.

Re-designs `AD-CensusV1/ScanlineOptimizer.h:104-253` as a `jax.lax.scan`
over image columns/rows with every pixel of the perpendicular axis processed
in parallel — the serial per-pixel recurrence becomes a [H, D] vector update
per step.  The recurrence (`ScanlineOptimizer.h:173-183`):

    L(p, d) = C(p, d) + min(L(p-1, d),
                            L(p-1, d-1) + P1,
                            L(p-1, d+1) + P1,
                            min_d' L(p-1, d') + P2) - min_d' L(p-1, d')
    P2 = max(P1, P2_init / (|I(p) - I(p-1)| + 1))        (:171,232)

Sentinel-padded neighbors (`costLastPath[dispRange+2]` init 0xffff,
`ScanlineOptimizer.h:151`) become +inf pads on the d axis.  The reference's
vertical passes read ``costLastPath[d+1]`` for the ``l2`` term
(`ScanlineOptimizer.h:238`), silently dropping the d-1 transition; set
``faithful_vertical_l2=True`` to reproduce that quirk (default is canonical
SGM on all four paths).

Cross-tile (multi-chip) continuation of these scans lives in
``stereo_match_traditional_tpu.parallel.scan_carry``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ScanlineConfig

_BIG = float("inf")  # python float: no device work at import time


def _directional_pass(
    cost: jax.Array,
    gray: jax.Array,
    p1: float,
    p2_init: float,
    l2_uses_dm1: bool = True,
    unroll: int = 4,
    p2_ref: str = "prev",
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One directional pass.

    cost: [N, ..., D, M] with axis 0 the path direction, disparity
    transitions along axis -2, and the perpendicular image axis M on the
    128-lane axis — with D=60 a [M, D] layout would leave half the lanes
    idle; this orientation measured 2.2x faster on v5e.  gray: [N, ..., M].
    Returns (aggregated, final carry) — the carry (last aggregated column
    and its min) is what a cross-tile continuation would hand to the next
    device; the sharded implementation reshards with all_to_all instead
    (parallel.scan_carry).

    ``unroll`` recurrence steps run per `lax.scan` iteration (the chain is
    strictly sequential, so this only amortizes per-step scan overhead —
    results are bit-identical for any unroll).
    """
    if p2_ref == "first":
        # reference vertical quirk: ScanLineUpDown assigns grayLast once at
        # the column start and never updates it (`ScanlineOptimizer.h:210`,
        # read at `:232`), so P2 adapts to |I(p) - I(first pixel of path)|
        prev_g = jnp.broadcast_to(gray[:1], gray.shape)
    else:
        prev_g = jnp.concatenate([gray[:1], gray[:-1]], axis=0)
    p2 = jnp.maximum(p1, p2_init / (jnp.abs(gray - prev_g) + 1.0))  # [N, ...]

    def step(prev, prev_min, c, p2_col):
        inf_row = jnp.full(prev.shape[:-2] + (1,) + prev.shape[-1:], _BIG)
        l1 = prev
        if l2_uses_dm1:
            l2 = jnp.concatenate([inf_row, prev[..., :-1, :]], axis=-2) + p1
        else:
            # reference vertical quirk: l2 = costLastPath[d+1] + p1 == prev[d]+p1
            l2 = prev + p1
        l3 = jnp.concatenate([prev[..., 1:, :], inf_row], axis=-2) + p1
        l4 = (prev_min + p2_col)[..., None, :]
        out = (
            c
            + jnp.minimum(jnp.minimum(l1, l2), jnp.minimum(l3, l4))
            - prev_min[..., None, :]
        )
        return out, jnp.min(out, axis=-2)

    first = cost[0]
    carry0 = (first, jnp.min(first, axis=-2))
    n = cost.shape[0]
    k = max(1, unroll)
    main = ((n - 1) // k) * k

    def body(carry, xs):
        prev, prev_min = carry
        cs, ps = xs             # [k, ..., D], [k, ...]
        outs = []
        for t in range(k):
            prev, prev_min = step(prev, prev_min, cs[t], ps[t])
            outs.append(prev)
        return (prev, prev_min), jnp.stack(outs)

    chunk_shape = (main // k, k)
    xs_main = (
        cost[1 : 1 + main].reshape(chunk_shape + cost.shape[1:]),
        p2[1 : 1 + main].reshape(chunk_shape + p2.shape[1:]),
    )
    carry, ys = jax.lax.scan(body, carry0, xs_main)
    pieces = [first[None], ys.reshape((main,) + cost.shape[1:])]
    for t in range(1 + main, n):  # remainder, at most k-1 steps
        out, out_min = step(carry[0], carry[1], cost[t], p2[t])
        carry = (out, out_min)
        pieces.append(out[None])
    return jnp.concatenate(pieces, axis=0), carry


def scanline_optimize(
    cost: jax.Array, gray: jax.Array, cfg: ScanlineConfig = ScanlineConfig()
) -> jax.Array:
    """Sum of the four directional volumes (`ScanlineOptimizer.h:104-128`).

    cost: [D, H, W]; gray: [H, W] (the left image drives the adaptive P2,
    `AD-CensusV1/main.cpp:88` passes ``leftptr``).
    """
    p1, p2 = cfg.p1, cfg.p2
    vert_dm1 = not cfg.faithful_vertical_l2
    vert_p2 = "first" if cfg.faithful_vertical_p2 else "prev"

    # Four separate scans: stacking the forward/backward passes into one
    # scan over a [N, 2, ...] layout measured 50x slower on v5e (and 6
    # minutes to compile) — XLA tiles the extra middle axis poorly.
    # horizontal: scan over W; body [D, H] (rows on the lane axis).
    c_wdh = jnp.transpose(cost, (2, 0, 1))          # [W, D, H]
    g_wh = gray.astype(jnp.float32).T               # [W, H]
    lr, _ = _directional_pass(c_wdh, g_wh, p1, p2, True)
    rl, _ = _directional_pass(c_wdh[::-1], g_wh[::-1], p1, p2, True)
    horiz = lr + rl[::-1]                           # [W, D, H]

    # vertical: scan over H; body [D, W] (columns on the lane axis).
    c_hdw = jnp.transpose(cost, (1, 0, 2))          # [H, D, W]
    g_hw = gray.astype(jnp.float32)                 # [H, W]
    ud, _ = _directional_pass(c_hdw, g_hw, p1, p2, vert_dm1, p2_ref=vert_p2)
    du, _ = _directional_pass(c_hdw[::-1], g_hw[::-1], p1, p2, vert_dm1, p2_ref=vert_p2)
    vert = ud + du[::-1]                            # [H, D, W]

    return jnp.transpose(horiz, (1, 2, 0)) + jnp.transpose(vert, (1, 0, 2))
