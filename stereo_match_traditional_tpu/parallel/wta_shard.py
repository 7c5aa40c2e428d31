"""Disparity-sharded WTA (the tensor-parallel analogue, SURVEY.md §2.6).

When the ``[D, H, W]`` cost volume is sharded over its disparity axis, WTA
becomes a two-stage reduction: a local argmin per shard, then a
``pmin``-based combine over the mesh axis.  Ties resolve to the lowest
global disparity, matching the strict ``<`` comparisons of every reference
WTA loop (`SAD/Sad.h:22-38`, `AD-Census.h:346-380`, `CBLSM.h:383-407`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_BIG_IDX = 2**30  # python int: no device work at import time


def wta_sharded(
    vol_local: jax.Array, axis_name: str, mode: str = "min"
) -> jax.Array:
    """WTA over a D-sharded volume inside shard_map.

    ``vol_local`` is ``[D_local, H, W]``; the shard's disparity block starts
    at ``axis_index * D_local``.  Returns the full-precision global argmin
    (argmax for ``mode='max'``, the NCC similarity case `NCC/NCC.h:53-67`)
    as float32 [H, W], replicated across the axis.
    """
    if mode not in ("min", "max"):
        # ops.wta.wta defaults unknown strings the *other* way (to max);
        # a typo must not silently invert the winner vs the unsharded run
        raise ValueError(f"mode must be 'min' or 'max', got {mode!r}")
    idx = lax.axis_index(axis_name)
    d_local = vol_local.shape[0]
    v = -vol_local if mode == "max" else vol_local

    local_best = jnp.argmin(v, axis=0)
    local_val = jnp.min(v, axis=0)  # == v at argmin, no axis-0 gather
    global_d = local_best.astype(jnp.int32) + idx * d_local

    best_val = lax.pmin(local_val, axis_name)
    cand = jnp.where(local_val == best_val, global_d, _BIG_IDX)
    best_d = lax.pmin(cand, axis_name)
    return best_d.astype(jnp.float32)


def optimal_disparity_sharded(
    vol_local: jax.Array,
    axis_name: str,
    uniqueness_eps: float = 0.01,
    subpixel: bool = False,
    exclude_d0: bool = True,
    disp_range: int = None,
) -> jax.Array:
    """Sharded version of ``ops.wta.optimal_disparity`` (`SAD/Sad.h:40-85`).

    Two-stage: each shard computes its local min/secmin and the d±1 costs of
    its local best; the combine uses ``pmin`` for the global min, a masked
    ``pmin`` for the global second-minimum (minimum over costs != best), and
    owner-masked ``pmin`` selects for the parabola d±1 costs, so the result
    is bit-identical to the unsharded op.

    ``disp_range``: the true disparity count when it does not divide the
    mesh axis — the trailing padded slots (global d >= disp_range) are
    masked to +inf here regardless of what the caller padded them with, so
    they can neither win the argmin nor leak into secmin/parabola costs.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    d_local = vol_local.shape[0]
    d_total = disp_range if disp_range is not None else d_local * n

    ds = jnp.arange(d_local)[:, None, None] + idx * d_local
    if d_total < d_local * n:
        vol_local = jnp.where(ds >= d_total, jnp.inf, vol_local)

    # global argmin with lowest-d tie-breaking, excluding global d=0 if asked
    v = jnp.where(ds == 0, jnp.inf, vol_local) if exclude_d0 else vol_local
    local_best = jnp.argmin(v, axis=0)
    local_val = jnp.min(v, axis=0)
    gd = local_best.astype(jnp.int32) + idx * d_local
    minval = lax.pmin(local_val, axis_name)
    best = lax.pmin(jnp.where(local_val == minval, gd, _BIG_IDX), axis_name)

    # second minimum over every cost != minval, seeded with the global
    # cost[0] (`Sad.h:44,55-64`) — the d=0 shard contributes the seed.
    not_min = vol_local != minval[None]
    sec_local = jnp.min(jnp.where(not_min, vol_local, jnp.inf), axis=0)
    sec_local = jnp.where(idx == 0, jnp.minimum(sec_local, vol_local[0]), sec_local)
    sec = lax.pmin(sec_local, axis_name)

    reject = (sec - minval <= uniqueness_eps) | (best == 0) | (best == d_total - 1)

    # parabola neighbors: shard-local gather + edge exchange over the ring.
    # cost at global (best-1) and (best+1); each shard contributes via pmin
    # on an index-matched select (inf where it does not own the index).
    def cost_at(d_global):
        local_idx = jnp.clip(d_global - idx * d_local, 0, d_local - 1)
        c = jnp.take_along_axis(vol_local, local_idx[None], axis=0)[0]
        owns = (d_global >= idx * d_local) & (d_global < (idx + 1) * d_local)
        return lax.pmin(jnp.where(owns, c, jnp.inf), axis_name)

    c1 = cost_at(jnp.clip(best - 1, 0, d_total - 1))
    c2 = cost_at(jnp.clip(best + 1, 0, d_total - 1))
    denom = jnp.maximum(1.0, c1 + c2 - 2.0 * minval)
    refined = best.astype(jnp.float32) + (c1 - c2) / (2.0 * denom)

    out = refined if subpixel else best.astype(jnp.float32)
    return jnp.where(reject, 0.0, out)
