"""Halo exchange over the tile axis (inside shard_map).

Aggregation windows (<=25 px ASW, <=34 px arms, 4 px census rows) need
boundary overlap between adjacent row tiles (SURVEY.md §2.6 item 4); this is
the `ppermute` neighbor exchange that replaces shared-memory access in the
reference's single-process loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def add_row_halo(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Extend a row-sharded tile with ``halo`` rows from each neighbor.

    ``x`` is the local tile [H_tile, W(, C)] inside a shard_map over
    ``axis_name``.  Interior boundaries receive the neighbor's edge rows via
    `lax.ppermute` over ICI; the global top/bottom tiles replicate their own
    edge row instead — exactly the `BORDER_REPLICATE` semantics the
    reference applies to the full image (`SADmain.cpp:47-48`), so a tiled
    run equals the untiled run for any op whose receptive field <= halo.
    """
    if halo <= 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top_edge = x[:halo]        # rows this tile sends upward is its top edge
    bottom_edge = x[-halo:]

    if n > 1:
        # receive the *bottom* rows of the tile above, and the *top* rows of
        # the tile below.
        from_above = lax.ppermute(
            bottom_edge, axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = lax.ppermute(
            top_edge, axis_name, [(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_above = bottom_edge
        from_below = top_edge

    # global edges: replicate own boundary row (BORDER_REPLICATE)
    rep_top = jnp.repeat(x[:1], halo, axis=0)
    rep_bottom = jnp.repeat(x[-1:], halo, axis=0)
    top = jnp.where((idx == 0), 0, 1)
    from_above = jax.lax.cond(idx == 0, lambda: rep_top, lambda: from_above)
    from_below = jax.lax.cond(idx == n - 1, lambda: rep_bottom, lambda: from_below)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def crop_row_halo(x: jax.Array, halo: int, axis: int = 0) -> jax.Array:
    if halo <= 0:
        return x
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(halo, x.shape[axis] - halo)
    return x[tuple(sl)]
