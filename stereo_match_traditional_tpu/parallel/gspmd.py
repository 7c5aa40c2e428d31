"""GSPMD execution: jit + sharding constraints, XLA inserts collectives.

The `shard_map` path (`parallel.tiled`) is the explicit, halo-exact fast
path; this is the zero-surgery alternative — any pipeline, any config,
sharded by annotating the inputs and letting the XLA SPMD partitioner
choose the collectives (the scaling-book recipe: pick a mesh, annotate,
let XLA insert collectives, profile, iterate).  Semantics are identical to
single-device by construction, so every quirk flag and dormant variant
works sharded without a dedicated tile core.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_match_traditional_tpu.models.registry import get_pipeline


def gspmd_pipeline(
    name: str,
    cfg=None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "tile",
):
    """Jitted ``(left, right) -> StereoResult`` with the input images
    sharded row-wise over ``mesh[axis_name]``; internal layouts are chosen
    by the XLA SPMD partitioner (it usually propagates the row sharding
    with D replicated, but no layout is guaranteed — use
    `parallel.tiled_pipeline` when the exact sharding matters)."""
    fn, cfg_cls = get_pipeline(name)
    if cfg is None:
        cfg = cfg_cls()
    if mesh is None:
        from stereo_match_traditional_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_names=(axis_name,))

    img_sharding = NamedSharding(mesh, P(axis_name, None))

    def run(left, right):
        return fn(left, right, cfg)

    return jax.jit(run, in_shardings=(img_sharding, img_sharding))
