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

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_match_traditional_tpu.models.registry import get_pipeline


def gspmd_pipeline(
    name: str,
    cfg=None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "tile",
    aux_names: Sequence[str] = (),
):
    """Jitted ``(left, right, *aux) -> StereoResult`` with the input images
    sharded row-wise over ``mesh[axis_name]``; internal layouts are chosen
    by the XLA SPMD partitioner (it usually propagates the row sharding
    with D replicated, but no layout is guaranteed — use
    `parallel.tiled_pipeline` when the exact sharding matters).

    Variants that take extra image inputs declare them via ``aux_names``
    and pass the arrays positionally after ``right`` — e.g. the ASW Lab
    variant (``aux_names=('left_lab', 'right_lab')``,
    `ASW/ASWeight.cpp:33-34`) or AD-Census cross arms on color
    (``aux_names=('left_color', 'right_color')``).  Aux images get the
    same row sharding (a trailing channel axis is replicated).
    """
    fn, cfg_cls = get_pipeline(name)
    if cfg is None:
        cfg = cfg_cls()
    if mesh is None:
        from stereo_match_traditional_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_names=(axis_name,))

    img_sharding = NamedSharding(mesh, P(axis_name, None))
    aux_names = tuple(aux_names)

    def run(left, right, *aux):
        return fn(left, right, cfg, **dict(zip(aux_names, aux)))

    return jax.jit(
        run, in_shardings=(img_sharding,) * (2 + len(aux_names))
    )
