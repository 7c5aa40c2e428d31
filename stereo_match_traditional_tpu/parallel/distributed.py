"""Multi-host initialization (the DCN layer, SURVEY.md §5).

The reference is a single-process CPU program; the engine's multi-host
story is JAX's standard distributed runtime — ICI collectives within a
slice, DCN across hosts — with no custom transport.  This wrapper makes the
one required call idempotent and builds the canonical ``(host, chip)`` mesh
the sharded pipelines expect.

Typical multi-host launch (one process per host, same program):

    from stereo_match_traditional_tpu.parallel import distributed
    distributed.initialize()                 # env-driven on TPU pods
    mesh = distributed.host_chip_mesh()      # Mesh[(host, chip)]
    fn = tiled_pipeline("ad_census", cfg, mesh, axis_name="chip")
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent `jax.distributed.initialize` (env-driven when args are
    None — on Cloud TPU pods the runtime discovers everything).  Safe to
    call in single-process runs: a failure to discover a coordinator is
    treated as "not distributed" rather than an error."""
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
        _initialized = True
    except (ValueError, RuntimeError):
        # single-process / no coordinator configured
        _initialized = True


def host_chip_mesh(axis_names=("host", "chip")) -> Mesh:
    """``(num_hosts, chips_per_host)`` mesh over all devices, ordered so the
    chip axis stays within a host (collectives on it ride ICI, not DCN)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_host = jax.process_count()
    per_host = len(devs) // n_host
    arr = np.array(devs).reshape(n_host, per_host)
    return Mesh(arr, tuple(axis_names))
