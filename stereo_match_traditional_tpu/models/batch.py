"""Batched execution and a pipelined serving loop.

The reference processes exactly one hard-coded pair per run
(`SAD/SADmain.cpp:27-28` et al.).  For production serving the engine maps
any pipeline over a batch axis (one `vmap`, still a single XLA program, so
the MXU/VPU see batched work) and overlaps host decode with device compute
through the native threaded pair loader (`utils/native.PairLoader`).

Measured guidance (v5e, Teddy workload): the flagship is HBM-bound at
single-pair sizes already, and vmap makes its SAT gathers batched and
slower (11.6 ms/pair at batch 8 vs 6.3 ms single) — prefer ``batch_size=1``
streams for ad_census/cblsm; batching pays off for small images or the
window pipelines whose per-pair device time is dominated by fixed overhead.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stereo_match_traditional_tpu.models.base import StereoResult
from stereo_match_traditional_tpu.models.registry import get_pipeline


def batched_pipeline(name: str, cfg=None):
    """Jitted ``(left [B,H,W], right [B,H,W]) -> StereoResult`` with every
    result field batched along axis 0."""
    fn, cfg_cls = get_pipeline(name)
    if cfg is None:
        cfg = cfg_cls()

    def one(l, r):
        return fn(l, r, cfg)

    return jax.jit(jax.vmap(one))


def serve_pairs(
    name: str,
    pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
    cfg=None,
    batch_size: int = 1,
) -> Iterator[Tuple[np.ndarray, ...]]:
    """Stream disparity maps for an iterable of (left, right) uint8 pairs.

    Pads the final partial batch (results are cropped back).  Pair shapes
    must be uniform — the engine compiles one program per (batch, H, W).
    Use ``utils.native.PairLoader`` as the iterable to overlap decode with
    device compute.
    """
    run = batched_pipeline(name, cfg)
    buf_l, buf_r = [], []

    def flush():
        n = len(buf_l)
        if n == 0:
            return
        reps = batch_size - n
        ls = np.stack(buf_l + [buf_l[-1]] * reps)
        rs = np.stack(buf_r + [buf_r[-1]] * reps)
        res = run(jnp.asarray(ls), jnp.asarray(rs))
        disp = np.asarray(
            res.disp_final if res.disp_final is not None else res.disp_left
        )
        for k in range(n):
            yield disp[k]
        buf_l.clear()
        buf_r.clear()

    for left, right in pairs:
        buf_l.append(np.asarray(left))
        buf_r.append(np.asarray(right))
        if len(buf_l) == batch_size:
            yield from flush()
    yield from flush()
