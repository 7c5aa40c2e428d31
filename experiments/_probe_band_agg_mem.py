"""Compile-only memory analysis of one streamed-canonical band's
cross_aggregate at 4K/D=256 (the shape that crashed the TPU worker when
EXECUTED standalone in round 4) — answers whether the crash is
HBM exhaustion.  python _probe_band_agg_mem.py [T ...]"""
import sys

import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import CrossAggregatorParams
from stereo_match_traditional_tpu.ops import aggregate

D, W = 256, 3840
cp = CrossAggregatorParams()
for t in [int(a) for a in sys.argv[1:]] or [504]:
    img = jax.ShapeDtypeStruct((t, W), jnp.uint8)
    vol = jax.ShapeDtypeStruct((D, t, W), jnp.float32)

    def f(i, v):
        arms = aggregate.canonical_cross_arms(i, cp)
        return aggregate.cross_aggregate(v, arms, cp.num_iters)

    comp = jax.jit(f).lower(img, vol).compile()
    ma = comp.memory_analysis()
    print(f"T={t}: temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
          f"args={ma.argument_size_in_bytes/2**30:.2f} "
          f"out={ma.output_size_in_bytes/2**30:.2f}", flush=True)
