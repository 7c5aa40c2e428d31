"""Dense-vs-blocked MXU cumsum crossover sweep (round 5).

`_mxu_cumsum` switches from the dense [n, n] triangle to the two-level
blocked form only above _CUMSUM_DENSE_MAX = 2048 — a threshold chosen
for 4K feasibility (round 2) and never swept.  The dense triangle costs
n/2 MACs per element (640 at W=1280), the blocked form ~(block + nb)/2
(~258 at block=512) — at serving widths the canonical cross pipeline
runs 16 prefix-sum sweeps per call, so the crossover matters.

A/B on the 720p/D=128 cross_two_pass active workload (and Teddy as a
no-change control) across thresholds; run: python
experiments/_r5_cumsum_block.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

import stereo_match_traditional_tpu.ops.aggregate as aggregate
from stereo_match_traditional_tpu.config import ADCensusConfig
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair


def main():
    fn, _ = get_pipeline("ad_census")
    for rows, cols, d in ((720, 1280, 128), (375, 450, 60)):
        L, R, _ = make_pair(rows, cols, d, seed=0)
        Lj, Rj = jnp.asarray(L), jnp.asarray(R)
        cfg = ADCensusConfig(disp_range=d, aggregation="cross_two_pass")
        for dense_max, block in ((2048, 512), (1024, 512), (512, 512),
                                 (512, 256), (256, 256)):
            aggregate._CUMSUM_DENSE_MAX = dense_max
            aggregate._CUMSUM_BLOCK = block
            kw = dict(n_lo=1, n_hi=3, reps=2) if rows > 400 else {}

            def run(l, r):
                res = fn(l, r, cfg)
                return sum(jnp.sum(x.astype(jnp.float32))
                           for x in res if x is not None)

            sec = device_time(run, (Lj, Rj), **kw)
            print(f"cross_two_pass {rows}x{cols}/D={d} "
                  f"dense_max={dense_max} block={block}: {sec*1e3:.2f} ms",
                  flush=True)
        aggregate._CUMSUM_DENSE_MAX = 2048
        aggregate._CUMSUM_BLOCK = 512


if __name__ == "__main__":
    main()
