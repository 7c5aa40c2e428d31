"""Stage-B (canonical post) IRV d_chunk sweep at 4K (round 5).

`irv_auto_d_chunk` budgets ~256 MB of one-hot slices — sized for the
FUSED pipeline where the histogram shares the device with band volumes.
In the STAGED form the post program owns the chip, so bigger chunks
(fewer prefix-sum sweeps: 5 iters x ceil(256/d_chunk) x 2 sweeps) are
affordable: d_chunk=32 is ~1.06 GB of one-hots.  Measures stage B warm
wall per d_chunk.  Run: python experiments/_r5_irv_chunk.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.models.ad_census import ad_census_post_canonical
from stereo_match_traditional_tpu.ops import aggregate
from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline
from stereo_match_traditional_tpu.utils.synthetic import make_pair

ROWS, COLS, D = 2160, 3840, 256


def main():
    cfg_scan = ADCensusConfig(
        disp_range=D, aggregation="cross_two_pass", scanline=ScanlineConfig())
    cfg = ADCensusConfig(
        disp_range=D, aggregation="cross_two_pass", scanline=ScanlineConfig(),
        run_post=True)
    L, R, _ = make_pair(ROWS, COLS, D, seed=0)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    res = jax.jit(streamed_pipeline("ad_census", cfg_scan, row_tile=224))(Lj, Rj)
    dl, dr = res.disp_left, res.disp_right
    ref = None
    for d_chunk in (128, 64):
        def post_fn(a, b, left, dc=d_chunk):
            arms = aggregate.canonical_cross_arms(left, cfg.cross_params)
            fin, _, _ = ad_census_post_canonical(
                a, b, None, arms, cfg, irv_d_chunk=dc)
            return fin
        fn = jax.jit(post_fn)
        fin = fn(dl, dr, Lj)
        s = float(jnp.sum(jnp.where(jnp.isfinite(fin), fin, -1.0)))
        walls = []
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(jnp.where(jnp.isfinite(fn(dl, dr, Lj)),
                                    fn(dl, dr, Lj), -1.0)))
            walls.append(time.time() - t0)
        tag = ""
        if ref is None:
            ref = s
        elif s != ref:
            tag = f"  CHECKSUM DRIFT vs d_chunk=8: {s:.6e} != {ref:.6e}"
        print(f"stage B d_chunk={d_chunk}: warm wall {min(walls):.2f} s "
              f"(reps {['%.1f' % x for x in walls]}) checksum={s:.6e}{tag}",
              flush=True)


if __name__ == "__main__":
    main()
