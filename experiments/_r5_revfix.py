"""Barrier-fix validation (round 5): after extending rev_materialized to
the LEGACY scanline paths (monolithic + streamed), (a) the Teddy and 720p
FULL flagship must not regress (the barrier adds one materialization per
reversed pass), and (b) the [540, 1920]/D=256 legacy streamed FULL — the
round-5 ReverseInput CHECK-crash repro — must compile and run, closing
the accuracy4k slope-control leg.  Run: python experiments/_r5_revfix.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate, make_pair


def checksum(fn):
    def run(l, r):
        res = fn(l, r)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in res if x is not None)
    return run


def main():
    fn, _ = get_pipeline("ad_census")
    for rows, cols, d in ((375, 450, 60), (720, 1280, 128)):
        L, R, _ = make_pair(rows, cols, d, seed=0)
        Lj, Rj = jnp.asarray(L), jnp.asarray(R)
        cfg = ADCensusConfig(disp_range=d, scanline=ScanlineConfig(),
                             run_post=True)
        kw = dict(n_lo=1, n_hi=3, reps=2) if rows > 400 else {}
        sec = device_time(checksum(lambda l, r: fn(l, r, cfg)), (Lj, Rj), **kw)
        print(f"FULL direct {rows}x{cols}/D={d}: {sec*1e3:.2f} ms", flush=True)

    h, w, d = 540, 1920, 256
    L, R, gt = make_pair(h, w, d, seed=0)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    cfg = ADCensusConfig(disp_range=d, run_post=True,
                         scanline=ScanlineConfig(penalty_scale="auto"))
    res = streamed_pipeline("ad_census", cfg)(Lj, Rj)
    print(f"[540,1920]/D=256 FULL auto (streamed): bad-2.0 = "
          f"{bad_pixel_rate(np.asarray(res.disp_final), gt):.4f}", flush=True)


if __name__ == "__main__":
    main()
