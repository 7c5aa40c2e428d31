"""Representative-pair (slope-capped) 4K rows for the active and legacy
FULL paths — completes the round-5 accuracy table alongside the staged
canonical 0.0820.  Run: python experiments/_r5_rep4k.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline
from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate, make_pair

ROWS, COLS, D = 2160, 3840, 256


def main():
    L, R, gt = make_pair(ROWS, COLS, D, seed=0, feature_scale=24 * D // 60)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    for name, cfg in (
        ("active", ADCensusConfig(disp_range=D)),
        ("FULL auto", ADCensusConfig(
            disp_range=D, run_post=True,
            scanline=ScanlineConfig(penalty_scale="auto"))),
        ("FULL parity", ADCensusConfig(
            disp_range=D, run_post=True, scanline=ScanlineConfig())),
    ):
        res = jax.jit(streamed_pipeline("ad_census", cfg))(Lj, Rj)
        m = res.disp_final if res.disp_final is not None else res.disp_left
        print(f"4K rep {name}: bad-2.0 = "
              f"{bad_pixel_rate(np.asarray(m), gt):.4f}", flush=True)


if __name__ == "__main__":
    main()
