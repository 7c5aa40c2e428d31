"""Compile-only row-tile scan for the 4K canonical streamed pipeline.

Compiled temp size is NOT monotone in the band (round-5 data: rt=136 ->
10.99 GiB, rt=128 -> 13.37 GiB — compiler scheduling dominates), and
executions with temp over ~11 GiB crash the TPU worker, so the safe band
must be found by compiling, never by executing.  Prints temp per rt; no
execution dispatched.  Run: python experiments/_r5_rtscan.py [rt ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline

ROWS, COLS, D = 2160, 3840, 256


def main():
    rts = [int(a) for a in sys.argv[1:]] or [112, 96, 80, 64]
    cfg = ADCensusConfig(
        disp_range=D, aggregation="cross_two_pass",
        scanline=ScanlineConfig(), run_post=True,
    )
    L = jnp.asarray(np.zeros((ROWS, COLS), np.uint8))
    for rt in rts:
        fn = jax.jit(streamed_pipeline("ad_census", cfg, row_tile=rt))
        t0 = time.time()
        try:
            comp = fn.lower(L, L).compile()
        except Exception as e:
            print(f"rt={rt}: compile FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        temp = comp.memory_analysis().temp_size_in_bytes / 2**30
        print(f"rt={rt}: temp={temp:.2f} GiB  (compile {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
