"""Run the canonical streamed flagship at 4K/D=256 on the real chip:
compile, execute, fetch a checksum, and report device_time.
python _run_canon4k.py [row_tile]"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.parallel.streamed import (
    auto_row_tile, streamed_pipeline,
)

ROWS, COLS, D = 2160, 3840, 256
cfg = ADCensusConfig(
    disp_range=D, aggregation="cross_two_pass",
    scanline=ScanlineConfig(), run_post=True,
)
rt = int(sys.argv[1]) if len(sys.argv) > 1 else auto_row_tile(
    "ad_census", cfg, ROWS, COLS)
print(f"row_tile={rt}", flush=True)

rng = np.random.default_rng(0)
base = rng.integers(0, 255, (ROWS, COLS + 40)).astype(np.uint8)
L = jnp.asarray(base[:, 40:])
R = jnp.asarray(base[:, :-40])

fn = jax.jit(streamed_pipeline("ad_census", cfg, row_tile=rt))
t0 = time.time()
comp = fn.lower(L, R).compile()
ma = comp.memory_analysis()
print(f"compiled {time.time()-t0:.0f}s temp={ma.temp_size_in_bytes/2**30:.2f} GiB",
      flush=True)
t0 = time.time()
out = comp(L, R)
s = float(jnp.sum(out.disp_final))
print(f"run1 {time.time()-t0:.1f}s checksum={s:.6e}", flush=True)

# seconds-scale workload: n_lo=1/n_hi=2/reps=1 keeps the official
# two-N differencing at 3 total executions
from stereo_match_traditional_tpu.utils.benchmark import device_time
dt = device_time(lambda l, r: fn(l, r).disp_final, (L, R),
                 n_lo=1, n_hi=2, reps=1)
print(f"device_time {dt:.2f} s", flush=True)
