"""Compile-only memory probe of the canonical streamed pipeline at
4K/D=256 for several row tiles (recalibrates auto_row_tile's canonical
branch).  python _probe_canon_mem.py [rt ...]
"""
import sys

import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline

ROWS, COLS, D = 2160, 3840, 256

cfg = ADCensusConfig(
    disp_range=D, aggregation="cross_two_pass",
    scanline=ScanlineConfig(), run_post=True,
)

shape = jax.ShapeDtypeStruct((ROWS, COLS), jnp.uint8)
for rt in [int(a) for a in sys.argv[1:]] or [32, 64, 96, 128]:
    try:
        fn = jax.jit(streamed_pipeline("ad_census", cfg, row_tile=rt))
        comp = fn.lower(shape, shape).compile()
        ma = comp.memory_analysis()
        tot = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
               + ma.output_size_in_bytes)
        print(f"rt={rt}: temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
              f"total={tot/2**30:.2f} GiB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"rt={rt}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
