"""4K/D=256 canonical-family streamed measurements (VERDICT r3 item 1).

One process: (a) active streamed 4K bad-2.0 reference + auto row-tile
validation, (b) canonical (cross_two_pass + tso scanline + canonical
post) streamed 4K perf + accuracy line.
"""
import numpy as np
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.parallel.streamed import (
    auto_row_tile, streamed_pipeline,
)
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate, make_pair

ROWS, COLS, D = 2160, 3840, 256


def run(label, cfg, accuracy_only=False):
    import jax

    t = auto_row_tile("ad_census", cfg, ROWS, COLS)
    fn = jax.jit(streamed_pipeline("ad_census", cfg))
    L, R, gt = make_pair(ROWS, COLS, D, seed=0)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    res = fn(Lj, Rj)
    m = res.disp_final if res.disp_final is not None else res.disp_left
    b2 = bad_pixel_rate(np.asarray(m), gt)
    line = f"{label} (auto rt={t}): bad-2.0={b2:.4f}"
    if not accuracy_only:
        def checksum(l, r):
            r_ = fn(l, r)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in r_ if x is not None)
        sec = device_time(checksum, (Lj, Rj), n_lo=1, n_hi=3, reps=2)
        line += f"  {sec*1e3:.0f} ms  {ROWS*COLS*D/sec/1e6:.0f} MPixDisp/s"
    print(line, flush=True)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "active"):
        run("4K active streamed", ADCensusConfig(disp_range=D),
            accuracy_only=True)
    if which in ("all", "legacy"):
        run("4K FULL legacy streamed",
            ADCensusConfig(disp_range=D, scanline=ScanlineConfig(),
                           run_post=True))
    if which in ("all", "canonical"):
        run("4K canonical streamed",
            ADCensusConfig(disp_range=D, aggregation="cross_two_pass",
                           scanline=ScanlineConfig(), run_post=True))
