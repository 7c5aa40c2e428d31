"""Isolate the 4K canonical streamed runtime fault (round 5).

rt=64 / temp=10.28 GiB still dies at execution ("TPU backend error
(Internal)"), while the legacy FULL runs at ~12 GB modeled and the same
canonical program runs at [540, 1920].  Run ONE leg per process:

  python experiments/_r5_canon_isolate.py cross      # cross_two_pass only
  python experiments/_r5_canon_isolate.py scan       # + tso scanline
  python experiments/_r5_canon_isolate.py post       # + canonical post (the full thing)
  python experiments/_r5_canon_isolate.py postnoscan # cross + post, no scanline
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline

ROWS, COLS, D = 2160, 3840, 256
RT = 64


def main(mode):
    global ROWS, COLS, RT
    if len(sys.argv) > 2:
        ROWS = int(sys.argv[2])
    if len(sys.argv) > 3:
        COLS = int(sys.argv[3])
    if len(sys.argv) > 4:
        RT = int(sys.argv[4])
    kw = dict(disp_range=D, aggregation="cross_two_pass")
    if mode in ("scan", "post"):
        kw["scanline"] = ScanlineConfig()
    if mode in ("post", "postnoscan"):
        kw["run_post"] = True
    cfg = ADCensusConfig(**kw)
    if os.environ.get("ISOLATE_PAIR"):
        from stereo_match_traditional_tpu.utils.synthetic import make_pair

        Lp, Rp, _ = make_pair(ROWS, COLS, D, seed=0)
        L, R = jnp.asarray(Lp), jnp.asarray(Rp)
    else:
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (ROWS, COLS + 40)).astype(np.uint8)
        L = jnp.asarray(base[:, 40:])
        R = jnp.asarray(base[:, :-40])
    fn = jax.jit(streamed_pipeline("ad_census", cfg, row_tile=RT))
    t0 = time.time()
    comp = fn.lower(L, R).compile()
    temp = comp.memory_analysis().temp_size_in_bytes / 2**30
    print(f"{mode}: compiled {time.time()-t0:.0f}s temp={temp:.2f} GiB",
          flush=True)
    t0 = time.time()
    out = comp(L, R)
    m = out.disp_final if out.disp_final is not None else out.disp_left
    s = float(jnp.sum(m))
    print(f"{mode}: run1 {time.time()-t0:.1f}s checksum={s:.6e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
