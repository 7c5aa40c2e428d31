"""4K canonical line via STAGED execution (round-5 fallback).

The fused cross+scanline+post canonical program trips an XLA:TPU runtime
fault at 4K regardless of band size or data, while every two-stage
subset runs (see BASELINE.md round-5).  This driver runs the canonical
pipeline as TWO programs — (A) streamed cross_two_pass + tso scanline +
dual WTA (the working 'scan' leg), (B) the canonical post (rounded LR
check, d-chunked iterative region voting over canonical arms, truncate
median) on the produced maps — which is also exactly what the stage-
checkpoint re-entry feature ships for.  Reports device_time per stage
and the sum as the 4K canonical number, plus bad-2.0 on the legacy and
representative pairs.  Run: python experiments/_r5_canon_staged.py [rt]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.models.ad_census import (
    ad_census_post_canonical, irv_auto_d_chunk,
)
from stereo_match_traditional_tpu.ops import aggregate
from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate, make_pair

ROWS, COLS, D = 2160, 3840, 256


def main():
    rt = int(sys.argv[1]) if len(sys.argv) > 1 else 224
    cfg_scan = ADCensusConfig(
        disp_range=D, aggregation="cross_two_pass", scanline=ScanlineConfig(),
    )
    cfg = ADCensusConfig(
        disp_range=D, aggregation="cross_two_pass", scanline=ScanlineConfig(),
        run_post=True,
    )
    fn_a = jax.jit(streamed_pipeline("ad_census", cfg_scan, row_tile=rt))

    # exact D/2: d_chunk=129 (the naive budget division) compiles two
    # 9.4 GB blocked-cumsum temporaries and OOMs; 128 compiled and ran
    d_chunk = 128

    def post_fn(dl, dr, left):
        arms = aggregate.canonical_cross_arms(left, cfg.cross_params)
        fin, occl, mism = ad_census_post_canonical(
            dl, dr, None, arms, cfg, irv_d_chunk=d_chunk)
        return fin

    fn_b = jax.jit(post_fn)

    Ll, Rl, gtl = make_pair(ROWS, COLS, D, seed=0)
    Lr, Rr, gtr = make_pair(ROWS, COLS, D, seed=0, feature_scale=24 * D // 60)
    for label, L, R, gt in (("legacy", Ll, Rl, gtl), ("rep", Lr, Rr, gtr)):
        Lj, Rj = jnp.asarray(L), jnp.asarray(R)
        t0 = time.time()
        res = fn_a(Lj, Rj)
        fin = fn_b(res.disp_left, res.disp_right, Lj)
        m = np.asarray(fin)
        bad = np.asarray(m, np.float64)
        print(f"canonical 4K staged {label}: run {time.time()-t0:.1f}s "
              f"bad-2.0={bad_pixel_rate(bad, gt):.4f} "
              f"invalid={np.mean(~np.isfinite(m)):.4f}", flush=True)

    # device_time's fori_loop wrapper trips the same whole-program runtime
    # fault the fused FULL does (measured: the looped stage-A program
    # crashes the worker), so the staged perf number is warm wall clock
    # with a scalar checksum fetch forcing completion — the ~30 ms relay
    # constant is noise at this scale.
    Lj, Rj = jnp.asarray(Ll), jnp.asarray(Rl)

    def once():
        t0 = time.time()
        res = fn_a(Lj, Rj)
        fin = fn_b(res.disp_left, res.disp_right, Lj)
        float(jnp.sum(jnp.where(jnp.isfinite(fin), fin, 0.0)))
        return time.time() - t0

    def once_a():
        t0 = time.time()
        res = fn_a(Lj, Rj)
        float(jnp.sum(res.disp_left) + jnp.sum(res.disp_right))
        return time.time() - t0

    walls_a = [once_a() for _ in range(3)]
    walls = [once() for _ in range(3)]
    sec_a, sec = min(walls_a), min(walls)
    print(f"stage A (cross+scanline+WTA) warm wall {sec_a:.2f} s "
          f"(reps {['%.1f' % x for x in walls_a]})", flush=True)
    print(f"canonical 4K staged total warm wall {sec:.2f} s "
          f"(reps {['%.1f' % x for x in walls]})  "
          f"{ROWS*COLS*D/sec/1e6:.0f} MPixDisp/s", flush=True)


if __name__ == "__main__":
    main()
