"""Round-5 canonical-family measurements (VERDICT r4 items 1, 2, 6).

Parts (run one at a time on the real chip, `python experiments/_r5_canon.py PART`):

* ``serving`` — item 6: canonical family at Teddy and 720p/D=128 with the
  round-4 pixel-major cross path: cross_two_pass active (both views) and
  canonical FULL (+tso scanline + canonical post), device_time + bad-2.0.
  Refreshes the stale round-2 37.3 ms Teddy row (regression check).
* ``sweep4k`` — item 2: legacy-FULL streamed 4K/D=256 penalty-scale
  accuracy sweep over the fixed scales the round-4 table left empty
  (0.1 / 0.25 / 0.5); None and 'auto' were recorded round 4.
* ``canon4k`` — item 1: the 4K/D=256 canonical streamed line with the
  pixel-major path: compile, run1 wall time, bad-2.0, and device_time
  (n_lo=1/n_hi=2/reps=1) only if run1 is under the safety bound —
  NEVER kill a dispatched 4K run (the axon queue trap, see verify skill).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.parallel.streamed import (
    auto_row_tile, streamed_pipeline,
)
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate, make_pair

ROWS4K, COLS4K, D4K = 2160, 3840, 256


def _checksum(fn):
    def run(l, r):
        res = fn(l, r)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in res if x is not None)
    return run


def serving():
    fn, _ = get_pipeline("ad_census")
    for rows, cols, d, label in (
        (375, 450, 60, "Teddy"),
        (720, 1280, 128, "720p"),
    ):
        L, R, gt = make_pair(rows, cols, d, seed=0)
        Lj, Rj = jnp.asarray(L), jnp.asarray(R)
        for name, cfg in (
            ("cross_two_pass active", ADCensusConfig(
                disp_range=d, aggregation="cross_two_pass")),
            ("canonical FULL", ADCensusConfig(
                disp_range=d, aggregation="cross_two_pass",
                scanline=ScanlineConfig(), run_post=True)),
        ):
            res = fn(Lj, Rj, cfg)
            m = res.disp_final if res.disp_final is not None else res.disp_left
            b2 = bad_pixel_rate(np.asarray(m), gt)
            sec = device_time(_checksum(lambda l, r: fn(l, r, cfg)), (Lj, Rj),
                              n_lo=1, n_hi=5, reps=2)
            print(f"{label} {name}: {sec*1e3:.1f} ms  "
                  f"{rows*cols*d/sec/1e6:.0f} MPixDisp/s  bad-2.0={b2:.4f}",
                  flush=True)


def sweep4k():
    L, R, gt = make_pair(ROWS4K, COLS4K, D4K, seed=0)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    for scale in (0.1, 0.25, 0.5):
        cfg = ADCensusConfig(
            disp_range=D4K, run_post=True,
            scanline=ScanlineConfig(penalty_scale=scale),
        )
        t0 = time.time()
        res = streamed_pipeline("ad_census", cfg)(Lj, Rj)  # auto row_tile
        m = np.asarray(res.disp_final)
        print(f"4k FULL scale={scale}: bad-2.0 = {bad_pixel_rate(m, gt):.4f} "
              f"(wall {time.time()-t0:.0f}s)", flush=True)


def canon4k():
    cfg = ADCensusConfig(
        disp_range=D4K, aggregation="cross_two_pass",
        scanline=ScanlineConfig(), run_post=True,
    )
    rt = auto_row_tile("ad_census", cfg, ROWS4K, COLS4K)
    print(f"row_tile={rt}", flush=True)
    L, R, gt = make_pair(ROWS4K, COLS4K, D4K, seed=0)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    for attempt_rt in (rt, 128):
        fn = jax.jit(streamed_pipeline("ad_census", cfg, row_tile=attempt_rt))
        t0 = time.time()
        comp = fn.lower(Lj, Rj).compile()
        ma = comp.memory_analysis()
        temp = ma.temp_size_in_bytes / 2**30
        print(f"rt={attempt_rt} compiled {time.time()-t0:.0f}s "
              f"temp={temp:.2f} GiB", flush=True)
        if temp > 10.5 and attempt_rt != 128:
            # rt=224/temp=11.84 GiB crashed the TPU worker (round 5) —
            # fall back rather than risk another worker restart
            print("temp over the 10.5 GiB worker-headroom bound; "
                  "retrying at rt=128", flush=True)
            continue
        break
    t0 = time.time()
    out = comp(Lj, Rj)
    m = np.asarray(out.disp_final)          # device->host fetch = completion
    run1 = time.time() - t0
    print(f"run1 {run1:.1f}s  bad-2.0={bad_pixel_rate(m, gt):.4f}", flush=True)
    if run1 > 150:
        print("run1 over the 150 s safety bound; skipping device_time "
              "(3 more executions) — treat run1 wall as the number",
              flush=True)
        return
    sec = device_time(_checksum(lambda l, r: fn(l, r)), (Lj, Rj),
                      n_lo=1, n_hi=2, reps=1)
    print(f"device_time {sec:.2f} s  "
          f"{ROWS4K*COLS4K*D4K/sec/1e6:.0f} MPixDisp/s", flush=True)


def accuracy4k():
    """Re-measure the round-2 '4K active bad-2.0 = 0.042' claim (the
    slope statistics say it should be far worse: 24% of the 4K GT has
    |grad| > 1), and run the no-frame-occlusion slope control at
    [540, 1920]/D=256 (same slope distribution as 4K, ~3.6% occluded
    columns vs 40% at Teddy width)."""
    L, R, gt = make_pair(ROWS4K, COLS4K, D4K, seed=0)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    res = streamed_pipeline("ad_census", ADCensusConfig(disp_range=D4K))(Lj, Rj)
    print(f"4K active streamed: bad-2.0 = "
          f"{bad_pixel_rate(np.asarray(res.disp_left), gt):.4f}", flush=True)

    h, w, d = 540, 1920, 256
    L, R, gt = make_pair(h, w, d, seed=0)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    fn, _ = get_pipeline("ad_census")
    res = fn(Lj, Rj, ADCensusConfig(disp_range=d))
    print(f"[540,1920]/D=256 direct active: bad-2.0 = "
          f"{bad_pixel_rate(np.asarray(res.disp_left), gt):.4f}", flush=True)
    cfg = ADCensusConfig(disp_range=d, run_post=True,
                         scanline=ScanlineConfig(penalty_scale="auto"))
    res = streamed_pipeline("ad_census", cfg)(Lj, Rj)  # direct FULL volume
    # set at this size flirts with HBM; streamed == direct in accuracy
    print(f"[540,1920]/D=256 FULL auto (streamed): bad-2.0 = "
          f"{bad_pixel_rate(np.asarray(res.disp_final), gt):.4f}", flush=True)


def final4k():
    """The round-5 4K finale in one process (one compile per program):

    * canonical streamed (item 1): rt from the recalibrated auto model
      with the 10.5 GiB guard; run1 + bad-2.0 + device_time on the
      legacy pair; bad-2.0 on the representative slope-capped pair
      (feature_scale = 24 * D/60 keeps |grad GT| at the D=60 level).
    * active + FULL-'auto' streamed: bad-2.0 on both pairs (the programs
      are pair-independent, so each extra pair is one execution).
    """
    Ll, Rl, gtl = make_pair(ROWS4K, COLS4K, D4K, seed=0)
    fs = 24 * D4K // 60
    Lr, Rr, gtr = make_pair(ROWS4K, COLS4K, D4K, seed=0, feature_scale=fs)
    gy, gx = np.gradient(gtr)
    s = np.hypot(gy, gx)
    print(f"rep pair feature_scale={fs}: slope p50={np.percentile(s, 50):.2f} "
          f"p90={np.percentile(s, 90):.2f} steep {(s > 1).mean():.3f}",
          flush=True)
    pairs = (("legacy", Ll, Rl, gtl), ("rep", Lr, Rr, gtr))

    cfg = ADCensusConfig(
        disp_range=D4K, aggregation="cross_two_pass",
        scanline=ScanlineConfig(), run_post=True,
    )
    # The round-5 "worker crashes above ~10.5 GiB" reading was WRONG — the
    # crashes were the _hsum_pm odd-stride runtime fault (fixed with the
    # sublane stride pad); an 11.7 GiB-temp canonical program executes.
    # Post-fix compile-only scan: rt=432 fails to compile, 320 -> 14.72
    # GiB (too close to HBM), 224 -> 11.67, 136 -> 11.02.  rt=224 is the
    # halo-amortization sweet spot (amp 2.25x).
    rt = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    fn = jax.jit(streamed_pipeline("ad_census", cfg, row_tile=rt))
    t0 = time.time()
    comp = fn.lower(jnp.asarray(Ll), jnp.asarray(Rl)).compile()
    temp = comp.memory_analysis().temp_size_in_bytes / 2**30
    print(f"rt={rt} compiled {time.time()-t0:.0f}s temp={temp:.2f} GiB",
          flush=True)
    if temp > 13.0:
        print("over the 13 GiB bound (320 compiled to 14.7 and was never "
              "risked); aborting the canonical legs", flush=True)
        return
    for label, L, R, gt in pairs:
        t0 = time.time()
        m = np.asarray(comp(jnp.asarray(L), jnp.asarray(R)).disp_final)
        print(f"canonical 4K {label}: run {time.time()-t0:.1f}s "
              f"bad-2.0={bad_pixel_rate(m, gt):.4f}", flush=True)
    sec = device_time(_checksum(lambda l, r: fn(l, r)),
                      (jnp.asarray(Ll), jnp.asarray(Rl)),
                      n_lo=1, n_hi=2, reps=1)
    print(f"canonical 4K device_time {sec:.2f} s  "
          f"{ROWS4K*COLS4K*D4K/sec/1e6:.0f} MPixDisp/s", flush=True)

    for name, c in (
        ("active", ADCensusConfig(disp_range=D4K)),
        ("FULL auto", ADCensusConfig(
            disp_range=D4K, run_post=True,
            scanline=ScanlineConfig(penalty_scale="auto"))),
    ):
        g = jax.jit(streamed_pipeline("ad_census", c))
        for label, L, R, gt in pairs:
            res = g(jnp.asarray(L), jnp.asarray(R))
            m = res.disp_final if res.disp_final is not None else res.disp_left
            print(f"{name} 4K {label}: bad-2.0="
                  f"{bad_pixel_rate(np.asarray(m), gt):.4f}", flush=True)


if __name__ == "__main__":
    {"serving": serving, "sweep4k": sweep4k, "canon4k": canon4k,
     "accuracy4k": accuracy4k, "final4k": final4k}[sys.argv[1]]()
