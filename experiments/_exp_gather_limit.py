"""Sweep _GATHER_FAST_SRC_BYTES (the row-chunked gather-source threshold)
over the cblsm and ad_census flagship e2e pipelines — round-4 follow-up to
the measured 'chunk-limit 24MB wins' signal.  python _exp_gather_limit.py"""
import numpy as np
import jax

from stereo_match_traditional_tpu.config import ADCensusConfig, CBLSMConfig
from stereo_match_traditional_tpu.models.ad_census import ad_census_pipeline
from stereo_match_traditional_tpu.models.cblsm import cblsm_pipeline
from stereo_match_traditional_tpu.ops import aggregate
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair

L, R, _ = make_pair(375, 450, 60, seed=0)
cb, ad = CBLSMConfig(), ADCensusConfig()
PIPES = [
    ("cblsm", lambda l, r: cblsm_pipeline(l, r, cb).disp_left),
    ("ad_census", lambda l, r: ad_census_pipeline(l, r, ad).disp_left),
]
refs = {}
for limit in (None, 32, 24, 16, 12, 8):
    old = aggregate._GATHER_FAST_SRC_BYTES
    if limit is not None:
        aggregate._GATHER_FAST_SRC_BYTES = limit * 1024 * 1024
    try:
        for name, fn in PIPES:
            out = np.asarray(jax.jit(fn)(L, R))
            if name not in refs:
                refs[name] = out
            t = device_time(fn, (L, R), reps=5)
            print(f"limit={limit}MB {name}: {t*1e3:.2f} ms  "
                  f"equal={np.array_equal(out, refs[name])}", flush=True)
    finally:
        aggregate._GATHER_FAST_SRC_BYTES = old
