"""Adoption check for _GATHER_FAST_SRC_BYTES=24MB: full no-DCE checksums
(every StereoResult field) on the affected pipelines, None vs 24MB,
reps=5.  python _exp_gather_limit2.py"""
import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, CBLSMConfig, ScanlineConfig
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.ops import aggregate
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair

L, R, _ = make_pair(375, 450, 60, seed=0)


def checksum(res):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in res if x is not None)


PIPES = [
    ("cblsm", "cblsm", CBLSMConfig()),
    ("ad_census", "ad_census", ADCensusConfig()),
    ("ad_census FULL", "ad_census",
     ADCensusConfig(scanline=ScanlineConfig(), run_post=True)),
    ("canonical", "ad_census", ADCensusConfig(aggregation="cross_two_pass")),
]
for limit in (None, 24):
    old = aggregate._GATHER_FAST_SRC_BYTES
    if limit is not None:
        aggregate._GATHER_FAST_SRC_BYTES = limit * 1024 * 1024
    try:
        for label, name, cfg in PIPES:
            fn, _ = get_pipeline(name)
            f = lambda l, r: checksum(fn(l, r, cfg))
            t = device_time(f, (L, R), reps=5)
            print(f"limit={limit}MB {label}: {t*1e3:.2f} ms", flush=True)
    finally:
        aggregate._GATHER_FAST_SRC_BYTES = old
