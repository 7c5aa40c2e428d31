"""FULL flagship (scanline + post) A/B over speckle_block at Teddy —
the adoption gate for the block-CCL default (standalone wins don't
transfer; see verify skill).  python _exp_speckle_block_full.py"""
import dataclasses

import numpy as np
import jax

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.models.ad_census import ad_census_pipeline
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair

L, R, _ = make_pair(375, 450, 60, seed=0)
base = ADCensusConfig(scanline=ScanlineConfig(), run_post=True)

ref = None
for blk in (None, 32, 48, 64, 96):
    cfg = dataclasses.replace(base, speckle_block=blk)
    fn = lambda l, r: ad_census_pipeline(l, r, cfg).disp_final
    out = np.asarray(jax.jit(fn)(L, R))
    if ref is None:
        ref = out
    t = device_time(fn, (L, R))
    print(f"block={blk}: FULL {t*1e3:.2f} ms  equal={np.array_equal(out, ref)}",
          flush=True)
