"""Block-CCL speckle sweep on the real chip: standalone remove_speckles
on the flagship's LR-checked Teddy map for block in {None, 16, ..., 128}.
python _exp_speckle_block.py [h w d]"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig
from stereo_match_traditional_tpu.models.ad_census import ad_census_pipeline
from stereo_match_traditional_tpu.ops import post
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair

h, w, dr = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (375, 450, 60)
L, R, gt = make_pair(h, w, dr, seed=0)
cfg = ADCensusConfig(disp_range=dr, run_post=False)
res = jax.jit(lambda l, r: ad_census_pipeline(l, r, cfg))(L, R)
lr = post.lr_check_consistency(res.disp_left, res.disp_right, cfg.lr_gate,
                               post.INVALID, disp_range=dr)
dm = jax.block_until_ready(lr.disp)

for blk in (None, 16, 32, 48, 64, 96, 128):
    fn = lambda x: post.remove_speckles(
        x, cfg.speckle_diff, cfg.speckle_area,
        invalid_value=post.INVALID, block=blk)
    t = device_time(fn, (dm,))
    out = np.asarray(jax.jit(fn)(dm))
    print(f"block={blk}: {t*1e3:.3f} ms  killed={np.sum(out == post.INVALID)}",
          flush=True)
