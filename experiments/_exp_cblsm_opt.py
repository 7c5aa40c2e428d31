"""Round-4 cblsm optimization candidates, measured e2e at Teddy/D=60.

1. baseline active cblsm
2/3. forced row-chunked gather sources (_GATHER_FAST_SRC_BYTES lowered):
   does the pass-2 stacked [120] source (81 MB) sit past the VMEM pick
   cliff?
4. tall-stacked pass 1: both views stacked on the ROW axis -> one SAT +
   one 8-pick gather call (arms never exceed their image, so rect bounds
   cannot cross the seam; fp-only drift from the taller SAT cancellation).

python _exp_cblsm_opt.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import CBLSMConfig
from stereo_match_traditional_tpu.models.cblsm import cblsm_pipeline
from stereo_match_traditional_tpu.ops import aggregate, volume, wta
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair

cfg = CBLSMConfig()
d = cfg.disp_range
ms = cfg.arms.max_length
L, R, _ = make_pair(375, 450, d, seed=0)
H = L.shape[0]

base_fn = lambda l, r: cblsm_pipeline(l, r, cfg).disp_left
ref = np.asarray(jax.jit(base_fn)(L, R))
t = device_time(base_fn, (L, R))
print(f"baseline e2e: {t*1e3:.2f} ms", flush=True)

for limit in (48, 24):
    old = aggregate._GATHER_FAST_SRC_BYTES
    aggregate._GATHER_FAST_SRC_BYTES = limit * 1024 * 1024
    try:
        out = np.asarray(jax.jit(base_fn)(L, R))
        t = device_time(base_fn, (L, R))
        print(f"chunk-limit {limit}MB e2e: {t*1e3:.2f} ms  "
              f"equal={np.array_equal(out, ref)}", flush=True)
    finally:
        aggregate._GATHER_FAST_SRC_BYTES = old


def tall_fn(l, r):
    arms_l = aggregate.cross_arms(l, cfg.arms)
    arms_r = aggregate.cross_arms(r, cfg.arms)
    vol_l = volume.ad_volume(l, r, d, "left")
    vol_r = volume.ad_volume(l, r, d, "right")
    vol_tall = jnp.concatenate([vol_l, vol_r], axis=1)       # [D, 2H, W]
    arms_tall = aggregate.Arms(*(jnp.concatenate([a, b], axis=0)
                                 for a, b in zip(arms_l, arms_r)))
    agg1 = aggregate.rect_mean_aggregate(vol_tall, arms_tall, max_span=ms)
    both = jnp.concatenate([agg1[:, :H], agg1[:, H:]], axis=0)  # [2D, H, W]
    both = aggregate.rect_mean_aggregate(both, arms_l, max_span=ms)
    return wta.wta(both[:d], "min")


out = np.asarray(jax.jit(tall_fn)(L, R))
t = device_time(tall_fn, (L, R))
diff = np.sum(out != ref)
print(f"tall-stacked p1 e2e: {t*1e3:.2f} ms  tie_flips={diff} "
      f"({diff/out.size*100:.3f}%)", flush=True)
