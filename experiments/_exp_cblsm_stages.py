"""Per-stage device timings of the active cblsm pipeline at Teddy
(finds the round-4 optimization target).  python _exp_cblsm_stages.py"""
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import CBLSMConfig
from stereo_match_traditional_tpu.models.cblsm import cblsm_pipeline
from stereo_match_traditional_tpu.ops import aggregate, volume, wta
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair

cfg = CBLSMConfig()
d = cfg.disp_range
L, R, _ = make_pair(375, 450, d, seed=0)

arms_l = jax.block_until_ready(aggregate.cross_arms(L, cfg.arms))
arms_r = jax.block_until_ready(aggregate.cross_arms(R, cfg.arms))
vol_l = jax.block_until_ready(volume.ad_volume(L, R, d, "left"))
vol_r = jax.block_until_ready(volume.ad_volume(L, R, d, "right"))
agg1_l = jax.block_until_ready(
    aggregate.rect_mean_aggregate(vol_l, arms_l, max_span=cfg.arms.max_length))
agg1_r = jax.block_until_ready(
    aggregate.rect_mean_aggregate(vol_r, arms_r, max_span=cfg.arms.max_length))
both = jnp.concatenate([agg1_l, agg1_r], axis=0)

ms = cfg.arms.max_length
rows = [
    ("arms_x2", lambda l, r: jnp.stack(
        aggregate.cross_arms(l, cfg.arms) + aggregate.cross_arms(r, cfg.arms)),
     (L, R)),
    ("advol_x2", lambda l, r: volume.ad_volume(l, r, d, "left")
     + volume.ad_volume(l, r, d, "right"), (L, R)),
    ("rect_p1_l", lambda v: aggregate.rect_mean_aggregate(
        v, arms_l, max_span=ms), (vol_l,)),
    ("rect_p1_both", lambda vl, vr: aggregate.rect_mean_aggregate(
        vl, arms_l, max_span=ms)
     + aggregate.rect_mean_aggregate(vr, arms_r, max_span=ms), (vol_l, vol_r)),
    ("rect_p2_stacked", lambda b: aggregate.rect_mean_aggregate(
        b, arms_l, max_span=ms), (both,)),
    ("wta_x2", lambda a, b: wta.wta(a, "min") + wta.wta(b, "min"),
     (agg1_l, agg1_r)),
    ("e2e", lambda l, r: cblsm_pipeline(l, r, cfg).disp_left, (L, R)),
]
for name, fn, args in rows:
    t = device_time(fn, args)
    print(f"{name}: {t*1e3:.2f} ms", flush=True)
