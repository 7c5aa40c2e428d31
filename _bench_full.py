"""Re-measure every pipeline with honest (no-DCE) checksums."""
import numpy as np, jax, jax.numpy as jnp
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.utils.synthetic import make_pair
from stereo_match_traditional_tpu.utils.benchmark import device_time

def checksum(res):
    total = jnp.float32(0.0)
    for f in res:
        if f is not None:
            total = total + jnp.sum(f.astype(jnp.float32))
    return total

def run(name, cfg=None, rows=375, cols=450, disp=60, label=None):
    fn, cfg_cls = get_pipeline(name)
    if cfg is None:
        kw = {}
        for field, val in (("disp_range", disp), ("max_disparity", disp)):
            if field in cfg_cls.__dataclass_fields__:
                kw[field] = val
        cfg = cfg_cls(**kw)
    L, R, gt = make_pair(rows, cols, disp, seed=0)
    sec = device_time(lambda l, r: checksum(fn(l, r, cfg)), (jnp.asarray(L), jnp.asarray(R)))
    ms = sec * 1e3
    mpd = rows * cols * disp / sec / 1e6
    print(f"{label or name}: {ms:.2f} ms  {mpd:.0f} MPixDisp/s", flush=True)

run("sad")
run("ncc", disp=200)
run("ad_census")
run("ad_census", ADCensusConfig(scanline=ScanlineConfig(), run_post=True), label="ad_census FULL")
run("ad_census", ADCensusConfig(aggregation="cross_two_pass"), label="ad_census cross_two_pass")
run("cblsm")
run("ad_census", rows=720, cols=1280, disp=128, label="ad_census 720p/D128")
run("asw")
