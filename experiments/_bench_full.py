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

def run_streamed_cfg(cfg, rows, cols, disp, row_tile, label):
    from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline

    fn = streamed_pipeline("ad_census", cfg, row_tile=row_tile)
    L, R, _ = make_pair(rows, cols, disp, seed=0)
    sec = device_time(lambda l, r: checksum(fn(l, r)), (jnp.asarray(L), jnp.asarray(R)), n_hi=3)
    print(f"{label}: {sec*1e3:.2f} ms  {rows*cols*disp/sec/1e6:.0f} MPixDisp/s", flush=True)


run("sad")
run("ncc", disp=200)
run("ad_census")
run("ad_census", ADCensusConfig(scanline=ScanlineConfig(), run_post=True), label="ad_census FULL")
run("ad_census", ADCensusConfig(aggregation="cross_two_pass"), label="ad_census cross_two_pass")
run("cblsm")
run("ad_census", rows=720, cols=1280, disp=128, label="ad_census 720p/D128")
run("asw")
from stereo_match_traditional_tpu.config import ASWConfig  # noqa: E402
run("asw", ASWConfig(approx="grid"), label="asw approx=grid")
run_streamed_cfg(
    ADCensusConfig(disp_range=256, scanline=ScanlineConfig(), run_post=True),
    2160, 3840, 256, 432, "ad_census FULL 4K/D256 streamed rt=432",
)
