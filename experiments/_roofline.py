"""Stage micro-benchmarks for the BASELINE.md roofline appendix.

Measures each flagship stage (and the ASW kernel) in isolation with
`utils.benchmark.device_time` on the Teddy workload; the appendix turns
these into %-of-hardware-bound numbers (v5e public peaks: 197 bf16
TFLOP/s MXU -> ~197/6 f32-HIGHEST, 819 GB/s HBM; VPU/scalar-core bounds
derived per stage from op counts — see BASELINE.md "Roofline").

Run on the TPU: python _roofline.py
"""
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

from stereo_match_traditional_tpu.config import ADCensusConfig, CrossArmConfig, ScanlineConfig
from stereo_match_traditional_tpu.ops import aggregate, post, scanline, volume, wta
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair

H, W, D = 375, 450, 60
L, R, _ = make_pair(H, W, D, seed=0)
L = jnp.asarray(L)
R = jnp.asarray(R)
cfg = ADCensusConfig(disp_range=D)

vol = volume.ad_census_volume(L, R, D, cfg.sigma_c, cfg.sigma_s, 9, 7, "left")
vol = jax.block_until_ready(vol)
arms = jax.tree_util.tree_map(jax.block_until_ready,
                              aggregate.cross_arms(L, cfg.arms))
agg = jax.block_until_ready(aggregate.rect_mean_aggregate(vol, arms))
disp = jax.block_until_ready(wta.wta(agg, "min"))
disp_r = jax.block_until_ready(
    wta.wta(aggregate.rect_mean_aggregate(
        volume.ad_census_volume(L, R, D, cfg.sigma_c, cfg.sigma_s, 9, 7, "right"),
        aggregate.cross_arms(R, cfg.arms)), "min"))


def t(label, fn, args):
    sec = device_time(fn, args, n_hi=24)
    print(f"{label}: {sec*1e3:.3f} ms", flush=True)
    return sec


# 1. fused cost, both views (the reference's hottest loop, AD-Census.h:142-294)
t("cost both views", lambda l, r: (
    jnp.sum(volume.ad_census_volume(l, r, D, cfg.sigma_c, cfg.sigma_s, 9, 7, "left"))
    + jnp.sum(volume.ad_census_volume(l, r, D, cfg.sigma_c, cfg.sigma_s, 9, 7, "right"))
), (L, R))

# 2. the two MXU SAT cumsums alone (one volume)
t("sat cumsums", lambda v: jnp.sum(aggregate._sat(v)), (vol,))

# 3. full rect-mean pass (SAT + 4 corner gathers + normalize), one volume
t("rect_mean pass", lambda v: jnp.sum(aggregate.rect_mean_aggregate(v, arms)), (vol,))

# 4. arms growth (one image)
t("cross_arms", lambda img: sum(jnp.sum(a) for a in aggregate.cross_arms(img, cfg.arms)), (L,))

# 5. legacy 4-path scanline
t("scanline 4-path", lambda v, g: jnp.sum(
    scanline.scanline_optimize(v, g, ScanlineConfig())), (agg, L))

# 6. WTA
t("wta", lambda v: jnp.sum(wta.wta(v, "min")), (agg,))

# 7. post stages on the active-path maps
lr = post.lr_check_consistency(disp, disp_r, cfg.lr_gate, post.INVALID, disp_range=D)
lrd = jax.block_until_ready(lr.disp)
t("lr_check", lambda a, b: jnp.sum(post.lr_check_consistency(
    a, b, cfg.lr_gate, post.INVALID, disp_range=D).disp), (disp, disp_r))
t("speckle flood", lambda d: jnp.sum(post.remove_speckles(
    d, cfg.speckle_diff, cfg.speckle_area, invalid_value=post.INVALID)), (lrd,))
spk = jax.block_until_ready(post.remove_speckles(
    lrd, cfg.speckle_diff, cfg.speckle_area, invalid_value=post.INVALID))
t("fill_holes_8dir", lambda d, o, m: jnp.sum(jnp.where(jnp.isfinite(
    post.fill_holes_8dir(d, o, m, post.INVALID, max_search=D)), 1.0, 0.0)),
  (spk, lr.occlusion, lr.mismatch))
t("median 3x3", lambda d: jnp.sum(post.median_filter(d, 3, border="truncate")), (spk,))

# 8. ASW Pallas kernel, one volume (the VPU-bound stage)
if jax.default_backend() == "tpu":
    from stereo_match_traditional_tpu.ops.kernels import asw_volume_pallas

    t("asw pallas volume", lambda l, r: jnp.sum(asw_volume_pallas(
        l, r, disp_range=60, win_size=11, space_sigma=50.0, color_sigma=30.0,
        truncation=40.0, view="left")), (L, R))
