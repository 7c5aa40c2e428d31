"""Real-hardware smoke tests (compiled TPU lowering, not the interpreter).

The default suite runs every kernel on the CPU backend (conftest forces
``JAX_PLATFORMS=cpu``); the Pallas ASW kernel in particular then runs in
*interpreter* mode, which cannot catch Mosaic lowering bugs.  These tests
run the five active pipelines compiled on the actual attached accelerator:

    STEREO_TESTS_TPU=1 python -m pytest tests/test_tpu_smoke.py -m tpu -q

They are skipped under the stock CPU-forced suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_match_traditional_tpu import config as cfgs
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate, make_pair

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="needs the real accelerator (run with STEREO_TESTS_TPU=1)",
    ),
]


@pytest.mark.parametrize(
    "name,cfg,max_bad2",
    [
        ("sad", cfgs.SADConfig(), 0.30),
        ("ncc", cfgs.NCCConfig(disp_range=60), 0.30),
        ("asw", cfgs.ASWConfig(), 0.15),            # compiled Pallas kernel
        ("ad_census", cfgs.ADCensusConfig(), 0.15),
        ("cblsm", cfgs.CBLSMConfig(), 0.20),
    ],
)
def test_pipeline_on_hardware(name, cfg, max_bad2):
    L, R, gt = make_pair(375, 450, 60, seed=0)
    fn, _ = get_pipeline(name)
    res = jax.jit(lambda l, r: fn(l, r, cfg))(jnp.asarray(L), jnp.asarray(R))
    dl = np.asarray(res.disp_left)
    assert np.isfinite(dl).all() or name == "ncc"  # ncc may carry sentinels
    d_max = getattr(cfg, "disp_range", getattr(cfg, "max_disparity", 60))
    finite = dl[np.isfinite(dl)]
    assert finite.min() >= 0 and finite.max() <= d_max
    bad2 = bad_pixel_rate(dl, gt)
    assert bad2 <= max_bad2, (name, bad2)


def test_full_flagship_on_hardware():
    """The heaviest compiled program: scanline (lax.scan over columns) +
    the complete post chain (speckle flood, 8-dir fill, median) lowered to
    the real accelerator, not the CPU simulator."""
    L, R, gt = make_pair(375, 450, 60, seed=0)
    cfg = cfgs.ADCensusConfig(scanline=cfgs.ScanlineConfig(), run_post=True)
    fn, _ = get_pipeline("ad_census")
    res = jax.jit(lambda l, r: fn(l, r, cfg))(jnp.asarray(L), jnp.asarray(R))
    df = np.asarray(res.disp_final)
    assert df.shape == (375, 450) and np.isfinite(df).all()
    assert bad_pixel_rate(df, gt) <= 0.15


def test_canonical_cross_two_pass_on_hardware():
    """The canonical (ADCensusOption) path's banded-MXU einsum aggregation
    compiled on hardware (method='auto' selects the matmul path here)."""
    L, R, gt = make_pair(375, 450, 60, seed=0)
    cfg = cfgs.ADCensusConfig(aggregation="cross_two_pass")
    fn, _ = get_pipeline("ad_census")
    res = jax.jit(lambda l, r: fn(l, r, cfg))(jnp.asarray(L), jnp.asarray(R))
    dl = np.asarray(res.disp_left)
    assert np.isfinite(dl).all() and dl.min() >= 0 and dl.max() <= 60
    assert bad_pixel_rate(dl, gt) <= 0.15


def test_box_sum_exact_f32_on_hardware():
    """Regression: the box-sum einsums must run at precision HIGHEST — the
    TPU's default matmul truncates f32 operands to bf16, which corrupted
    NCC's squared-intensity window sums by up to 656 absolute (the
    degenerate-variance mask assumes exact-f32 error < 0.5).  The CPU
    backend ignores precision, so only a hardware run can catch this."""
    from stereo_match_traditional_tpu.ops.volume import box_sum_same

    L, _, _ = make_pair(375, 450, 60, seed=0)
    sq = (L.astype(np.float32) - 128.0) ** 2
    got = np.asarray(jax.jit(lambda x: box_sum_same(x, 5, 5))(jnp.asarray(sq)))
    pad = np.pad(sq.astype(np.float64), 5)
    want = np.zeros_like(sq, np.float64)
    for dy in range(11):
        for dx in range(11):
            want += pad[dy : dy + 375, dx : dx + 450]
    np.testing.assert_allclose(got, want, atol=0.25)


def test_asw_pallas_compiled_matches_jnp():
    """The compiled Mosaic kernel == the jnp scan on hardware (the CPU
    suite only checks the interpreter)."""
    from stereo_match_traditional_tpu.ops.kernels import asw_volume_pallas
    from stereo_match_traditional_tpu.ops.volume import asw_volume

    L, R, _ = make_pair(48, 140, 12, seed=1)
    got = np.asarray(
        asw_volume_pallas(jnp.asarray(L), jnp.asarray(R), 12, win_size=3,
                          interpret=False)
    )
    want = np.asarray(asw_volume(L, R, 12, win_size=3))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_streamed_scanline_on_hardware():
    """The streamed FULL flagship (vertical band carries inside two
    lax.scan sweeps) compiled on the real accelerator equals the direct
    pipeline's known accuracy — band-carry bugs that the CPU interpreter
    masks (layout, scan-carry aliasing) surface here."""
    from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline

    L, R, gt = make_pair(375, 450, 60, seed=0)
    cfg = cfgs.ADCensusConfig(scanline=cfgs.ScanlineConfig(), run_post=True)
    fn = jax.jit(streamed_pipeline("ad_census", cfg, row_tile=128))
    df = np.asarray(fn(jnp.asarray(L), jnp.asarray(R)).disp_final)
    assert df.shape == (375, 450) and np.isfinite(df).all()
    assert bad_pixel_rate(df, gt) <= 0.15


def test_asw_approx_grid_on_hardware():
    """The opt-in bilateral-grid ASW (banded Gaussian MXU matmuls at
    precision HIGHEST) compiled on hardware; quality within its measured
    envelope of the exact kernel."""
    L, R, gt = make_pair(375, 450, 60, seed=0)
    fn, _ = get_pipeline("asw")
    cfg = cfgs.ASWConfig(approx="grid")
    res = jax.jit(lambda l, r: fn(l, r, cfg))(jnp.asarray(L), jnp.asarray(R))
    dl = np.asarray(res.disp_left)
    assert np.isfinite(dl).all() and dl.min() >= 0 and dl.max() <= 60
    assert bad_pixel_rate(dl, gt) <= 0.15


def test_pm_span_sums_wide_geometry_on_hardware():
    """Regression guard for the round-5 XLA:TPU runtime fault: chunked
    pixel-major span-sum gathers with an odd flat stride executed
    incorrectly (worker crashes / "TPU backend error") at W >= 3072 —
    fixed by the sublane stride pad (`aggregate._hsum_pm`).  Runs the pm
    h-span sum at a crash geometry and cross-checks the row sums against
    a direct computation on a sample row.  ~400 MB of arrays; hardware
    suite only."""
    from stereo_match_traditional_tpu.ops import aggregate

    rng = np.random.default_rng(0)
    h, w, d = 96, 3456, 256          # W in the measured crash range
    x = jnp.asarray(rng.standard_normal((h, w, d)).astype(np.float32))
    arm = jnp.asarray(rng.integers(0, 34, (h, w), dtype=np.int32))
    out = np.asarray(jax.jit(aggregate._hsum_pm)(x, arm, arm))
    xs = np.asarray(x)
    arms = np.asarray(arm)
    i = 7
    for j in (0, 1234, w - 1):
        lo = max(0, j - arms[i, j])
        hi = min(w - 1, j + arms[i, j])
        want = xs[i, lo:hi + 1].sum(axis=0)
        np.testing.assert_allclose(out[i, j], want, rtol=1e-4, atol=1e-4)
