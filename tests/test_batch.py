"""Batched execution + serving loop."""

import numpy as np

import jax.numpy as jnp

from stereo_match_traditional_tpu import config as cfgs
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.models.batch import batched_pipeline, serve_pairs
from stereo_match_traditional_tpu.utils.synthetic import make_pair


def _pairs(n, h=32, w=44, d=8):
    return [make_pair(h, w, d, seed=s)[:2] for s in range(n)]


def test_batched_matches_single():
    cfg = cfgs.SADConfig(max_disparity=8, winsize=1)
    pairs = _pairs(3)
    run = batched_pipeline("sad", cfg)
    ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    rs = jnp.asarray(np.stack([p[1] for p in pairs]))
    batched = np.asarray(run(ls, rs).disp_left)
    fn, _ = get_pipeline("sad")
    for k, (l, r) in enumerate(pairs):
        single = np.asarray(fn(jnp.asarray(l), jnp.asarray(r), cfg).disp_left)
        np.testing.assert_array_equal(batched[k], single)


def test_serve_pairs_partial_batch():
    cfg = cfgs.SADConfig(max_disparity=8, winsize=1)
    pairs = _pairs(5)
    out = list(serve_pairs("sad", pairs, cfg, batch_size=2))
    assert len(out) == 5
    fn, _ = get_pipeline("sad")
    want = np.asarray(fn(jnp.asarray(pairs[4][0]), jnp.asarray(pairs[4][1]), cfg).disp_left)
    np.testing.assert_array_equal(out[4], want)


def test_serve_with_native_loader(tmp_path):
    from stereo_match_traditional_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    cfg = cfgs.SADConfig(max_disparity=8, winsize=1)
    paths = []
    for k, (l, r) in enumerate(_pairs(4)):
        lp = str(tmp_path / f"l{k}.pgm")
        rp = str(tmp_path / f"r{k}.pgm")
        native.write_pnm(lp, l)
        native.write_pnm(rp, r)
        paths.append((lp, rp))
    loader = native.PairLoader(paths, threads=2, depth=2)
    out = list(serve_pairs("sad", loader, cfg, batch_size=2))
    assert len(out) == 4 and out[0].shape == (32, 44)


def test_batched_pipeline_mesh_batch_dp():
    """Batch-DP: the batch axis sharded over a device mesh equals the
    unsharded batch bit-for-bit (per-example programs are identical;
    zero collectives)."""
    import pytest

    from stereo_match_traditional_tpu.parallel import make_mesh

    cfg = cfgs.SADConfig(max_disparity=8, winsize=1)
    pairs = _pairs(8)
    ls = np.stack([p[0] for p in pairs])
    rs = np.stack([p[1] for p in pairs])
    want = batched_pipeline("sad", cfg)(jnp.asarray(ls), jnp.asarray(rs))
    mesh = make_mesh(4, ("batch",))
    run = batched_pipeline("sad", cfg, mesh=mesh)
    got = run(jnp.asarray(ls), jnp.asarray(rs))
    np.testing.assert_array_equal(np.asarray(want.disp_left), np.asarray(got.disp_left))
    with pytest.raises(ValueError, match="divide"):
        run(jnp.asarray(ls[:6]), jnp.asarray(rs[:6]))
