"""Post-processing vs. oracles: LR checks, speckles, fills, medians."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from stereo_match_traditional_tpu.ops import post


def _disp_maps(seed=0, h=10, w=14, dmax=8):
    rng = np.random.default_rng(seed)
    dl = rng.integers(0, dmax, size=(h, w)).astype(np.float32)
    dr = rng.integers(0, dmax, size=(h, w)).astype(np.float32)
    return dl, dr


def test_lr_check_simple_matches_oracle():
    dl, dr = _disp_maps()
    got = post.lr_check_simple(dl, dr, gate=2.0, invalid_value=np.inf)
    want_d, want_o, want_m = oracles.lr_check_simple(dl, dr, 2.0, np.inf)
    np.testing.assert_array_equal(np.asarray(got.disp), want_d)
    np.testing.assert_array_equal(np.asarray(got.occlusion), want_o)
    np.testing.assert_array_equal(np.asarray(got.mismatch), want_m)


def test_lr_check_consistency_basic():
    """Consistent maps pass; inconsistent pixels are invalidated."""
    h, w = 6, 20
    gt = np.full((h, w), 4.0, np.float32)
    dl = gt.copy()
    dr = gt.copy()
    dl[3, 10] = 9.0  # broken pixel
    res = post.lr_check_consistency(dl, dr, gate=1.0)
    out = np.asarray(res.disp)
    assert np.isinf(out[3, 10])
    interior = out[:, 5:]  # pixels whose reprojection stays in range
    finite = np.isfinite(interior)
    assert finite.sum() > 0
    assert (interior[finite] == 4.0).all()


def test_remove_speckles_matches_bfs_oracle():
    rng = np.random.default_rng(5)
    h, w = 16, 18
    d = np.zeros((h, w), np.float32)
    d[:8, :9] = 3.0
    d[10:12, 12:14] = 9.0     # 4-pixel speckle
    d[14, 2] = 20.0           # 1-pixel speckle
    d += rng.uniform(0, 0.4, size=(h, w)).astype(np.float32)
    got = np.asarray(post.remove_speckles(d, 1.0, 6, invalid_value=np.inf))
    want = oracles.remove_speckles(d, 1.0, 6, np.inf)
    np.testing.assert_array_equal(got, want)


def test_remove_speckles_background_skip():
    d = np.zeros((8, 8), np.float32)
    d[2, 2] = 5.0
    got = np.asarray(
        post.remove_speckles(d, 1.0, 3, invalid_value=np.inf, background=0.0)
    )
    want = oracles.remove_speckles(d, 1.0, 3, np.inf, background=0.0)
    np.testing.assert_array_equal(got, want)
    assert np.isinf(got[2, 2])       # tiny non-zero blob removed
    assert (got[0] == 0).all()       # zero background untouched


def test_remove_speckles_block_ccl_bitwise():
    """Two-level block CCL (local flood with cut borders + hook-and-jump
    closure of the cut edges) is the SAME function as the single-level
    flood — including non-dividing block sizes, 4-connectivity, the
    background seed rule, and a serpentine whose component crosses every
    block line many times."""
    rng = np.random.default_rng(11)
    h, w = 53, 71
    d = rng.integers(0, 6, (h, w)).astype(np.float32) * 2
    d[rng.random((h, w)) < 0.3] = np.inf
    for conn in (4, 8):
        for bg in (None, 0.0):
            want = np.asarray(post.remove_speckles(
                d, 1.0, 24, invalid_value=np.inf,
                connectivity=conn, background=bg))
            for blk in (7, 16):
                got = np.asarray(post.remove_speckles(
                    d, 1.0, 24, invalid_value=np.inf,
                    connectivity=conn, background=bg, block=blk))
                np.testing.assert_array_equal(
                    got, want, err_msg=f"conn={conn} bg={bg} block={blk}")

    snake = np.full((40, 81), np.inf, np.float32)
    snake[::2, :] = 3.0
    for i in range(1, 40, 2):
        snake[i, 0 if (i // 2) % 2 else -1] = 3.0
    want = np.asarray(post.remove_speckles(snake, 1.0, 5000, invalid_value=np.inf))
    got = np.asarray(post.remove_speckles(
        snake, 1.0, 5000, invalid_value=np.inf, block=8))
    np.testing.assert_array_equal(got, want)
    assert np.isinf(got).all()  # one big snake component, area < 5000


def test_median_truncate_matches_oracle():
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 50, size=(9, 11)).astype(np.float32)
    got = np.asarray(post.median_filter(x, 3, "truncate"))
    want = oracles.median_filter_truncate(x, 3)
    np.testing.assert_allclose(got, want)


def test_median_replicate_center():
    x = np.arange(25, dtype=np.float32).reshape(5, 5)
    got = np.asarray(post.median_filter(x, 3, "replicate"))
    assert got[2, 2] == 12.0


@pytest.mark.slow
def test_fill_holes_matches_oracle():
    rng = np.random.default_rng(9)
    h, w = 12, 15
    d = rng.integers(1, 9, size=(h, w)).astype(np.float32)
    occl = np.zeros((h, w), bool)
    mism = np.zeros((h, w), bool)
    occl[3, 4] = occl[7, 9] = True
    mism[5, 5] = mism[10, 2] = True
    d[occl | mism] = np.inf
    d[6, 6] = np.inf  # leftover invalid for the k==2 pass

    got = np.asarray(post.fill_holes_8dir(d, occl, mism, np.inf))

    cur = d.copy()
    cur = oracles.fill_pass(cur, occl & ~np.isfinite(cur), True)
    cur = oracles.fill_pass(cur, mism & ~np.isfinite(cur), False)
    cur = oracles.fill_pass(cur, ~np.isfinite(cur), False)
    np.testing.assert_allclose(got, cur)


@pytest.mark.slow
def test_directional_candidates_axis_and_diag():
    d = np.zeros((5, 5), np.float32)
    d[0, 0] = 3.0
    d[2, 4] = 7.0
    valid = d != 0
    vals, steps = post.directional_candidates(d, valid)
    vals = np.asarray(vals)
    # from (2,2): NW ray hits (0,0)=3 at 2 diagonal steps; E ray hits (2,4)=7
    got = sorted(v for v in vals[:, 2, 2] if np.isfinite(v))
    assert got == [3.0, 7.0]


def test_fill_image_new_semantics():
    d = np.array([[0, 0, 5, 0, 7, 0]], np.float32)
    got = np.asarray(post.fill_image_new(d))
    # left-nearest first, else right-nearest, else 0
    np.testing.assert_array_equal(got, [[5, 5, 5, 5, 7, 7]])


def test_fill_image_left_only():
    d = np.array([[0, 4, 0, 0]], np.float32)
    got = np.asarray(post.fill_image(d))
    np.testing.assert_array_equal(got, [[0, 4, 4, 4]])


def test_fill_image_last_vertical():
    d = np.array([[0], [3], [0]], np.float32)
    got = np.asarray(post.fill_image_last(d))
    np.testing.assert_array_equal(got, [[3], [3], [3]])


def test_remove_speckles_background_joins_components():
    """Background pixels are skipped as seeds only (`Sad.h:265`): a small
    nonzero blob adjacent to zeros absorbs them, exceeds the threshold, and
    survives — and an all-zero region is never visited."""
    d = np.zeros((7, 9), np.float32)
    d[3, 3:6] = 1.0  # 3 nonzero pixels in a sea of zeros
    out = np.asarray(
        post.remove_speckles(d, 1.0, 10, invalid_value=np.inf, background=0.0)
    )
    # |0-1| <= 1 so every neighboring zero joins; area >> 10 -> all survive
    np.testing.assert_array_equal(out, d)


def test_fill_image_second_times_keeps_nonzero_low_values():
    """Nonzero pixels <= threshold read themselves at offset 0 (`Sad.h:510`)
    and keep their value; only zeros are filled."""
    d = np.array([[15.0, 0.0, 30.0, 5.0, 0.0]], np.float32)
    out = np.asarray(post.fill_image_second_times(d, threshold=20.0))
    np.testing.assert_array_equal(out, [[15.0, 30.0, 30.0, 5.0, 20.0]])


def test_remove_speckles_connectivity4():
    """4-connectivity (OpenCV filterSpeckles): corner-touching blobs stay
    separate components; 8-connectivity merges them."""
    d = np.full((8, 8), np.inf, np.float32)
    d[1:3, 1:3] = 5.0   # 4 pixels
    d[3:5, 3:5] = 5.0   # 4 pixels, touching only at corner (2,2)-(3,3)
    got4 = np.asarray(post.remove_speckles(d, 1.0, 6, invalid_value=np.inf, connectivity=4))
    assert not np.isfinite(got4).any()  # two components of 4 < 6: both die
    got8 = np.asarray(post.remove_speckles(d, 1.0, 6, invalid_value=np.inf, connectivity=8))
    assert np.isfinite(got8).sum() == 8  # one 8-connected component of 8 >= 6


@pytest.mark.slow
def test_remove_speckles_max_iters_bounds_loop():
    d = np.where(np.eye(64) > 0, 1.0, np.inf).astype(np.float32)
    out = np.asarray(
        post.remove_speckles(d, 1.0, 2, invalid_value=np.inf, max_iters=1)
    )
    assert out.shape == (64, 64)  # bounded loop returns (possibly unconverged)


def test_remove_speckles_serpentine_converges():
    """Regression: a single snaking component whose min-label path crosses
    ~rows junctions must fully converge (pointer jumps), not hit the
    iteration cap and silently self-fragment into below-area pieces that
    all get invalidated."""
    h, w = 512, 17
    d = np.full((h, w), np.inf, np.float32)
    for r in range(0, h, 2):
        d[r, :] = 5.0                      # horizontal rungs
        if r + 1 < h:
            d[r + 1, -1 if (r // 2) % 2 == 0 else 0] = 5.0  # alternating joins
    n_pix = int(np.isfinite(d).sum())
    # 80 iterations: far below the ~h/4 pure sweeps this snake needs, ample
    # for the O(log) pointer-jump path — pins the convergence guarantee
    out = np.asarray(
        post.remove_speckles(d, 1.0, n_pix, invalid_value=np.inf, max_iters=80)
    )
    # one connected component of exactly n_pix >= min_area: nothing killed
    np.testing.assert_array_equal(np.isfinite(out), np.isfinite(d))
    # and the same snake one pixel smaller than the threshold dies entirely
    out2 = np.asarray(
        post.remove_speckles(d, 1.0, n_pix + 1, invalid_value=np.inf, max_iters=80)
    )
    assert not np.isfinite(out2).any()


def test_lr_check_banded_matches_gather():
    """disp_range-banded shift+select == take_along_axis gathers, including
    invalid (inf / 0) entries in both maps."""
    rng = np.random.default_rng(7)
    h, w, dmax = 40, 90, 16
    dl = rng.integers(0, dmax, (h, w)).astype(np.float32)
    dr = rng.integers(0, dmax, (h, w)).astype(np.float32)
    dr[rng.random((h, w)) < 0.1] = np.inf
    dl_inf = dl.copy()
    dl_inf[rng.random((h, w)) < 0.1] = np.inf
    for fn, dleft, kw in [
        # consistency handles already-invalid left entries by spec;
        # lr_check_simple's contract is a finite (raw-WTA) left map
        (post.lr_check_consistency, dl_inf, dict(gate=1.0)),
        (post.lr_check_simple, dl, dict(gate=5.0)),
        (post.lr_check_simple, dl, dict(gate=5.0, invalid_value=0.0)),
    ]:
        a = fn(jnp.asarray(dleft), jnp.asarray(dr), **kw)
        b = fn(jnp.asarray(dleft), jnp.asarray(dr), disp_range=dmax, **kw)
        np.testing.assert_array_equal(np.asarray(a.disp), np.asarray(b.disp))
        np.testing.assert_array_equal(
            np.asarray(a.occlusion), np.asarray(b.occlusion)
        )
        np.testing.assert_array_equal(
            np.asarray(a.mismatch), np.asarray(b.mismatch)
        )
