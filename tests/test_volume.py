"""Cost-volume kernels vs. NumPy oracles (unit tests per SURVEY.md §4)."""

import numpy as np
import pytest

import oracles
from stereo_match_traditional_tpu.ops import volume


def test_ad_volume_left_right(tiny_pair):
    L, R, _ = tiny_pair
    for view in ("left", "right"):
        got = np.asarray(volume.ad_volume(L, R, 8, view))
        want = oracles.ad_volume(L, R, 8, view)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_sad_volume(tiny_pair):
    L, R, _ = tiny_pair
    got = np.asarray(volume.sad_volume(L, R, 8, winsize=1, view="left"))
    want = oracles.sad_volume(L, R, 8, winsize=1, view="left")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_sad_volume_right(tiny_pair):
    L, R, _ = tiny_pair
    got = np.asarray(volume.sad_volume(L, R, 8, winsize=1, view="right"))
    want = oracles.sad_volume(L, R, 8, winsize=1, view="right")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_sad_volume_mean(tiny_pair):
    L, R, _ = tiny_pair
    got = np.asarray(volume.sad_volume(L, R, 6, winsize=2, view="left", mean=True))
    want = oracles.sad_volume(L, R, 6, winsize=2, view="left", mean=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_ncc_volume(tiny_pair):
    L, R, _ = tiny_pair
    win = 3
    got, interior = volume.ncc_volume(L, R, 8, win)
    got = np.asarray(got)
    want = oracles.ncc_volume(L, R, 8, win)
    inter = np.asarray(interior)
    # compare only interior, valid, non-degenerate entries
    mask = inter[None] & (want > -2) & np.isfinite(want)
    np.testing.assert_allclose(got[mask], want[mask], atol=2e-3)


def test_census_transform_bits():
    img = np.arange(30, dtype=np.uint8).reshape(5, 6) * 7 % 251
    hi, lo = volume.census_transform(img, 9, 7)
    codes = oracles.census_codes(img, 9, 7)
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(lo).astype(
        np.uint64
    )
    # oracle codes are python ints of 63 bits: hi holds the first 31 bits
    for i in range(5):
        for j in range(6):
            want = int(codes[i, j])
            g = (int(np.asarray(hi)[i, j]) << 32) | (int(np.asarray(lo)[i, j]) & 0xFFFFFFFF)
            assert g == want, (i, j, bin(g), bin(want))


def test_census_volume(tiny_pair):
    L, R, _ = tiny_pair
    got = np.asarray(volume.census_volume(L, R, 6, 9, 7, "left"))
    want = oracles.census_volume(L, R, 6, 9, 7, "left")
    np.testing.assert_array_equal(got, want)


def test_census_volume_right(tiny_pair):
    L, R, _ = tiny_pair
    got = np.asarray(volume.census_volume(L, R, 6, 9, 7, "right"))
    want = oracles.census_volume(L, R, 6, 9, 7, "right")
    np.testing.assert_array_equal(got, want)


def test_ad_census_fusion(tiny_pair):
    L, R, _ = tiny_pair
    got = np.asarray(volume.ad_census_volume(L, R, 6, 10.0, 30.0))
    ad = oracles.ad_volume(L, R, 6)
    cen = oracles.census_volume(L, R, 6)
    want = (1 - np.exp(-ad / 10.0)) + (1 - np.exp(-cen / 30.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_asw_volume():
    from stereo_match_traditional_tpu.utils.synthetic import make_pair

    L, R, _ = make_pair(14, 18, 5, seed=2)
    got = np.asarray(
        volume.asw_volume(L, R, 5, win_size=2, space_sigma=50, color_sigma=30, truncation=40)
    )
    want = oracles.asw_volume(L, R, 5, 2, 50, 30, 40)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_asw_right_mirror_symmetry():
    """Right-view ASW equals a brute-force mirror computation."""
    from stereo_match_traditional_tpu.utils.synthetic import make_pair

    L, R, _ = make_pair(12, 16, 4, seed=5)
    got = np.asarray(
        volume.asw_volume_right(L, R, 4, win_size=1, space_sigma=50, color_sigma=30, truncation=40)
    )
    # oracle: flip, swap roles, unflip
    want = oracles.asw_volume(R[:, ::-1], L[:, ::-1], 4, 1, 50, 30, 40)[:, :, ::-1]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_right_volume_from_left_identity():
    """costR(q,d) = costL(q+d,d): the derived right volume matches the
    independently computed one — bit-exact for AD/SAD (pure gather
    arithmetic), fp-rounding-close for ASW (different accumulation order
    than the flip-based recompute)."""
    from stereo_match_traditional_tpu.utils.synthetic import make_pair

    L, R, _ = make_pair(24, 36, 8, seed=7)
    adl = volume.ad_volume(L, R, 9, view="left")
    adr = volume.ad_volume(L, R, 9, view="right")
    np.testing.assert_array_equal(
        np.asarray(volume.right_volume_from_left(adl)), np.asarray(adr)
    )
    sl = volume.sad_volume(L, R, 9, 2, view="left")
    sr = volume.sad_volume(L, R, 9, 2, view="right")
    np.testing.assert_array_equal(
        np.asarray(volume.right_volume_from_left(sl)), np.asarray(sr)
    )
    al = volume.asw_volume(L, R, 8, win_size=2)
    ar = volume.asw_volume_right(L, R, 8, win_size=2)
    np.testing.assert_allclose(
        np.asarray(volume.right_volume_from_left(al)),
        np.asarray(ar),
        rtol=1e-4,
        atol=1e-4,
    )


def test_right_volume_from_left_identity_lab():
    """The shift identity also holds for the Lab-weight ASW variant (the
    cost-level truncation commutes with the shift); oracle = the flip-based
    mirror computation that models/asw.py used before the identity."""
    from stereo_match_traditional_tpu.utils.synthetic import make_pair

    L, R, _ = make_pair(16, 24, 5, seed=9)
    rng = np.random.default_rng(4)
    lab_l = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
    lab_r = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
    kw = dict(disp_range=5, win_size=1, space_sigma=50, color_sigma=30, truncation=40)
    vol_l = volume.asw_lab_volume(L, R, lab_l, lab_r, **kw)
    want = np.asarray(
        volume.asw_lab_volume(
            R[:, ::-1], L[:, ::-1], lab_r[:, ::-1], lab_l[:, ::-1], **kw
        )
    )[:, :, ::-1]
    got = np.asarray(volume.right_volume_from_left(vol_l))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mxu_cumsum_1d_and_blocked():
    """_mxu_cumsum handles 1-D inputs and the blocked large-n path."""
    import jax.numpy as jnp

    from stereo_match_traditional_tpu.ops import aggregate

    x = np.arange(40, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(aggregate._mxu_cumsum(jnp.asarray(x), -1)), np.cumsum(x),
        rtol=1e-6,
    )
    rng = np.random.default_rng(0)
    big = rng.standard_normal((3, aggregate._CUMSUM_DENSE_MAX + 77)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(aggregate._mxu_cumsum(jnp.asarray(big), -1)),
        np.cumsum(big, axis=-1), rtol=1e-4, atol=1e-3,
    )
    bigr = rng.standard_normal((aggregate._CUMSUM_DENSE_MAX + 33, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(aggregate._mxu_cumsum(jnp.asarray(bigr), -2)),
        np.cumsum(bigr, axis=-2), rtol=1e-4, atol=1e-3,
    )


def test_box_sum_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((11, 13)).astype(np.float32)
    got = np.asarray(volume.box_sum_same(x, 2, 1))
    want = np.zeros_like(x)
    for i in range(11):
        for j in range(13):
            want[i, j] = x[max(i - 2, 0) : i + 3, max(j - 1, 0) : j + 2].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_border_fill_matches_prev_copy():
    """border_fill == the reference's cost[d]=cost[d-1] recursion."""
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((6, 4, 9)).astype(np.float32)
    got = np.asarray(volume.border_fill(vol, "left"))
    want = vol.copy()
    for d in range(6):
        for j in range(9):
            if d > j:
                want[d, :, j] = want[d - 1, :, j]
    np.testing.assert_array_equal(got, want)


def test_ncc_flat_region_never_wins():
    """(Near-)zero-variance windows map to the never-wins value, matching
    the reference's NaN-never-wins semantics (`NCC.h:46,59`)."""
    L = np.full((20, 30), 200, np.uint8)
    R = np.full((20, 30), 200, np.uint8)
    vol, interior = volume.ncc_volume(L, R, 6, 3)
    inside = np.broadcast_to(np.asarray(interior)[None], vol.shape)
    assert float(np.asarray(vol)[inside].max()) <= -2.0


def test_census_window_too_large_raises():
    with pytest.raises(ValueError):
        volume.census_transform(np.zeros((8, 8), np.uint8), 11, 9)
