"""WTA / uniqueness / subpixel vs. scalar oracle."""

import numpy as np

import oracles
from stereo_match_traditional_tpu.ops import wta


def _rand_volume(seed, d=9, h=6, w=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 40, size=(d, h, w)).astype(np.float32)


def test_wta_first_tie():
    vol = np.ones((5, 2, 2), np.float32)
    vol[2, 0, 0] = 0.5
    vol[3, 0, 0] = 0.5  # tie -> first wins
    got = np.asarray(wta.wta(vol))
    assert got[0, 0] == 2
    assert got[1, 1] == 0


def test_optimal_disparity_matches_oracle():
    vol = _rand_volume(0)
    got = np.asarray(wta.optimal_disparity(vol))
    for i in range(vol.shape[1]):
        for j in range(vol.shape[2]):
            want = oracles.optimal_disparity(vol[:, i, j], vol.shape[0])
            assert got[i, j] == want, (i, j, vol[:, i, j])


def test_optimal_disparity_subpixel():
    vol = _rand_volume(3)
    got = np.asarray(wta.optimal_disparity(vol, subpixel=True))
    for i in range(vol.shape[1]):
        for j in range(vol.shape[2]):
            want = oracles.optimal_disparity(vol[:, i, j], vol.shape[0], subpixel=True)
            np.testing.assert_allclose(got[i, j], want, atol=1e-5)


def test_optimal_disparity_all_equal_rejected():
    vol = np.full((6, 3, 3), 7.0, np.float32)
    got = np.asarray(wta.optimal_disparity(vol))
    assert (got == 0).all()


def test_wta_max_mode():
    vol = _rand_volume(4)
    got = np.asarray(wta.wta(vol, "max"))
    want = np.argmax(vol, axis=0)
    np.testing.assert_array_equal(got, want)


def test_optimal_disparity_secmin_seed():
    """secMin is seeded with cost[0] (`Sad.h:44`): when cost[0] equals the
    winning cost the uniqueness test must reject the pixel."""
    import jax.numpy as jnp
    from stereo_match_traditional_tpu.ops import wta

    vol = jnp.asarray(np.array([5.0, 5.0, 9.0, 7.0], np.float32)).reshape(4, 1, 1)
    out = float(wta.optimal_disparity(vol, 0.01, False)[0, 0])
    assert out == 0.0
