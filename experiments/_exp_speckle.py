"""Speckle-flood round-count experiments (VERDICT r3 item 3).

Variants of the min-label flood in ops/post.remove_speckles, checked for
exact fixpoint equality (the min-label fixpoint is unique per component)
and timed standalone with device_time on the flagship's real LR-checked
map shape.  Winner gets an e2e A/B in the FULL pipeline before adoption.

  python _exp_speckle.py            # correctness + standalone timings
  python _exp_speckle.py e2e        # A/B the FULL flagship
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.ops import post
from stereo_match_traditional_tpu.ops.post import (
    _doubling_masks, _run_min_total, _shear, _unshear, _shift_fwd2,
    _shift_bwd2, speckle_connectivity,
)
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair


def make_input(rows=375, cols=450, d=60):
    """The flagship's actual speckle input: LR-checked disparity map."""
    L, R, _ = make_pair(rows, cols, d, seed=0)
    fn, _ = get_pipeline("ad_census")
    res = jax.jit(lambda l, r: fn(l, r, ADCensusConfig(disp_range=d)))(
        jnp.asarray(L), jnp.asarray(R))
    lr = post.lr_check_consistency(res.disp_left, res.disp_right, 2.0,
                                   post.INVALID, disp_range=d)
    return np.asarray(lr.disp)


def flood(disp, sweep_builder, max_iters=640, min_iters=0):
    """Generic fixpoint driver: sweep_builder(d, valid, big) -> sweep fn.

    ``min_iters`` forces that many sweeps before the no-change exit is
    trusted (a converged *local* prepass sweep must not mask pending
    global work)."""
    h, w = disp.shape
    d = disp.astype(jnp.float32)
    valid = jnp.isfinite(d) & (d != post.INVALID)
    big = jnp.int32(h * w)
    labels0 = jnp.where(valid, jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), big)
    sweep = sweep_builder(d, valid, big)

    def step(state):
        labels, _, it = state
        new = sweep(labels, it)
        return new, jnp.any(new != labels), it + 1

    labels, _, iters = jax.lax.while_loop(
        lambda s: (s[1] | (s[2] < min_iters)) & (s[2] < max_iters), step,
        (labels0, jnp.bool_(True), jnp.int32(0)))
    return labels, iters


def build_current(d, valid, big):
    base = post._speckle_sweep_fn(d, valid, 1.0, 8, big)
    return lambda l, it: base(l)


def build_diag_step(d, valid, big):
    """Full-run H/V doubling, but diagonals as single-pixel min exchanges
    (drops the two sheared run-min passes, ~half the rounds/sweep)."""
    h, w = d.shape
    conn_l, conn_u, conn_d1, conn_d2 = speckle_connectivity(d, valid, 1.0)
    masks_h = _doubling_masks(conn_l, 1)
    masks_v = _doubling_masks(conn_u, 0)

    def dshift(x, dy, dx, fill):
        y = _shift_fwd2(x, dy, 0, fill) if dy > 0 else _shift_bwd2(x, -dy, 0, fill)
        return _shift_fwd2(y, dx, 1, fill) if dx > 0 else _shift_bwd2(y, -dx, 1, fill)

    # conn_d1[p]: p connects to up-right neighbor; conn_d2: up-left
    def sweep(labels, it):
        new = _run_min_total(labels, masks_h, 1, big)
        new = _run_min_total(new, masks_v, 0, big)
        # pull from up-right / up-left, and push (pull from down-left/right)
        nur = jnp.where(conn_d1, dshift(new, 1, -1, big), big)
        nul = jnp.where(conn_d2, dshift(new, 1, 1, big), big)
        ndl = jnp.where(dshift(conn_d1, -1, 1, False), dshift(new, -1, 1, big), big)
        ndr = jnp.where(dshift(conn_d2, -1, -1, False), dshift(new, -1, -1, big), big)
        return jnp.minimum(jnp.minimum(new, jnp.minimum(nur, nul)),
                           jnp.minimum(ndl, ndr))

    return sweep


def build_block_prepass(B, n_pre):
    """n_pre sweeps with runs truncated at BxB block borders (log2(B)
    doubling rounds instead of log2(n)) before the global sweeps."""
    def builder(d, valid, big):
        h, w = d.shape
        conn_l, conn_u, conn_d1, conn_d2 = speckle_connectivity(d, valid, 1.0)
        col_edge = (jnp.arange(w) % B) == 0
        row_edge = ((jnp.arange(h) % B) == 0)[:, None]
        masks_h_loc = _doubling_masks(conn_l & ~col_edge[None, :], 1)
        masks_v_loc = _doubling_masks(conn_u & ~row_edge, 0)
        base = post._speckle_sweep_fn(d, valid, 1.0, 8, big)
        sc_d1, _ = _shear(conn_d1 & ~row_edge, True, False)
        sc_d2, _ = _shear(conn_d2 & ~row_edge, False, False)
        masks_d1_loc = _doubling_masks(sc_d1, 0)
        masks_d2_loc = _doubling_masks(sc_d2, 0)

        def local_sweep(labels):
            new = _run_min_total(labels, masks_h_loc, 1, big)
            new = _run_min_total(new, masks_v_loc, 0, big)
            for masks, anti in ((masks_d1_loc, True), (masks_d2_loc, False)):
                ls, _ = _shear(new, anti, big)
                ls = _run_min_total(ls, masks, 0, big)
                new = _unshear(ls, h, w, anti, big)
            return new

        def sweep(labels, it):
            return jax.lax.cond(it < n_pre, local_sweep, base, labels)

        return sweep

    return builder


def build_diag_step_hv2(d, valid, big):
    """diag_step, then a second h/v run-min in the same sweep so a
    diagonal hop's label still travels full runs within one sweep."""
    inner = build_diag_step(d, valid, big)
    h, w = d.shape
    conn_l, conn_u, _, _ = speckle_connectivity(d, valid, 1.0)
    masks_h = _doubling_masks(conn_l, 1)
    masks_v = _doubling_masks(conn_u, 0)

    def sweep(labels, it):
        new = inner(labels, it)
        new = _run_min_total(new, masks_h, 1, big)
        return _run_min_total(new, masks_v, 0, big)

    return sweep


def build_unroll2(d, valid, big):
    """Two full current-sweeps per while iteration (halves the
    convergence checks / loop overhead)."""
    base = post._speckle_sweep_fn(d, valid, 1.0, 8, big)
    return lambda l, it: base(base(l))


VARIANTS = {
    "current": (build_current, 0),
    "diag_step": (build_diag_step, 0),
    "diag_step_hv2": (build_diag_step_hv2, 0),
    "unroll2": (build_unroll2, 0),
    "block16_pre2": (build_block_prepass(16, 2), 3),
    "block32_pre2": (build_block_prepass(32, 2), 3),
}


def main():
    disp = make_input()
    dj = jnp.asarray(disp)
    ref_labels = np.asarray(jax.jit(
        lambda x: flood(x, VARIANTS["current"][0])[0])(dj))
    for name, (builder, mi) in VARIANTS.items():
        lab, iters = jax.jit(lambda x, b=builder, m=mi: flood(x, b, min_iters=m))(dj)
        ok = np.array_equal(np.asarray(lab), ref_labels)
        sec = device_time(
            lambda x, b=builder, m=mi: flood(x, b, min_iters=m)[0].astype(jnp.float32),
            (dj,))
        print(f"{name}: iters={int(iters)} exact={ok} {sec*1e3:.3f} ms",
              flush=True)


def e2e():
    L, R, _ = make_pair(375, 450, 60, seed=0)
    cfg = ADCensusConfig(disp_range=60, scanline=ScanlineConfig(), run_post=True)
    fn, _ = get_pipeline("ad_census")

    def checksum(l, r):
        res = fn(l, r, cfg)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in res if x is not None)

    sec = device_time(checksum, (jnp.asarray(L), jnp.asarray(R)))
    print(f"FULL flagship: {sec*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    (e2e if "e2e" in sys.argv[1:] else main)()
