"""Sub-isolate the W=3840 pixel-major cross crash: run each pm building
block standalone at the failing band geometry [344 rows, W=3840, D=256]
(the shape one canonical streamed band sees at rt=64).  One leg per
process (a crash kills the worker):

  python experiments/_r5_pm_isolate.py hcum|vcum|hsum|vsum|agg [W]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import stereo_match_traditional_tpu.ops.aggregate as ag

ROWS, D = 344, 256


def main():
    mode = sys.argv[1]
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    if len(sys.argv) > 3:           # override the gather chunk source cap
        ag._GATHER_FAST_SRC_BYTES = int(float(sys.argv[3]) * 1024 * 1024)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, w, D)).astype(np.float32))
    arm = jnp.asarray(rng.integers(0, 34, (ROWS, w), dtype=np.int32))
    if mode == "hcum":
        fn = jax.jit(lambda a: ag._mxu_cumsum(a, -2))
        args = (x,)
    elif mode == "vcum":
        fn = jax.jit(ag._cumsum_axis0)
        args = (x,)
    elif mode == "hsum":
        fn = jax.jit(lambda a, l, r: ag._hsum_pm(a, l, r))
        args = (x, arm, arm)
    elif mode == "hsum8":
        # stride-pad hypothesis: pad the prefix tensor's middle axis to a
        # sublane multiple so each chunk's [rows, wp8, D] -> [rows*wp8, D]
        # reshape keeps every source row at the same sublane phase
        def hsum8(a, left, right):
            h, wd, d = a.shape
            cs = jnp.pad(ag._mxu_cumsum(a, -2), ((0, 0), (1, 0), (0, 0)))
            wp8 = -(-(wd + 1) // 8) * 8
            cs = jnp.pad(cs, ((0, 0), (0, wp8 - (wd + 1)), (0, 0)))
            jj = jnp.arange(wd)[None, :]
            hi = jnp.clip(jj + right + 1, 0, wd)
            lo = jnp.clip(jj - left, 0, wd)
            band = max(8, ag._GATHER_FAST_SRC_BYTES // (4 * d * wp8))
            outs = []
            for r0 in range(0, h, band):
                r1 = min(r0 + band, h)
                flat = cs[r0:r1].reshape((r1 - r0) * wp8, d)
                ii = jnp.arange(r1 - r0)[:, None]
                out = (
                    flat[(ii * wp8 + hi[r0:r1]).reshape(-1)]
                    - flat[(ii * wp8 + lo[r0:r1]).reshape(-1)]
                )
                outs.append(out.reshape(r1 - r0, wd, d))
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

        fn = jax.jit(hsum8)
        args = (x, arm, arm)
    elif mode == "vsum":
        fn = jax.jit(lambda a, u, dn: ag._vsum_pm(a, u, dn, 34))
        args = (x, arm, arm)
    elif mode == "agg":
        arms = ag.Arms(arm, arm, arm, arm)
        vol = jnp.moveaxis(x, -1, 0)
        fn = jax.jit(lambda v: ag.cross_aggregate(
            v, arms, num_iters=1, span_cap=34))
        args = (vol,)
    else:
        raise SystemExit(f"unknown mode {mode}")
    t0 = time.time()
    out = fn(*args)
    s = float(jnp.sum(out))
    print(f"{mode} W={w}: ok checksum={s:.6e} wall={time.time()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
