"""Sort-based speckle-merge probe (VERDICT r4 item 8).

The round-4 block-CCL negative pinned the two-level merge's cost on
`at[].min` scatter-min hooking (~11 ms regardless of block size).  A
scatter-free merge would: sort the ~4HW/B cut edges by endpoint label
ONCE (structure is static across rounds), then per round gather the
neighbor labels, segmented-min per run, broadcast along the run
(elementwise when node labels are stored per edge slot), and finally
relabel the full map (value -> slot via binary search, or one plain
scatter to a dense table).

This probe measures each primitive at the Teddy speckle geometry
(HW = 375*450, B = 64 -> E ~ 4HW/B ~ 10.5k edges, padded to 16k):

  sort      one bitonic sort of [E] key-value pairs (reshape form, no
            gathers) vs jax.lax.sort_key_val
  round     per-round body: 1 static-slot gather [E] + Hillis-Steele
            segmented min-broadcast (log2 E steps) + elementwise min
  relabel   value->slot binary search over the sorted node ids applied
            to the full [HW] map (log2 E gather rounds of HW picks)
  scatter   the alternative: ONE plain scatter [E] -> [HW] dense table
            + one [HW] gather

Verdict math: merge total ~ sort + R*round + min(relabel, scatter+gather)
vs the single-level flood's 3.39 ms TOTAL.  Run on the chip:
python experiments/_r5_speckle_sort.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.utils.benchmark import device_time

HW = 375 * 450
E = 1 << 14          # 16384 >= 4*HW/64
LOGE = 14


def bitonic_sort_kv(keys, vals):
    """Bitonic sort of a power-of-two [n] key/value pair, reshape form
    (adjacent-pair compare-exchange at static distances, no gathers)."""
    n = keys.shape[0]
    for k in range(1, LOGE + 1):
        for jbit in range(k - 1, -1, -1):
            j = 1 << jbit
            desc = (jnp.arange(n) & (1 << k)) != 0      # [n] static pattern
            kv = keys.reshape(-1, 2, j)
            vv = vals.reshape(-1, 2, j)
            dd = desc.reshape(-1, 2, j)[:, 0, :]
            a, b = kv[:, 0], kv[:, 1]
            va, vb = vv[:, 0], vv[:, 1]
            swap = (a > b) ^ dd
            lo = jnp.where(swap, b, a)
            hi = jnp.where(swap, a, b)
            vlo = jnp.where(swap, vb, va)
            vhi = jnp.where(swap, va, vb)
            keys = jnp.stack([lo, hi], axis=1).reshape(n)
            vals = jnp.stack([vlo, vhi], axis=1).reshape(n)
    return keys, vals


def seg_min_broadcast(x, heads):
    """Min within each run (heads marks run starts) broadcast to every
    slot — Hillis-Steele doubling, the primitive the flood already uses."""
    run_id = jnp.cumsum(heads.astype(jnp.int32))
    for s in range(LOGE):
        d = 1 << s
        shifted = jnp.concatenate([jnp.full((d,), jnp.iinfo(jnp.int32).max,
                                            x.dtype), x[:-d]])
        same = jnp.concatenate([jnp.zeros((d,), run_id.dtype), run_id[:-d]]) == run_id
        x = jnp.where(same, jnp.minimum(x, shifted), x)
    # backward pass broadcasts the run min (sitting at the run tail) back
    for s in range(LOGE):
        d = 1 << s
        shifted = jnp.concatenate([x[d:], jnp.full((d,), jnp.iinfo(jnp.int32).max,
                                                   x.dtype)])
        same = jnp.concatenate([run_id[d:], jnp.full((d,), -1, run_id.dtype)]) == run_id
        x = jnp.where(same, jnp.minimum(x, shifted), x)
    return x


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, HW, E, dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, HW, E, dtype=np.int32))
    slots = jnp.asarray(rng.integers(0, E, E, dtype=np.int32))
    heads = jnp.asarray(rng.random(E) < 0.3)
    dmap = jnp.asarray(rng.integers(0, HW, HW, dtype=np.int32))
    srt = jnp.sort(keys)

    t = device_time(lambda k, v: bitonic_sort_kv(k, v)[0], (keys, vals))
    print(f"bitonic sort [{E}] kv: {t*1e3:.3f} ms", flush=True)
    t = device_time(lambda k, v: jax.lax.sort_key_val(k, v)[0], (keys, vals))
    print(f"lax.sort_key_val [{E}]: {t*1e3:.3f} ms", flush=True)

    def round_body(lab, sl, hd):
        neigh = lab[sl]                       # static-slot gather [E]
        m = seg_min_broadcast(neigh, hd)
        return jnp.minimum(lab, m)

    t = device_time(round_body, (vals, slots, heads))
    print(f"merge round (gather + seg-min-broadcast + min): {t*1e3:.3f} ms",
          flush=True)

    def relabel_search(m, s):
        lo = jnp.zeros_like(m)
        for step in range(LOGE - 1, -1, -1):
            mid = lo + (1 << step)
            v = s[jnp.clip(mid, 0, E - 1)]    # [HW] picks from [E]
            lo = jnp.where(v <= m, mid, lo)
        return lo

    t = device_time(relabel_search, (dmap, srt))
    print(f"relabel binary search [{HW}] over [{E}]: {t*1e3:.3f} ms", flush=True)

    def scatter_table(k, v, m):
        table = jnp.zeros((HW,), jnp.int32).at[k].set(v, mode="drop")
        return table[m]

    t = device_time(scatter_table, (keys, vals, dmap))
    print(f"plain scatter [{E}]->[{HW}] + gather [{HW}]: {t*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
