"""cblsm optimization experiments (VERDICT r3 item 4): stage profile +
candidate ablations on the real chip.  python _exp_cblsm.py
"""
import jax
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import CBLSMConfig
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.ops import aggregate, volume, wta
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair

ROWS, COLS, D = 375, 450, 60
cfg = CBLSMConfig(disp_range=D)
L, R, _ = make_pair(ROWS, COLS, D, seed=0)
Lj, Rj = jnp.asarray(L), jnp.asarray(R)
MS = lambda s: f"{s*1e3:.3f} ms"


def t(label, fn, args=(None,)):
    args = (Lj, Rj) if args == (None,) else args
    print(f"{label}: {MS(device_time(fn, args))}", flush=True)


def f32sum(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x))


# ---- baseline e2e ----------------------------------------------------------
fn, _ = get_pipeline("cblsm")

def e2e(l, r):
    res = fn(l, r, cfg)
    return f32sum((res.disp_left, res.disp_right))
t("cblsm e2e (honest both)", e2e)


def stacked_arms(l, r):
    """Arms of BOTH images with half the shift-chain launches: horizontal
    arms are row-local -> compute on the row-concatenated [2H, W] pair;
    vertical arms are column-local -> column-concatenated [H, 2W].  Exact:
    each direction's border/min-1 rules read only the unstacked axis."""
    h, w = l.shape
    rows2 = jnp.concatenate([l, r], axis=0)
    cols2 = jnp.concatenate([l, r], axis=1)
    la = aggregate._arm_one_direction(rows2, cfg.arms, 1, -1)
    ra = aggregate._arm_one_direction(rows2, cfg.arms, 1, +1)
    ua = aggregate._arm_one_direction(cols2, cfg.arms, 0, -1)
    da = aggregate._arm_one_direction(cols2, cfg.arms, 0, +1)
    def mk(i):
        return aggregate.Arms(
            left=la[i * h:(i + 1) * h],
            right=ra[i * h:(i + 1) * h],
            up=ua[:, i * w:(i + 1) * w],
            down=da[:, i * w:(i + 1) * w],
        )

    return mk(0), mk(1)


# ---- stage isolation --------------------------------------------------------
t("arms L+R", lambda l, r: f32sum((aggregate.cross_arms(l, cfg.arms),
                                   aggregate.cross_arms(r, cfg.arms))))
t("arms stacked per-direction", lambda l, r: f32sum(stacked_arms(l, r)))

# correctness of the stacking trick
al, ar = jax.jit(stacked_arms)(Lj, Rj)
ref_l = jax.jit(lambda l: aggregate.cross_arms(l, cfg.arms))(Lj)
ref_r = jax.jit(lambda r: aggregate.cross_arms(r, cfg.arms))(Rj)
import numpy as np
for got, want, tag in ((al, ref_l, "L"), (ar, ref_r, "R")):
    for f in ("left", "right", "up", "down"):
        assert np.array_equal(np.asarray(getattr(got, f)),
                              np.asarray(getattr(want, f))), (tag, f)
print("stacked arms exact", flush=True)
t("ad cost L+R", lambda l, r: f32sum((volume.ad_volume(l, r, D, "left"),
                                      volume.ad_volume(l, r, D, "right"))))

arms_l = aggregate.cross_arms(Lj, cfg.arms)
arms_r = aggregate.cross_arms(Rj, cfg.arms)
vol_l = volume.ad_volume(Lj, Rj, D, "left")
vol_r = volume.ad_volume(Lj, Rj, D, "right")
both = jnp.concatenate([vol_l, vol_r], axis=0)

t("pass1 L (rect D)", lambda v: f32sum(
    aggregate.rect_mean_aggregate(v, arms_l, max_span=34)), (vol_l,))
t("pass1 L+R separate", lambda vl, vr: f32sum(
    (aggregate.rect_mean_aggregate(vl, arms_l, max_span=34),
     aggregate.rect_mean_aggregate(vr, arms_r, max_span=34))), (vol_l, vol_r))
t("pass2 stacked (rect 2D, left arms)", lambda b: f32sum(
    aggregate.rect_mean_aggregate(b, arms_l, max_span=34)), (both,))
t("wta both", lambda vl, vr: f32sum((wta.wta(vl, "min"), wta.wta(vr, "min"))),
  (vol_l, vol_r))
