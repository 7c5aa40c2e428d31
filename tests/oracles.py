"""Dead-simple NumPy oracles — the executable spec for every kernel.

Each function transliterates the *intended* semantics catalogued in
SURVEY.md §2 from the reference C++ (file:line cited per function), with the
documented bug fixes (no racy reductions, no OOB reads, no threshold leaks).
They are deliberately slow scalar loops over tiny arrays.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# volumes
# ---------------------------------------------------------------------------


def ad_volume(left, right, disp_range, view="left"):
    """`AD-Census.h:75-129`."""
    l = left.astype(np.float32)
    r = right.astype(np.float32)
    h, w = l.shape
    vol = np.zeros((disp_range, h, w), np.float32)
    for d in range(disp_range):
        for i in range(h):
            for j in range(w):
                if view == "left":
                    jj = max(j - d, 0)
                    vol[d, i, j] = abs(l[i, j] - r[i, jj])
                else:
                    jj = min(j + d, w - 1)
                    vol[d, i, j] = abs(l[i, jj] - r[i, j])
    return vol


def sad_volume(left, right, disp_range, winsize, view="left", mean=False):
    """`SAD/Sad.h:96-182` with replicate pad `SADmain.cpp:47-48` and the
    previous-d copy at out-of-range disparities (`Sad.h:125-128`)."""
    r_ = winsize + 1
    l = np.pad(left.astype(np.float32), r_, mode="edge")
    r = np.pad(right.astype(np.float32), r_, mode="edge")
    h, w = left.shape
    vol = np.zeros((disp_range, h, w), np.float32)
    for i in range(h):
        for j in range(w):
            for d in range(disp_range):
                if view == "left":
                    if j - d < 0:
                        vol[d, i, j] = vol[d - 1, i, j]
                        continue
                    lw = l[i : i + 2 * r_ + 1, j : j + 2 * r_ + 1]
                    rw = r[i : i + 2 * r_ + 1, j - d : j - d + 2 * r_ + 1]
                else:
                    if j + d > w - 1:
                        vol[d, i, j] = vol[d - 1, i, j]
                        continue
                    rw = r[i : i + 2 * r_ + 1, j : j + 2 * r_ + 1]
                    lw = l[i : i + 2 * r_ + 1, j + d : j + d + 2 * r_ + 1]
                s = np.abs(lw - rw).sum()
                vol[d, i, j] = s / (2 * r_ + 1) ** 2 if mean else s
    return vol


def ncc_volume(left, right, disp_range, win, sentinel=-2.0):
    """`NCC/NCC.h:15-95` (interior pixels only; invalid d -> sentinel)."""
    l = left.astype(np.float64)
    r = right.astype(np.float64)
    h, w = l.shape
    vol = np.full((disp_range, h, w), sentinel, np.float64)
    for i in range(win, h - win):
        for j in range(win, w - win):
            lw = l[i - win : i + win + 1, j - win : j + win + 1]
            for d in range(disp_range):
                if j - win - d < 0:
                    continue
                rw = r[i - win : i + win + 1, j - win - d : j + win - d + 1]
                lm, rm = lw.mean(), rw.mean()
                num = ((lw - lm) * (rw - rm)).sum()
                den = np.sqrt(((lw - lm) ** 2).sum()) * np.sqrt(((rw - rm) ** 2).sum())
                vol[d, i, j] = num / den if den > 0 else np.nan
    return vol


def census_codes(img, rows=9, cols=7):
    """`AD-Census.h:166-192`: row-major offsets, bit=1 iff center>neighbor
    and neighbor in-image."""
    h, w = img.shape
    x = img.astype(np.float32)
    rr, rc = rows // 2, cols // 2
    codes = np.zeros((h, w), object)
    for i in range(h):
        for j in range(w):
            c = 0
            for r in range(-rr, rr + 1):
                for cc in range(-rc, rc + 1):
                    c <<= 1
                    ii, jj = i + r, j + cc
                    if 0 <= ii < h and 0 <= jj < w and x[i, j] > x[ii, jj]:
                        c += 1
            codes[i, j] = c
    return codes


def census_volume(left, right, disp_range, rows=9, cols=7, view="left"):
    """Hamming volume with clamped-column code gather (our intended
    semantics; see ops.volume.census_volume docstring)."""
    cl = census_codes(left, rows, cols)
    cr = census_codes(right, rows, cols)
    h, w = left.shape
    vol = np.zeros((disp_range, h, w), np.float32)
    for d in range(disp_range):
        for i in range(h):
            for j in range(w):
                if view == "left":
                    a, b = cl[i, j], cr[i, max(j - d, 0)]
                else:
                    a, b = cl[i, min(j + d, w - 1)], cr[i, j]
                vol[d, i, j] = bin(a ^ b).count("1")
    return vol


def asw_volume(left, right, disp_range, win_size, space_sigma, color_sigma, T):
    """`ASW/ASW.h:210-257,329-378`: fused bilateral-weight truncated-AD."""
    R = win_size + 1
    l = np.pad(left.astype(np.float64), R, mode="edge")
    r = np.pad(right.astype(np.float64), R, mode="edge")
    h, w = left.shape
    ax = np.arange(-R, R + 1)
    space = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2 * space_sigma**2))
    vol = np.zeros((disp_range, h, w), np.float64)
    for i in range(h):
        for j in range(w):
            for d in range(disp_range):
                if j - d < 0:
                    vol[d, i, j] = vol[d - 1, i, j]
                    continue
                lw = l[i : i + 2 * R + 1, j : j + 2 * R + 1]
                rw = r[i : i + 2 * R + 1, j - d : j - d + 2 * R + 1]
                e = np.minimum(np.abs(lw - rw), T)
                wl = np.exp(-((lw - lw[R, R]) ** 2) / (2 * color_sigma**2)) * space
                wr = np.exp(-((rw - rw[R, R]) ** 2) / (2 * color_sigma**2)) * space
                wt = wl * wr
                vol[d, i, j] = (wt * e).sum() / wt.sum()
    return vol


# ---------------------------------------------------------------------------
# WTA
# ---------------------------------------------------------------------------


def optimal_disparity(costs, disp_range, eps=0.01, subpixel=False, exclude_d0=True):
    """`SAD/Sad.h:40-85` scalar semantics for one cost vector."""
    costs = np.asarray(costs, np.float32)
    start = 1 if exclude_d0 else 0
    best = start + int(np.argmin(costs[start:]))
    minv = costs[best]
    others = costs[costs != minv]
    # secMin seeded with costs[0] (`Sad.h:44`) before the != min filter
    sec = min(others.min(), costs[0]) if others.size else costs[0]
    if sec - minv <= eps:
        return 0.0
    if best == 0 or best == disp_range - 1:
        return 0.0
    if subpixel:
        c1, c2 = costs[best - 1], costs[best + 1]
        den = max(1.0, c1 + c2 - 2 * minv)
        return best + (c1 - c2) / (2 * den)
    return float(best)


# ---------------------------------------------------------------------------
# cross arms
# ---------------------------------------------------------------------------


def arm_length(img, tao1, tao2, max_length, sec_length, direction):
    """`CrossArm.cpp:147-598` / `CBLSM.h:536-966` with per-pixel threshold
    schedule (no member-variable leak).  direction in {left,right,up,down}."""
    color = img.ndim == 3
    h, w = img.shape[:2]
    out = np.zeros((h, w), np.int32)
    dj = {"left": (0, -1), "right": (0, 1), "up": (-1, 0), "down": (1, 0)}[direction]
    for i in range(h):
        for j in range(w):
            center = img[i, j].astype(np.int32)
            saved = 0
            offset = 0
            while True:
                ii, jj = i + dj[0] * offset, j + dj[1] * offset
                if not (0 <= ii < h and 0 <= jj < w):
                    break
                saved = offset
                offset += 1
                tao = tao1 if offset <= sec_length else tao2
                if offset > max_length:
                    break
                ii, jj = i + dj[0] * offset, j + dj[1] * offset
                if not (0 <= ii < h and 0 <= jj < w):
                    break
                pix = img[ii, jj].astype(np.int32)
                diff = np.abs(center - pix).max() if color else abs(int(center) - int(pix))
                if diff > tao:
                    if saved < 1:
                        # min-1 rule (`CrossArm.cpp:186-196`)
                        if direction == "left" and j - 1 >= 1:
                            saved = 1
                        elif direction == "right" and j + 1 < w - 1:
                            saved = 1
                        elif direction == "up" and i - 1 >= 1:
                            saved = 1
                        elif direction == "down" and i + 1 < h - 1:
                            saved = 1
                    break
            out[i, j] = saved
    return out


def canonical_arm(img, t1, t2, l1, l2, direction):
    """`cross_aggregator.cpp:135-269`."""
    color = img.ndim == 3
    h, w = img.shape[:2]
    out = np.zeros((h, w), np.int32)
    dj = {"left": (0, -1), "right": (0, 1), "up": (-1, 0), "down": (1, 0)}[direction]

    def dist(a, b):
        return int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max()) if color else abs(int(a) - int(b))

    for i in range(h):
        for j in range(w):
            c0 = img[i, j]
            last = c0
            arm = 0
            for n in range(min(l1, 255)):
                ii, jj = i + dj[0] * (n + 1), j + dj[1] * (n + 1)
                if not (0 <= ii < h and 0 <= jj < w):
                    break
                c = img[ii, jj]
                if dist(c, c0) >= t1:
                    break
                if n > 0 and dist(c, last) >= t1:
                    break
                if n + 1 > l2 and dist(c, c0) >= t2:
                    break
                arm += 1
                last = c
            out[i, j] = arm
    return out


def rect_mean_aggregate(vol, left, right, up, down, inclusive=True):
    """`CrossArm.cpp:60-102` (inclusive) / `:104-145` (exclusive)."""
    dsp, h, w = vol.shape
    out = np.zeros_like(vol)
    for d in range(dsp):
        for i in range(h):
            for j in range(w):
                if inclusive:
                    i0, i1 = i - up[i, j], i + down[i, j]
                    j0, j1 = j - left[i, j], j + right[i, j]
                else:
                    i0, i1 = i - up[i, j], i + down[i, j] - 1
                    j0, j1 = j - left[i, j], j + right[i, j] - 1
                i0c, i1c = max(i0, 0), min(i1, h - 1)
                j0c, j1c = max(j0, 0), min(j1, w - 1)
                if i1c < i0c or j1c < j0c:
                    out[d, i, j] = 0
                    continue
                block = vol[d, i0c : i1c + 1, j0c : j1c + 1]
                n = (i1 - i0 + 1) * (j1 - j0 + 1)
                out[d, i, j] = block.sum() / max(n, 1)
    return out


def cross_two_pass(vol, arms_lrud, num_iters, horizontal_first=True):
    """`cross_aggregator.cpp:89-118,271-394`."""
    left, right, up, down = arms_lrud
    dsp, h, w = vol.shape

    def hpass(x):
        out = np.zeros_like(x)
        for i in range(h):
            for j in range(w):
                out[..., i, j] = x[..., i, j - left[i, j] : j + right[i, j] + 1].sum(-1)
        return out

    def vpass(x):
        out = np.zeros_like(x)
        for i in range(h):
            for j in range(w):
                out[..., i, j] = x[..., i - up[i, j] : i + down[i, j] + 1, j].sum(-1)
        return out

    ones = np.ones((h, w))
    sup_h = vpass(hpass(ones))
    sup_v = hpass(vpass(ones))
    out = vol.copy()
    hf = horizontal_first
    for _ in range(num_iters):
        if hf:
            out = vpass(hpass(out)) / sup_h
        else:
            out = hpass(vpass(out)) / sup_v
        hf = not hf
    return out


# ---------------------------------------------------------------------------
# scanline
# ---------------------------------------------------------------------------


def scanline_pass(cost, gray, p1, p2_init, direction, l2_uses_dm1=True):
    """`ScanlineOptimizer.h:130-253`: one directional pass.

    cost [D,H,W]; direction in {lr, rl, ud, du}.  l2_uses_dm1=False
    reproduces the vertical quirk (`:238`).
    """
    dsp, h, w = cost.shape
    out = np.zeros_like(cost)
    if direction in ("lr", "rl"):
        n, lanes = w, h
    else:
        n, lanes = h, w
    for lane in range(lanes):
        def get(k):
            if direction == "lr":
                return cost[:, lane, k], gray[lane, k]
            if direction == "rl":
                return cost[:, lane, w - 1 - k], gray[lane, w - 1 - k]
            if direction == "ud":
                return cost[:, k, lane], gray[k, lane]
            return cost[:, h - 1 - k, lane], gray[h - 1 - k, lane]

        def put(k, v):
            if direction == "lr":
                out[:, lane, k] = v
            elif direction == "rl":
                out[:, lane, w - 1 - k] = v
            elif direction == "ud":
                out[:, k, lane] = v
            else:
                out[:, h - 1 - k, lane] = v

        c0, g_last = get(0)
        prev = c0.astype(np.float64).copy()
        put(0, prev)
        prev_min = prev.min()
        for k in range(1, n):
            c, g = get(k)
            p2 = max(p1, p2_init / (abs(float(g) - float(g_last)) + 1))
            g_last = g
            cur = np.empty(dsp)
            for d in range(dsp):
                l1 = prev[d]
                l2 = (prev[d - 1] + p1) if (d > 0 and l2_uses_dm1) else (
                    prev[d] + p1 if not l2_uses_dm1 else np.inf
                )
                l3 = prev[d + 1] + p1 if d + 1 < dsp else np.inf
                l4 = prev_min + p2
                cur[d] = c[d] + min(l1, l2, l3, l4) - prev_min
            put(k, cur)
            prev = cur
            prev_min = cur.min()
    return out


# ---------------------------------------------------------------------------
# post-processing
# ---------------------------------------------------------------------------


def lr_check_simple(dl, dr, gate, invalid_value):
    """`SAD/Sad.h:184-222` (clamped gather, intended semantics)."""
    h, w = dl.shape
    out = np.empty((h, w), np.float32)
    occ = np.zeros((h, w), bool)
    mis = np.zeros((h, w), bool)
    for i in range(h):
        for j in range(w):
            lv = dl[i, j]
            jj = int(np.clip(j - int(lv), 0, w - 1))
            rv = dr[i, jj]
            if abs(lv - rv) > gate:
                out[i, j] = invalid_value
                if lv < rv:
                    occ[i, j] = True
                else:
                    mis[i, j] = True
            else:
                out[i, j] = lv
    return out, occ, mis


def remove_speckles(disp, diff, min_area, invalid_value, background=None):
    """BFS transliteration of `PostProcessing.h:250-311` / `Sad.h:251-315`.

    ``background`` pixels are skipped as *seeds* only (`Sad.h:265`); they
    still join components via neighbors and count toward the area.
    """
    h, w = disp.shape
    d = disp.astype(np.float64)
    valid = np.isfinite(d) & (d != invalid_value)
    seed_ok = valid if background is None else (valid & (d != background))
    visited = np.zeros((h, w), bool)
    out = d.copy()
    for i in range(h):
        for j in range(w):
            if visited[i, j] or not seed_ok[i, j]:
                continue
            comp = [(i, j)]
            visited[i, j] = True
            cur = 0
            while cur < len(comp):
                y, x = comp[cur]
                cur += 1
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dy == 0 and dx == 0:
                            continue
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < h and 0 <= xx < w and not visited[yy, xx]:
                            if valid[yy, xx] and abs(d[yy, xx] - d[y, x]) <= diff:
                                comp.append((yy, xx))
                                visited[yy, xx] = True
            if len(comp) < min_area:
                for y, x in comp:
                    out[y, x] = invalid_value
    return out


def median_filter_truncate(x, size):
    """`PostProcessing.h:314-344`."""
    r = size // 2
    h, w = x.shape
    out = np.empty_like(x, np.float32)
    for i in range(h):
        for j in range(w):
            vals = []
            for a in range(-r, r + 1):
                for b in range(-r, r + 1):
                    if 0 <= i + a < h and 0 <= j + b < w:
                        vals.append(x[i + a, j + b])
            vals.sort()
            out[i, j] = vals[len(vals) // 2]
    return out


def nearest_valid_ray(disp, valid, i, j, dy, dx, max_steps=None):
    h, w = disp.shape
    n = 0
    while True:
        n += 1
        if max_steps is not None and n > max_steps:
            return None
        ii, jj = i + n * dy, j + n * dx
        if not (0 <= ii < h and 0 <= jj < w):
            return None
        if valid[ii, jj]:
            return disp[ii, jj]


def fill_pass(disp, targets, second_smallest, max_axis=None, max_diag=None):
    """One 8-ray fill pass over `targets` (pre-pass snapshot semantics)."""
    valid = np.isfinite(disp)
    out = disp.copy()
    dirs = [(0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (-1, -1), (1, -1), (-1, 1)]
    for i, j in zip(*np.nonzero(targets)):
        cands = []
        for k, (dy, dx) in enumerate(dirs):
            cap = max_axis if k < 4 else max_diag
            v = nearest_valid_ray(disp, valid, i, j, dy, dx, cap)
            if v is not None:
                cands.append(v)
        if not cands:
            continue
        cands.sort()
        if second_smallest:
            out[i, j] = cands[1] if len(cands) > 1 else cands[0]
        else:
            out[i, j] = cands[len(cands) // 2]
    return out
