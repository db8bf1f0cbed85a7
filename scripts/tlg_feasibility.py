#!/usr/bin/env python
"""Host-side feasibility study for the two-pass TLG pipeline (round 4).

The TLG composition (transpose -> lane take_along_axis -> transpose)
gives an O(1)-per-element SUBLANE gather with the LANE preserved —
measured 0.0273 ns/el at G=128 vs 0.247 ns/el for the one-hot
mask-reduce at r_hot=104 (scripts/tpu_probe_r4b.py, v5e). A
whole-matrix scattered SpMV then needs:

pass 1 (column order): x-window TLG gather; entry at table slot
  (t1, c) with c = col %% 128 forced; per-t1-row lane permutation
  emits prod in color lanes.
pass 2 (row order): prod-window TLG gather into the chips partial
  layout (length-sorted 8-row blocks) + per-erow lane permutation;
  the existing windowed one-hot MXU segsum reduces to y.

Feasibility gates measured here on the scattered archetypes:
  A. pass-1 blocking after hub exclusion: <= 128 entries per residue
     per block, window span <= 128 x-panels; spill rate.
  B. bipartite lane coloring (t1-row x erow, 128 colors): spill rate
     and runtime of the vectorized 128-bit-mask algorithm.
  C. pass-2 window: fraction of entries whose prod row lands within a
     128-row window of their output step's base.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from spmv_scpa_tpu import testing as synth  # noqa: E402

BC = 128


def split_hubs(cols, hub_min: int = 96):
    """Mask of entries whose column is a hub (count >= hub_min).
    Hub columns break the per-block <=128-per-residue bound (their
    entries are contiguous in column order); they ride a separate
    broadcast-style stream."""
    u, inv, cnt = np.unique(cols, return_inverse=True,
                            return_counts=True)
    return cnt[inv] >= hub_min, int((cnt >= hub_min).sum())


def pack_pass1(cols_sub, n):
    """Column-sorted blocking of the non-hub entries: block = up to
    128*128 entries whose panels span < 128. Returns per-entry
    (block, t1) in the SUBSET's order + spill mask + block count."""
    order = np.argsort(cols_sub, kind="stable")
    c_res = cols_sub[order] % BC
    panel = cols_sub[order] // BC

    N = cols_sub.size
    cuts = [0]
    while cuts[-1] < N:
        s = cuts[-1]
        e_span = np.searchsorted(panel, panel[s] + BC, side="left")
        cuts.append(min(s + BC * BC, int(e_span), N))
    blk = np.zeros(N, np.int64)
    blk[np.asarray(cuts[1:-1], np.int64)] = 1
    blk = np.cumsum(blk)

    key = blk * BC + c_res
    o2 = np.argsort(key, kind="stable")
    k2 = key[o2]
    first = np.r_[True, k2[1:] != k2[:-1]]
    idx_first = np.flatnonzero(first)
    gid = np.cumsum(first) - 1
    t1 = np.arange(N) - idx_first[gid]
    t1_of = np.empty(N, np.int64)
    t1_of[o2] = t1
    spill = t1_of >= BC

    blk_of = np.empty(N, np.int64)
    blk_of[order] = blk
    t1_ord = np.empty(N, np.int64)
    t1_ord[order] = t1_of
    sp = np.empty(N, bool)
    sp[order] = spill
    return blk_of, t1_ord, sp, len(cuts) - 1


def chips_len_sorted(rows, m):
    """Chips packing over length-sorted rows (plan_chips's heavy
    index, by_len_only): fill ~ 1 because an 8-row block holds rows of
    near-equal ceil-log2 length. Returns per-entry (erow, lane) + the
    quanta count + fill."""
    order = np.argsort(rows, kind="stable")
    r = rows[order]
    first = np.r_[True, r[1:] != r[:-1]]
    fidx = np.flatnonzero(first)
    rank = np.arange(r.size) - fidx[np.cumsum(first) - 1]
    rank_of = np.empty(rows.size, np.int64)
    rank_of[order] = rank

    u_rows = r[fidx]
    cnt = np.diff(np.r_[fidx, r.size])
    cls = np.ceil(np.log2(np.maximum(cnt, 1))).astype(np.int64)
    hsort = np.lexsort((u_rows, cls))          # (class, row id)
    hpos_of = np.empty(u_rows.size, np.int64)
    hpos_of[hsort] = np.arange(u_rows.size)

    row_to_h = np.full(m, -1, np.int64)
    row_to_h[u_rows] = hpos_of
    e_h = row_to_h[rows]
    blk = e_h // 8
    sub = e_h % 8
    nblk = -(-u_rows.size // 8)
    blk_w = np.zeros(nblk, np.int64)
    np.maximum.at(blk_w, blk, rank_of + 1)
    q0 = np.r_[0, np.cumsum(blk_w)]
    q = q0[blk] + rank_of
    tile = q // BC
    lane = q % BC
    erow = tile * 8 + sub
    fill = rows.size / max(q0[-1] * 8, 1)
    return erow, lane, int(q0[-1]), fill


def _ctz128(hi, lo):
    """Count trailing zeros of 128-bit (hi, lo); 128 when zero."""
    lo_nz = lo != 0
    w = np.where(lo_nz, lo, hi)
    low = w & (~w + np.uint64(1))
    c = np.where(w == 0, 64,
                 np.log2(low.astype(np.float64)).astype(np.int64))
    return np.where(lo_nz, c, 64 + c).astype(np.int64)


def _rotr128(hi, lo, r):
    """Rotate-right 128-bit (hi, lo) by per-element r in [0, 128)."""
    r = r.astype(np.uint64) % np.uint64(128)
    swap = r >= np.uint64(64)
    h, lw = np.where(swap, lo, hi), np.where(swap, hi, lo)
    r1 = r % np.uint64(64)
    nz = r1 != 0
    inv = np.uint64(64) - np.where(nz, r1, np.uint64(1))
    h2 = np.where(nz, (h >> r1) | (lw << inv), h)
    l2 = np.where(nz, (lw >> r1) | (h << inv), lw)
    return h2, l2


def color_bipartite2(a, b, rounds=96, seed=0, verbose=False):
    """Same contract as color_bipartite, bit bookkeeping done with a
    (node, 128) bool matrix per side — simpler and still vectorized;
    memory = (na+nb)*128 bool."""
    N = a.size
    na, nb = int(a.max()) + 1, int(b.max()) + 1
    fa = np.ones((na, 128), bool)
    fb = np.ones((nb, 128), bool)
    color = np.full(N, -1, np.int64)
    rng = np.random.default_rng(seed)
    todo = np.arange(N)
    rd = 0
    for rd in range(1, rounds + 1):
        if not todo.size:
            break
        at, bt = a[todo], b[todo]
        # pack to uint64 pairs for the first-free-bit proposal
        ca = np.packbits(fa[at], axis=1, bitorder="little")
        cb = np.packbits(fb[bt], axis=1, bitorder="little")
        cm = (ca & cb).view(np.uint64).reshape(todo.size, 2)
        ml, mh = cm[:, 0].copy(), cm[:, 1].copy()
        has = (mh | ml) != 0
        r_e = rng.integers(0, 128, todo.size).astype(np.uint64)
        rh, rl = _rotr128(mh, ml, r_e)
        prop = (_ctz128(rh, rl) + r_e.astype(np.int64)) % 128
        cand = todo[has]
        pc = prop[has]
        ka = at[has] * 128 + pc
        kb = bt[has] * 128 + pc
        _, ia = np.unique(ka, return_index=True)
        ok = np.zeros(cand.size, bool)
        ok[ia] = True
        _, ib = np.unique(kb, return_index=True)
        ok2 = np.zeros(cand.size, bool)
        ok2[ib] = True
        win = ok & ok2
        w, wc = cand[win], pc[win]
        color[w] = wc
        fa[a[w], wc] = False
        fb[b[w], wc] = False
        todo = np.flatnonzero(color < 0)
        if verbose and rd % 8 == 0:
            print(f"    round {rd}: todo {todo.size}", flush=True)
    return color, rd


def study(name, A, hub_min=96):
    print(f"## {name}: m={A.m} n={A.n} nnz={A.nnz}", flush=True)
    rows = np.repeat(np.arange(A.m), np.diff(A.irp))
    cols = A.ja

    t0 = time.time()
    hub_mask, n_hubs = split_hubs(cols, hub_min)
    print(f"  hubs(cnt>={hub_min}): {n_hubs} cols, "
          f"{hub_mask.mean() * 100:.2f}% of entries "
          f"({time.time() - t0:.2f}s)", flush=True)

    sub = ~hub_mask
    t0 = time.time()
    blk1, t1, sp1, nblocks = pack_pass1(cols[sub], A.n)
    print(f"  pass1: {nblocks} blocks, residue spill "
          f"{sp1.mean() * 100:.2f}%, fill "
          f"{sub.sum() / (nblocks * BC * BC):.3f} "
          f"({time.time() - t0:.2f}s)", flush=True)

    t0 = time.time()
    erow, lane, nq, fill2 = chips_len_sorted(rows, A.m)
    print(f"  pass2 chips (len-sorted): quanta={nq} fill={fill2:.3f} "
          f"tile_rows={-(-nq // BC) * 8} ({time.time() - t0:.2f}s)",
          flush=True)

    keep = ~sp1
    si = np.flatnonzero(sub)            # subset -> global entry index
    g_t1 = blk1 * BC + t1
    t0 = time.time()
    col, nr = color_bipartite2(g_t1[keep], erow[si][keep],
                               verbose=True)
    cspill = float(np.mean(col < 0))
    print(f"  coloring: {nr} rounds, spill {cspill * 100:.2f}% "
          f"({time.time() - t0:.2f}s)", flush=True)

    ok = col >= 0
    ek = si[keep][ok]
    st = erow[ek] // BC
    pr = g_t1[keep][ok]
    smin = np.full(int(st.max()) + 1, np.iinfo(np.int64).max)
    np.minimum.at(smin, st, pr)
    reach = pr - smin[st]
    for R2 in (128, 256, 512):
        print(f"    window R2={R2}: in-window "
              f"{float(np.mean(reach < R2)) * 100:.2f}%", flush=True)
    spill_all = (hub_mask.mean()
                 + sub.mean() * (sp1.mean()
                                 + (1 - sp1.mean()) * cspill
                                 + (1 - sp1.mean()) * (1 - cspill)
                                 * float(np.mean(reach >= 128))))
    print(f"  non-hub spill upper bound (R2=128): "
          f"{(spill_all - hub_mask.mean()) * 100:.2f}% "
          f"(+{hub_mask.mean() * 100:.2f}% hub stream)", flush=True)


def main():
    study("webbase", synth.webbase_csr(m=1_000_000))
    study("amazon", synth.amazon_csr())
    study("powerlaw", synth.powerlaw_csr(100_000, avg_nnz=8, seed=3))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
