"""Chips tail — the TPU CSR-vector: long-row / leftover entries as
dense 128-lane chips, reduced per row on the MXU.

The reference handles long rows with cooperative kernels — CUDA CSR k3
block-per-row strides a row across a whole thread block and
tree-reduces in shared memory (/root/reference/src/cuda_csr.cu:96-140).
The rows-as-lanes core (ops/lane_ell.py) has the opposite blind spot:
a row only owns Q slot planes, so entries of rank >= Q spill. Measured
on the amazon archetype, that spill is THE cost: 15.7k spilled entries
ride the near-scalar XLA compact tail at ~18 ns/entry = ~0.3 ms while
the whole 1M-entry core runs 0.2 ms.

This module turns the spill into device-friendly work by composing
existing kernels:

1. **stage-1 sorted gather** (ext_gather.make_sorted_gather): the
   tail's globally-sorted unique columns, packed <= 1024 per R-aligned
   x window, become a compact "hot region" (H, 128). Unique-col
   spacing makes the windows tiny even when raw entries scatter.
2. **stage-2 gather**: every tail ENTRY reads its x value from the hot
   region into the chip layout below. Two flavors:
   * *resident* (ext_gather.make_ranked_gather) — O(H) mask-reduce per
     output row; fine while H <= H_CAP.
   * *windowed* (ext_gather.make_resident_window_gather) — entries
     within a row are column-sorted, so a chip row's hot positions sit
     in a small window; O(R_h) per row unlocks webbase-class tails
     whose dedup'd column count is far past the resident budget.
3. **windowed one-hot MXU segment-sum** (segsum_kernel
   .make_window_segsum): heavy rows are grouped 8 to a *block*; chip
   quantum (tile t, lane q) holds the rank-k entries of block b(t,q)'s
   8 rows in its 8 sublanes — exactly the (total_tile_rows, nq)
   partial layout the segsum kernel consumes. prod = vals * xg
   elementwise IS the partial array; the kernel's bf16x3 one-hot dot
   reduces it to per-row sums with zero scatter.

**Split mode** (plan_chips_split): when the whole tail's uniques
exceed the resident budget, entries split by diagonal distance:
*local* entries (94% on the webbase archetype) ride the windowed
gather over a large near-diagonal hot region; *far* entries (plus any
local entry whose chip-row window overflows) dedup hard (webbase: 49k
far entries -> 123 hot sublanes) and ride the resident gather. Both
streams share one heavy-row/block space; their segsums add before the
single ``y.at[heavy_ids].add`` — the only scalar-ish step left.

Heavy rows sort by (ceil-log2 length, row id): blocks get similar
lengths (fill ~1: a block's quanta count is its max row length) AND
nearby row ids (small local windows). Tables are host NumPy; device
arrays travel as jit arguments per repo convention.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from spmv_scpa_tpu.formats.panel_ell import BC
from spmv_scpa_tpu.ops import ext_gather
from spmv_scpa_tpu.ops.segsum_kernel import make_window_segsum

# resident stage-2 hot cap, in 8-row sublane units (= ext_gather.H_MAX:
# 1024 sublanes * 128 lanes * 4 B = 512 KB of VMEM).
H_CAP = ext_gather.H_MAX
# stage-2 VPU budgets: each output sublane-row costs H*BC*3 (resident)
# or R_h*BC*3 (windowed) ops; ~2 Tops VPU => 2e8 ops ~ 0.1 ms.
VPU_BUDGET = 2e8
# Per-stream cap for split plans: ~0.6 ms of VPU at ~2 Tops. Raised
# from 6e8 in round 4 — the whole-matrix webbase plan needs a 7.4e8
# loc stream (r_hot=104 x 18k tile rows), and the measured alternative
# (hybrid + delegation) floors at 2.3-2.9 ms, so a 0.4-0.6 ms stream
# is still the cheapest route for that regime.
SPLIT_VPU_BUDGET = 1.2e9
# default stage-1 window reach (panels); adaptive per unique spacing.
R_PANELS = 512
# windowed stage-2 reach (sublanes of the hot region) and resident-hot
# VMEM cap for the windowed kernel (full hot lives in VMEM).
R_HOT = 128
H_WIN_CAP = 16384            # 8 MB f32
# local/far diagonal split distance
W_LOC = 4096


def _adaptive_r(uniq: np.ndarray, cap: int = R_PANELS) -> int:
    """Stage-1 window reach: smallest power-of-two panel count whose
    windows hold 1024 consecutive uniques (dedup makes them dense)."""
    if uniq.size <= 8 * BC:
        span = int(uniq[-1] // BC - uniq[0] // BC) + 1 if uniq.size \
            else 1
    else:
        s = uniq[8 * BC - 1:] // BC - uniq[:-(8 * BC) + 1] // BC
        span = int(s.max()) + 1
    r = 8
    while r < span and r < cap:
        r *= 2
    return r


def _pack_sorted_uniques(uniq: np.ndarray, n: int, r_cap: int):
    """Pack sorted unique columns into <=1024-entry groups sharing one
    r_cap-panel-aligned x window. Returns (base, p1, l1, pos, Hs,
    n_groups, n1p_blocks) — the stage-1 tables plus each unique's hot
    slot ``pos``."""
    region = uniq // (r_cap * BC)
    reg_u, reg_start = np.unique(region, return_index=True)
    reg_end = np.r_[reg_start[1:], uniq.size]
    base_l: list[int] = []
    pos = np.empty(uniq.size, np.int64)
    cursor = 0
    for r0, s, e in zip(reg_u, reg_start, reg_end):
        for a in range(s, e, 8 * BC):
            sel = np.arange(a, min(a + 8 * BC, e))
            base_l.append(int(r0))
            pos[sel] = cursor * BC + (sel - a)
            cursor += 8
    n_groups = len(base_l)
    Hs = cursor
    n_panels = -(-n // BC)
    n1p_blocks = max(-(-n_panels // r_cap), int(max(base_l)) + 1)
    p1 = np.zeros((n_groups * 8, BC), np.int32)
    l1 = np.zeros((n_groups * 8, BC), np.int32)
    srow, slane = pos // BC, pos % BC
    p1[srow, slane] = (uniq // BC
                       - np.asarray(base_l, np.int64)[srow // 8]
                       * r_cap)
    l1[srow, slane] = uniq % BC
    return (np.asarray(base_l, np.int32), p1, l1, pos, Hs, n_groups,
            n1p_blocks)


def _window_pack(blk_w: np.ndarray, num_windows: int, h: int,
                 qps: int):
    """Assign quanta (block-major) to a window-grouped padded stream.
    Every window gets >= 1 step (unvisited segsum output blocks would
    be uninitialized VMEM). Returns (new_q, win_of_step, n_q_pad)."""
    q_blk = np.repeat(np.arange(blk_w.size), blk_w)
    q_win = q_blk // h
    n_q = q_blk.size
    new_q = np.full(n_q, -1, np.int64)
    win_of_step_l: list[int] = []
    cur = 0
    for w in range(num_windows):
        qi = np.flatnonzero(q_win == w)
        new_q[qi] = cur + np.arange(qi.size)
        n_steps_w = max(1, -(-qi.size // qps))
        win_of_step_l.extend([w] * n_steps_w)
        cur += n_steps_w * qps
    rbl_src = (q_blk - q_win * h).astype(np.int32)
    return new_q, rbl_src, np.asarray(win_of_step_l, np.int64), cur


def _subset_ranks(sel: np.ndarray, e_row_i: np.ndarray, NH: int):
    """Rank of each selected entry among its row's selected entries
    (entries row-grouped in input order)."""
    excl = np.cumsum(sel) - sel
    start = np.full(NH, np.iinfo(np.int64).max, np.int64)
    if sel.any():
        np.minimum.at(start, e_row_i[sel], excl[sel])
    return excl - start[e_row_i]


class ChipsPlan:
    __slots__ = ("n_e", "H", "n_groups", "R", "n1p_blocks", "base",
                 "p1", "l1", "E8", "p2", "l2", "vals", "rbl",
                 "win_of_step", "num_windows", "h", "rows_per_step",
                 "heavy_ids", "NH")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class _Stream:
    """One gather+segsum stream of a split plan."""
    __slots__ = ("kind", "base1", "p1", "l1", "n1p_blocks", "r1", "H",
                 "E8", "p2", "l2", "vals", "rbl", "win_of_step",
                 "base8", "H_pad", "r_hot", "n_entries")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class SplitChipsPlan:
    __slots__ = ("n_e", "h", "rows_per_step", "num_windows",
                 "heavy_ids", "NH", "loc", "far", "cold", "pop_k")

    def __init__(self, **kw):
        kw.setdefault("cold", None)
        kw.setdefault("pop_k", None)
        for k, v in kw.items():
            setattr(self, k, v)

    @property
    def streams(self):
        return tuple(s for s in (self.loc, self.far, self.cold)
                     if s is not None)


def _placeholder_stream(kind_key: str, *, n: int, h: int,
                        rows_per_step: int, num_windows: int,
                        r_hot: int | None, r_far: int | None):
    """Zero-entry stream with well-formed minimal shapes — a shard
    missing a stream the SPMD set demands runs this instead: every
    window still gets one step (the segsum zeroes a window's output
    block at its first visit), every slot carries vals=0 so all
    gathered values multiply away. Shapes are then padded to the
    shared SPMD shapes by :func:`pad_split_plan` like any real
    stream's."""
    qps = (rows_per_step // 8) * BC
    blk_w = np.zeros(1, np.int64)
    _, _, wos, n_q_pad = _window_pack(blk_w, num_windows, h, qps)
    steps = n_q_pad // qps
    E8 = steps * rows_per_step
    vals_a = np.zeros((E8, BC), np.float32)
    p2 = np.zeros((E8, BC), np.int32)
    l2 = np.zeros((E8, BC), np.int32)
    rbl = np.full(n_q_pad, h, np.int32)
    if kind_key == "loc":
        rh = r_hot if r_hot else 16
        return _Stream(kind="windowed-x", base1=None, p1=None, l1=None,
                       n1p_blocks=0, r1=0, H=-(-n // BC), E8=E8,
                       p2=p2, l2=l2, vals=vals_a, rbl=rbl,
                       win_of_step=wos,
                       base8=np.zeros(E8, np.int32),
                       H_pad=-(-n // BC) + rh, r_hot=rh, n_entries=0)
    r1 = r_far if r_far else R_PANELS
    n_panels = -(-n // BC)
    return _Stream(kind="resident",
                   base1=np.zeros(1, np.int32),
                   p1=np.zeros((8, BC), np.int32),
                   l1=np.zeros((8, BC), np.int32),
                   n1p_blocks=max(-(-n_panels // r1), 1), r1=r1,
                   H=8, E8=E8, p2=p2, l2=l2, vals=vals_a, rbl=rbl,
                   win_of_step=wos, base8=None, H_pad=8, r_hot=0,
                   n_entries=0)


def _heavy_index(rows: np.ndarray, by_len_only: bool):
    hr, first, cnt = np.unique(rows, return_index=True,
                               return_counts=True)
    NH = int(hr.size)
    if by_len_only:
        order = np.argsort(-cnt, kind="stable")
    else:       # (ceil-log2 length, row id): similar length AND nearby
        lg = np.ceil(np.log2(np.maximum(cnt, 1))).astype(np.int64)
        order = np.argsort((lg << 44) + hr, kind="stable")
    hpos_of_row = np.empty(NH, np.int64)
    hpos_of_row[order] = np.arange(NH)
    e_row_i = np.searchsorted(hr, rows)
    e_hpos = hpos_of_row[e_row_i]
    return hr[order], hpos_of_row, e_row_i, e_hpos, first, cnt, NH


def plan_chips(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
               m: int, n: int, h: int = 256,
               rows_per_step: int = 8):
    """Plan the chips tail for ``(rows, cols, vals)`` entries (CSR
    order): single resident pipeline when the dedup'd columns fit the
    budgets, else the local/far split. Returns None when neither fits
    (caller falls back)."""
    n_e = int(rows.size)
    if n_e == 0:
        return None
    uniq = np.unique(cols)
    e8_est = -(-n_e // BC) + 2 * (-(-int(np.unique(rows).size) // 8))
    Hs_est = -(-uniq.size // BC) + 8   # + group-split padding slack
    if (Hs_est <= H_CAP
            and e8_est * Hs_est * BC * 3 <= VPU_BUDGET):
        p = _plan_single(rows, cols, vals, m, n, h, rows_per_step)
        if p is not None:
            return p
    return plan_chips_split(rows, cols, vals, m, n, h, rows_per_step)


def _plan_single(rows, cols, vals, m, n, h, rows_per_step,
                 r_cap: int | None = None):
    n_e = int(rows.size)
    uniq, inv = np.unique(cols, return_inverse=True)
    r1 = r_cap if r_cap is not None else _adaptive_r(uniq)
    base, p1, l1, pos, Hs, n_groups, n1p_blocks = \
        _pack_sorted_uniques(uniq, n, r1)
    if Hs > H_CAP:
        return None

    hr_sorted, hpos_of_row, e_row_i, e_hpos, first, cnt, NH = \
        _heavy_index(rows, by_len_only=True)
    blk = e_hpos // 8
    sub = e_hpos % 8
    cnt_sorted = np.zeros(NH, np.int64)
    cnt_sorted[hpos_of_row] = cnt
    blk_w = np.zeros(-(-NH // 8), np.int64)
    np.maximum.at(blk_w, np.arange(NH) // 8, cnt_sorted)
    num_windows = max(1, -(-int(blk_w.size) // h))
    qps = (rows_per_step // 8) * BC
    new_q, rbl_src, win_of_step, n_q_pad = _window_pack(
        blk_w, num_windows, h, qps)
    blk_q0 = np.concatenate([[0], np.cumsum(blk_w)])
    rank = np.arange(n_e) - first[e_row_i]
    q_of_e = new_q[blk_q0[blk] + rank]
    steps = n_q_pad // qps
    E8 = steps * rows_per_step
    if E8 * Hs * BC * 3 > VPU_BUDGET:
        return None

    tile = q_of_e // BC
    lane = q_of_e % BC
    erow = tile * 8 + sub
    vals_a = np.zeros((E8, BC), np.float32)
    p2 = np.zeros((E8, BC), np.int32)
    l2 = np.zeros((E8, BC), np.int32)
    vals_a[erow, lane] = vals
    hotpos = pos[inv]
    p2[erow, lane] = (hotpos // BC).astype(np.int32)
    l2[erow, lane] = (hotpos % BC).astype(np.int32)
    rbl = np.full(n_q_pad, h, np.int32)
    rbl[new_q] = rbl_src

    return ChipsPlan(
        n_e=n_e, H=Hs, n_groups=n_groups, R=r1,
        n1p_blocks=n1p_blocks, base=base,
        p1=p1, l1=l1, E8=E8, p2=p2, l2=l2, vals=vals_a, rbl=rbl,
        win_of_step=win_of_step, num_windows=num_windows, h=h,
        rows_per_step=rows_per_step, heavy_ids=hr_sorted, NH=NH)


def pad_resident_plan(plan: ChipsPlan, *, n_groups: int,
                      n1p_blocks: int, steps: int, num_windows: int,
                      NH: int, heavy_pad_pool: np.ndarray) -> ChipsPlan:
    """Pad a resident ChipsPlan to shared SPMD shapes so several
    shards' plans run as ONE program (parallel/distributed.py). All
    plans must share R, h and rows_per_step (plan with a forced
    ``r_cap``); every padded slot contributes exactly zero:

    * extra stage-1 groups gather garbage into hot rows no p2 entry
      references;
    * extra chip rows carry vals=0 (their gathered x multiplies away);
    * extra steps first give every window missing on THIS shard one
      step (the segsum zeroes a window's output block at its first
      step — an unvisited block would be uninitialized VMEM), then
      repeat the last window so ``win_of_step`` stays non-decreasing;
    * extra heavy slots take ids from ``heavy_pad_pool`` (rows with no
      tail entries on this shard — their window-segsum rows are zero,
      so the merge adds 0 to them).
    """
    h, rps = plan.h, plan.rows_per_step
    qps = (rps // 8) * BC
    pad_g = n_groups - plan.n_groups
    assert pad_g >= 0 and steps * rps >= plan.E8 >= 0
    base = np.concatenate([plan.base, np.zeros(pad_g, np.int32)])
    p1 = np.concatenate(
        [plan.p1, np.zeros((pad_g * 8, BC), np.int32)])
    l1 = np.concatenate(
        [plan.l1, np.zeros((pad_g * 8, BC), np.int32)])
    wos = list(plan.win_of_step)
    wos.extend(range(plan.num_windows, num_windows))
    assert len(wos) <= steps, (len(wos), steps)
    wos.extend([num_windows - 1] * (steps - len(wos)))
    pad_e = steps * rps - plan.E8
    vals = np.concatenate(
        [plan.vals, np.zeros((pad_e, BC), np.float32)])
    p2 = np.concatenate([plan.p2, np.zeros((pad_e, BC), np.int32)])
    l2 = np.concatenate([plan.l2, np.zeros((pad_e, BC), np.int32)])
    rbl = np.concatenate(
        [plan.rbl,
         np.full(steps * qps - plan.rbl.size, h, np.int32)])
    pad_n = NH - plan.NH
    assert pad_n >= 0 and heavy_pad_pool.size >= pad_n
    heavy = np.concatenate(
        [plan.heavy_ids,
         heavy_pad_pool[:pad_n].astype(plan.heavy_ids.dtype)])
    return ChipsPlan(
        n_e=plan.n_e, H=n_groups * 8, n_groups=n_groups, R=plan.R,
        n1p_blocks=n1p_blocks, base=base, p1=p1, l1=l1,
        E8=steps * rps, p2=p2, l2=l2, vals=vals, rbl=rbl,
        win_of_step=np.asarray(wos, np.int64),
        num_windows=num_windows, h=h, rows_per_step=rps,
        heavy_ids=heavy, NH=NH)


def split_shape_template(plans: list) -> dict:
    """Shared SPMD shapes over several shards' ``SplitChipsPlan``s
    (all planned with the same forced r_hot/r_far/r_cold/x_direct and
    force_streams — the DECISIONS are program structure, the shapes
    here are just padding targets)."""
    tpl = {"NH": max(p.NH for p in plans),
           "num_windows": max(p.num_windows for p in plans)}
    for k in ("loc", "far", "cold"):
        ss = [getattr(p, k) for p in plans]
        if any(s is None for s in ss):
            assert all(s is None for s in ss), \
                f"stream '{k}' present on some shards only"
            continue
        ent = {"steps": max(s.E8 // p.rows_per_step
                            + (tpl["num_windows"] - p.num_windows)
                            for s, p in zip(ss, plans)),
               "H_pad": max(s.H_pad for s in ss)}
        assert len({s.kind for s in ss}) == 1, f"mixed '{k}' kinds"
        if ss[0].kind != "windowed-x":          # has stage-1 tables
            ent["n_groups"] = max(s.p1.shape[0] // 8 for s in ss)
            ent["n1p_blocks"] = max(s.n1p_blocks for s in ss)
            assert len({s.r1 for s in ss}) == 1, "unforced r1"
        if ss[0].kind in ("windowed", "windowed-x"):
            assert len({s.r_hot for s in ss}) == 1, "unforced r_hot"
        tpl[k] = ent
    return tpl


def pad_split_plan(plan: SplitChipsPlan, tpl: dict,
                   heavy_pad_pool: np.ndarray) -> SplitChipsPlan:
    """Pad one shard's split plan to the shared template shapes (the
    split-plan analog of :func:`pad_resident_plan`; same zero-
    contribution padding arguments apply per stream)."""
    h, rps = plan.h, plan.rows_per_step
    qps = (rps // 8) * BC
    nw = tpl["num_windows"]

    def pad_stream(s: _Stream, ent: dict) -> _Stream:
        steps = ent["steps"]
        wos = list(s.win_of_step)
        wos.extend(range(plan.num_windows, nw))
        assert len(wos) <= steps, (len(wos), steps)
        wos.extend([nw - 1] * (steps - len(wos)))
        pad_e = steps * rps - s.E8
        assert pad_e >= 0
        vals = np.concatenate(
            [s.vals, np.zeros((pad_e, BC), np.float32)])
        p2 = np.concatenate([s.p2, np.zeros((pad_e, BC), np.int32)])
        l2 = np.concatenate([s.l2, np.zeros((pad_e, BC), np.int32)])
        rbl = np.concatenate(
            [s.rbl, np.full(steps * qps - s.rbl.size, h, np.int32)])
        kw = dict(kind=s.kind, n1p_blocks=s.n1p_blocks, r1=s.r1,
                  H=s.H, E8=steps * rps, p2=p2, l2=l2, vals=vals,
                  rbl=rbl, win_of_step=np.asarray(wos, np.int64),
                  H_pad=ent["H_pad"], r_hot=s.r_hot,
                  n_entries=s.n_entries, base1=s.base1, p1=s.p1,
                  l1=s.l1, base8=s.base8)
        if s.base8 is not None:             # windowed / windowed-x
            kw["base8"] = np.concatenate(
                [s.base8, np.zeros(pad_e, np.int32)])
        if s.kind != "windowed-x":          # has stage-1 tables
            pad_g = ent["n_groups"] - s.p1.shape[0] // 8
            assert pad_g >= 0
            kw["base1"] = np.concatenate(
                [s.base1, np.zeros(pad_g, np.int32)])
            kw["p1"] = np.concatenate(
                [s.p1, np.zeros((pad_g * 8, BC), np.int32)])
            kw["l1"] = np.concatenate(
                [s.l1, np.zeros((pad_g * 8, BC), np.int32)])
            kw["n1p_blocks"] = ent["n1p_blocks"]
            kw["H"] = ent["n_groups"] * 8
            if s.kind == "resident":
                kw["H_pad"] = ent["n_groups"] * 8
        return _Stream(**kw)

    pad_n = tpl["NH"] - plan.NH
    assert pad_n >= 0 and heavy_pad_pool.size >= pad_n
    heavy = np.concatenate(
        [plan.heavy_ids,
         heavy_pad_pool[:pad_n].astype(plan.heavy_ids.dtype)])
    out = {k: (pad_stream(getattr(plan, k), tpl[k])
               if getattr(plan, k) is not None else None)
           for k in ("loc", "far", "cold")}
    return SplitChipsPlan(n_e=plan.n_e, h=h, rows_per_step=rps,
                          num_windows=nw, heavy_ids=heavy,
                          NH=tpl["NH"], **out)


def plan_chips_split(rows, cols, vals, m, n, h: int = 256,
                     rows_per_step: int = 8, w_loc: int = W_LOC,
                     r_hot: int | None = None,
                     x_direct: bool | None = None,
                     r_far: int | None = None,
                     r_cold: int | None = None,
                     pop_k: int | None = None,
                     force_streams: tuple | None = None):
    """Local/far split plan (module docstring). Returns None when the
    far side exceeds the resident budgets. ``x_direct`` overrides the
    automatic direct-x/dedup'd local-stream choice (tests).

    The remaining keywords force per-shard plan DECISIONS to shared
    values so several shards compile to ONE SPMD program
    (parallel/distributed.py): ``r_far``/``r_cold`` pin the far/cold
    stage-1 window reach, ``pop_k`` pins the popularity-split cutoff
    (0 = no split), and ``force_streams`` (subset of {"loc", "far",
    "cold"}) demands exactly that set of streams — a shard missing one
    gets a zero-entry placeholder (every slot carries vals=0), and a
    shard needing one NOT in the set fails (returns None)."""
    n_e = int(rows.size)
    if n_e == 0:
        return None
    hr_sorted, hpos_of_row, e_row_i, e_hpos, first, cnt, NH = \
        _heavy_index(rows, by_len_only=False)
    blk = e_hpos // 8
    sub = e_hpos % 8
    nblocks = -(-NH // 8)
    num_windows = max(1, -(-nblocks // h))
    qps = (rows_per_step // 8) * BC

    loc = np.abs(cols - rows) <= w_loc

    def _cnt_per_hpos(sel):
        c = np.zeros(NH, np.int64)
        if sel.any():
            np.add.at(c, e_hpos[sel], 1)
        return c

    def _blk_w(cnt_h):
        bw = np.zeros(nblocks, np.int64)
        np.maximum.at(bw, np.arange(NH) // 8, cnt_h)
        return bw

    # ---- LOCAL stream (windowed stage-2) -----------------------------
    # Two gather sources, picked by whether x itself fits the windowed
    # kernel's resident cap:
    #
    # * **direct-x** (``windowed-x``): the resident region IS x padded
    #   to (H_pad, 128) — no stage-1, no dedup. Near-diagonal spill
    #   entries barely dedup (webbase: 725k entries -> 523k uniques,
    #   1.4x) while dedup'd hot POSITIONS stay as spread as raw
    #   columns, so the old dedup'd path paid r_hot = 256-512 sublane
    #   passes per chip row — the measured 1.67 ms on the webbase
    #   archetype's 851k-entry tail (docs/PERF_LOG.md round 3). Raw
    #   diagonal windows span <= the locality band: r_hot ~ 32.
    # * **dedup'd hot** (``windowed``): the round-3 path, kept for
    #   n past the VMEM cap (stage-1 compacts columns first).
    stream_l = None
    migrate = np.zeros(n_e, bool)
    if x_direct is None:
        x_direct = -(-n // BC) + (r_hot or 512) <= H_WIN_CAP
    if loc.any():
        if x_direct:
            base1 = p1 = l1 = None
            ngl, n1pb, r1l, Hl = 0, 0, 0, -(-n // BC)
        else:
            uniq_l = np.unique(cols[loc])
            r1l = _adaptive_r(uniq_l)
            base1, p1, l1, posu, Hl, ngl, n1pb = _pack_sorted_uniques(
                uniq_l, n, r1l)
            if Hl + (r_hot or 512) > H_WIN_CAP:
                return None
        blk_wl = _blk_w(_cnt_per_hpos(loc))
        # Quanta padding policy differs by gather source:
        #
        # * dedup'd hot: round every block's quanta up to full tiles
        #   (BC quanta) so a tile never crosses blocks — hot POSITIONS
        #   are dedup-rank space, where only one row's consecutive
        #   sorted entries are window-tight (measured: unpadded tiles
        #   mixed ~40 narrow blocks and spanned 4.5k hot sublanes).
        # * direct-x: NO rounding. Positions are raw columns and
        #   heavy rows are (log2 len, row id)-sorted (_heavy_index),
        #   so a tile mixing several adjacent blocks spans nearby
        #   diagonals anyway — while the round-up explodes short-row
        #   tails (webbase: 1.16M local entries -> 4.98M quanta,
        #   fill 0.23, failing SPLIT_VPU_BUDGET outright).
        if not x_direct:
            blk_wl = np.where(blk_wl > 0, -(-blk_wl // BC) * BC, 0)
        new_q, rbl_src, wos, n_q_pad = _window_pack(
            blk_wl, num_windows, h, qps)
        blk_q0 = np.concatenate([[0], np.cumsum(blk_wl)])
        rank_l = _subset_ranks(loc, e_row_i, NH)
        li = np.flatnonzero(loc)
        q_of_e = new_q[blk_q0[blk[li]] + rank_l[li]]
        steps = n_q_pad // qps
        E8 = steps * rows_per_step
        tile = q_of_e // BC
        lane = q_of_e % BC
        erow = tile * 8 + sub[li]
        if x_direct:
            pos_e = cols[li]              # x-space positions directly
        else:
            pos_e = posu[np.searchsorted(uniq_l, cols[li])]
        psub = pos_e // BC
        # per-TABLE-ROW window base, 8-sublane units (each table row
        # holds one heavy row's consecutive column-sorted entries, so
        # its hot positions span that row's own locality). Entries
        # past the window reach migrate to the far stream (their
        # slots stay as zero padding — layout needs no recompute).
        tmin = np.full(E8, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(tmin, erow, psub)
        base8 = np.where(tmin == np.iinfo(np.int64).max, 0,
                         tmin // 8).astype(np.int32)
        off = psub - base8[erow].astype(np.int64) * 8
        if r_hot is None:
            # adaptive reach: cover ~97% of entries (the rest migrate
            # to the far stream), rounded to a multiple of 8 — Mosaic
            # dynamic slices take any 8-aligned static size, and the
            # windowed gather's VPU cost is O(E8 * r_hot) so every
            # sublane of slack pays directly (pow2 rounding cost the
            # webbase whole-matrix plan a 64-vs-40 reach = 1.6x VPU)
            tgt = int(np.percentile(off, 97)) + 1 if off.size else 1
            r_hot = int(min(max(-(-tgt // 8) * 8, 16), 512))
        if E8 * r_hot * BC * 3 > SPLIT_VPU_BUDGET:
            return None
        fits = off < r_hot
        migrate[li[~fits]] = True
        ef, lf, oi = erow[fits], lane[fits], li[fits]
        vals_a = np.zeros((E8, BC), np.float32)
        p2 = np.zeros((E8, BC), np.int32)
        l2 = np.zeros((E8, BC), np.int32)
        vals_a[ef, lf] = vals[oi]
        p2[ef, lf] = off[fits].astype(np.int32)
        l2[ef, lf] = (pos_e[fits] % BC).astype(np.int32)
        rbl = np.full(n_q_pad, h, np.int32)
        rbl[new_q] = rbl_src
        H_pad = int(base8.max(initial=0)) * 8 + r_hot
        stream_l = _Stream(kind="windowed-x" if x_direct else
                           "windowed", base1=base1, p1=p1, l1=l1,
                           n1p_blocks=n1pb, r1=r1l, H=Hl, E8=E8,
                           p2=p2, l2=l2, vals=vals_a, rbl=rbl,
                           win_of_step=wos, base8=base8, H_pad=H_pad,
                           r_hot=r_hot, n_entries=int(fits.sum()))

    # ---- FAR stream(s) (resident stage-2) ----------------------------
    def _resident_stream(sel, r_cap=None):
        """Build one resident-gather stream for the entries in ``sel``;
        None when its dedup'd columns bust the resident/VPU budgets."""
        uniq_f = np.unique(cols[sel])
        if -(-uniq_f.size // BC) > H_CAP:
            return None
        r1f = r_cap if r_cap is not None else _adaptive_r(uniq_f)
        base1, p1, l1, posu, Hf, ngf, n1pb = _pack_sorted_uniques(
            uniq_f, n, r1f)
        if Hf > H_CAP:
            return None
        blk_wf = _blk_w(_cnt_per_hpos(sel))
        new_q, rbl_src, wos, n_q_pad = _window_pack(
            blk_wf, num_windows, h, qps)
        blk_q0 = np.concatenate([[0], np.cumsum(blk_wf)])
        rank_f = _subset_ranks(sel, e_row_i, NH)
        fi = np.flatnonzero(sel)
        q_of_e = new_q[blk_q0[blk[fi]] + rank_f[fi]]
        steps = n_q_pad // qps
        E8 = steps * rows_per_step
        if E8 * Hf * BC * 3 > SPLIT_VPU_BUDGET:
            return None
        tile = q_of_e // BC
        lane = q_of_e % BC
        erow = tile * 8 + sub[fi]
        pos_e = posu[np.searchsorted(uniq_f, cols[fi])]
        vals_a = np.zeros((E8, BC), np.float32)
        p2 = np.zeros((E8, BC), np.int32)
        l2 = np.zeros((E8, BC), np.int32)
        vals_a[erow, lane] = vals[fi]
        p2[erow, lane] = (pos_e // BC).astype(np.int32)
        l2[erow, lane] = (pos_e % BC).astype(np.int32)
        rbl = np.full(n_q_pad, h, np.int32)
        rbl[new_q] = rbl_src
        return _Stream(kind="resident", base1=base1, p1=p1, l1=l1,
                       n1p_blocks=n1pb, r1=r1f, H=Hf, E8=E8,
                       p2=p2, l2=l2, vals=vals_a, rbl=rbl,
                       win_of_step=wos, base8=None, H_pad=Hf,
                       r_hot=0, n_entries=int(sel.sum()))

    far = (~loc) | migrate
    stream_f = stream_c = None
    used_k = 0 if pop_k is None else pop_k
    if far.any():
        erank = None
        if pop_k is None or pop_k > 0:
            # Popularity ranks: webbase-class hub entries follow a Zipf
            # law, so a small set of popular columns carries nearly all
            # far ENTRIES while the dedup'd column COUNT (which sets
            # both the resident height H and the O(H)-per-row VPU cost)
            # is dominated by the cold once-referenced tail. Splitting
            # by per-column entry count gives a hot stream with tiny H
            # (top columns dedup hard) and a cold stream whose few
            # entries afford a taller H — each within the budgets a
            # single stream busts.
            uf, inv_f = np.unique(cols[far], return_inverse=True)
            cnt_f = np.bincount(inv_f)
            pop = np.argsort(-cnt_f, kind="stable")   # unique ids
            rank_of_u = np.empty(uf.size, np.int64)
            rank_of_u[pop] = np.arange(uf.size)
            erank = np.zeros(n_e, np.int64)
            erank[far] = rank_of_u[inv_f]             # popularity rank
        if pop_k is not None:                # forced decision (SPMD)
            if pop_k == 0:
                stream_f = _resident_stream(far, r_far)
                if stream_f is None:
                    return None
            else:
                hot_sel = far & (erank < pop_k)
                cold_sel = far & (erank >= pop_k)
                if hot_sel.any():
                    stream_f = _resident_stream(hot_sel, r_far)
                    if stream_f is None:
                        return None
                if cold_sel.any():
                    stream_c = _resident_stream(cold_sel, r_cold)
                    if stream_c is None:
                        return None
        else:
            stream_f = _resident_stream(far, r_far)
            if stream_f is None:
                # smallest feasible hot set wins (the hot stream's
                # cost scales with H_hot)
                for K in (256, 1024, 4096, 16384, 65536, H_CAP * BC):
                    if K >= uf.size:
                        break            # no split left to try
                    hot_sel = far & (erank < K)
                    cold_sel = far & (erank >= K)
                    s_h = (_resident_stream(hot_sel, r_far)
                           if hot_sel.any() else None)
                    s_c = _resident_stream(cold_sel, r_cold)
                    if s_h is not None and s_c is not None:
                        stream_f, stream_c, used_k = s_h, s_c, K
                        break
                if stream_f is None:
                    return None

    if stream_l is None and stream_f is None and stream_c is None:
        return None
    plan = SplitChipsPlan(n_e=n_e, h=h, rows_per_step=rows_per_step,
                          num_windows=num_windows,
                          heavy_ids=hr_sorted, NH=NH,
                          loc=stream_l, far=stream_f, cold=stream_c,
                          pop_k=used_k)
    if force_streams is not None:
        have = {k for k, s in (("loc", stream_l), ("far", stream_f),
                               ("cold", stream_c)) if s is not None}
        want = set(force_streams)
        if have - want:
            return None          # shard needs a stream the set lacks
        for k in want - have:
            s = _placeholder_stream(
                k, n=n, h=h, rows_per_step=rows_per_step,
                num_windows=num_windows, r_hot=r_hot,
                r_far=r_far if k == "far" else r_cold)
            setattr(plan, k, s)
    return plan


def _prepare_stream(s: _Stream, n: int, h: int, rows_per_step: int,
                    num_windows: int, dtype, interpret: bool):
    """Device pipeline for one stream: returns (fn(x)->ys, args)."""
    kind = s.kind
    if kind == "windowed-x":
        # direct-x windowed gather: the resident region IS x itself
        # (padded to the window reach) — no stage-1, no dedup tables.
        s1 = None
        s2 = ext_gather.make_resident_window_gather(
            s.E8 // 8, s.r_hot, s.H_pad, dtype, interpret)
    else:
        ng1 = s.p1.shape[0] // 8
        s1 = ext_gather.make_sorted_gather(ng1, s.n1p_blocks, s.r1,
                                           dtype, interpret)
        if kind == "windowed":
            s2 = ext_gather.make_resident_window_gather(
                s.E8 // 8, s.r_hot, s.H_pad, dtype, interpret)
        else:
            s2 = ext_gather.make_ranked_gather(s.H, s.E8, dtype,
                                               interpret)
    seg_fn, seg_args = make_window_segsum(
        win_of_step=s.win_of_step, num_windows=num_windows, h=h,
        rows_per_step=rows_per_step, nq=BC, total_tile_rows=s.E8,
        dtype=dtype, interpret=interpret)
    dev = []
    if s1 is not None:
        dev.extend(jax.device_put(jnp.asarray(a)) for a in
                   (s.base1, s.p1, s.l1))
    dev.extend(jax.device_put(jnp.asarray(a)) for a in (s.p2, s.l2))
    dev.append(jax.device_put(jnp.asarray(s.vals, dtype)))
    dev.append(jax.device_put(jnp.asarray(s.rbl, jnp.int32)))
    if kind in ("windowed", "windowed-x"):
        dev.append(jax.device_put(jnp.asarray(s.base8)))
    dev.extend(seg_args)
    n_args = len(dev)
    if kind == "windowed-x":
        nx = min(n, s.H_pad * BC)

        def fn(x, *a):
            p2, l2, vals, rbl, base8, *seg_a = a
            xp = jnp.zeros((s.H_pad * BC,), dtype) \
                .at[:nx].set(x[:nx].astype(dtype))
            xg = s2(base8, xp.reshape(s.H_pad, BC), p2, l2)
            return seg_fn(vals * xg, rbl, *seg_a)

        return fn, tuple(dev), n_args

    n1 = s.n1p_blocks * s.r1 * BC
    ng1 = s.p1.shape[0] // 8
    pad_h = s.H_pad - ng1 * 8

    def fn(x, *a):
        base1, p1, l1, p2, l2, vals, rbl = a[:7]
        rest = a[7:]
        xf = x.astype(dtype)
        x1 = jnp.zeros((n1,), dtype).at[:n].set(xf)
        hot = s1(base1, x1.reshape(-1, BC), p1, l1)
        if kind == "windowed":
            base8 = rest[0]
            seg_a = rest[1:]
            if pad_h > 0:
                hot = jnp.pad(hot, ((0, pad_h), (0, 0)))
            elif pad_h < 0:
                hot = hot[:s.H_pad]
            xg = s2(base8, hot, p2, l2)
        else:
            seg_a = rest
            xg = s2(hot, p2, l2)
        return seg_fn(vals * xg, rbl, *seg_a)

    return fn, tuple(dev), n_args


def prepare_chips(plan, n: int, dtype, interpret: bool):
    """Build ``raw(x, *args) -> (ys, heavy_ids)`` + device args.
    Dispatches on single vs split plan."""
    if isinstance(plan, SplitChipsPlan):
        return _prepare_chips_split(plan, n, dtype, interpret)
    s1 = ext_gather.make_sorted_gather(
        plan.n_groups, plan.n1p_blocks, plan.R, dtype, interpret)
    s2 = ext_gather.make_ranked_gather(plan.H, plan.E8, dtype,
                                       interpret)
    seg_fn, seg_args = make_window_segsum(
        win_of_step=plan.win_of_step, num_windows=plan.num_windows,
        h=plan.h, rows_per_step=plan.rows_per_step, nq=BC,
        total_tile_rows=plan.E8, dtype=dtype, interpret=interpret)
    n1 = plan.n1p_blocks * plan.R * BC

    base_d = jax.device_put(jnp.asarray(plan.base))
    p1_d = jax.device_put(jnp.asarray(plan.p1))
    l1_d = jax.device_put(jnp.asarray(plan.l1))
    p2_d = jax.device_put(jnp.asarray(plan.p2))
    l2_d = jax.device_put(jnp.asarray(plan.l2))
    vals_d = jax.device_put(jnp.asarray(plan.vals, dtype))
    hid_d = jax.device_put(jnp.asarray(plan.heavy_ids, jnp.int32))
    NH = plan.NH

    # The segsum's rbl travels as a device arg too (repo convention).
    rbl_d = jax.device_put(jnp.asarray(plan.rbl, jnp.int32))

    def raw_contrib(x, base, p1, l1, p2, l2, vals, rbl, hid, *seg_a):
        xf = x.astype(dtype)
        x1 = jnp.zeros((n1,), dtype).at[:n].set(xf)
        hot = s1(base, x1.reshape(-1, BC), p1, l1)
        xg = s2(hot, p2, l2)
        prod = vals * xg
        ys = seg_fn(prod, rbl, *seg_a)           # (num_windows*h, 8)
        return ys.reshape(-1)[:NH], hid

    args = (base_d, p1_d, l1_d, p2_d, l2_d, vals_d, rbl_d, hid_d) \
        + tuple(seg_args)
    hbm = (plan.E8 * BC * (4 + 4 + 4 + 4)        # vals,p2,l2,xg
           + plan.n_groups * plan.R * BC * 4    # stage-1 windows
           + plan.NH * 4)
    return raw_contrib, args, int(hbm)


def _prepare_chips_split(plan: SplitChipsPlan, n, dtype, interpret):
    parts = []
    for s in plan.streams:
        parts.append(_prepare_stream(
            s, n, plan.h, plan.rows_per_step, plan.num_windows,
            dtype, interpret))
    hid_d = jax.device_put(jnp.asarray(plan.heavy_ids, jnp.int32))
    NH = plan.NH

    def raw_contrib(x, *a):
        hid = a[0]
        off = 1
        ys = None
        for fn, _, n_args in parts:
            t = fn(x, *a[off:off + n_args])
            off += n_args
            ys = t if ys is None else ys + t
        return ys.reshape(-1)[:NH], hid

    args = (hid_d,) + tuple(d for _, dev, _ in parts for d in dev)
    hbm = sum(s.E8 * BC * 16 + s.H_pad * BC * 4
              for s in plan.streams) + plan.NH * 4
    return raw_contrib, args, int(hbm)


def split_plan_host_args(plan: SplitChipsPlan, dtype) -> list:
    """Host-side argument arrays in exactly the order
    :func:`_prepare_chips_split` device-puts them — the distributed
    builder stacks these per shard into ONE sharded device_put
    (parallel/distributed.py) and runs every shard's stack through the
    program built from shard 0's plan."""
    np_dt = np.dtype(jnp.dtype(dtype).name)
    out = [np.asarray(plan.heavy_ids, np.int32)]
    for s in plan.streams:
        if s.kind != "windowed-x":
            out += [np.asarray(s.base1, np.int32),
                    np.asarray(s.p1, np.int32),
                    np.asarray(s.l1, np.int32)]
        out += [np.asarray(s.p2, np.int32),
                np.asarray(s.l2, np.int32),
                np.asarray(s.vals, np_dt),
                np.asarray(s.rbl, np.int32)]
        if s.kind in ("windowed", "windowed-x"):
            out.append(np.asarray(s.base8, np.int32))
        out.append(np.asarray(s.win_of_step, np.int32))
    return out


def _merge_h8(NH: int) -> int:
    """Resident ys-region height for the panel merge: strictly more
    than NH/128 sublanes (slot NH is the guaranteed-zero pad entry),
    rounded up to a multiple of 8 — every other resident-gather
    operand in the codebase is 8-sublane aligned and Mosaic block
    tilings want sublane dims in 8s (segsum_kernel.py)."""
    return -(-(NH // BC + 1) // 8) * 8


def merge_tables(heavy_ids: np.ndarray, m: int, G_pad: int,
                 budget: float = 6e8):
    """Host (p2, l2) tables for the zero-scatter panel merge, or None
    when NH exceeds the resident/VPU budgets (caller keeps the
    scatter). Each 128-row output group's lane points at its heavy
    row's slot in the padded ys region; unset lanes point at slot NH —
    a guaranteed-zero pad entry — so no mask stream is needed.
    """
    NH = int(heavy_ids.size)
    assert NH == 0 or int(heavy_ids.max()) < min(m, G_pad * BC), \
        "heavy_ids must index rows (< m <= G_pad*128)"
    H8 = _merge_h8(NH)
    G_out = -(-G_pad // 8) * 8
    if H8 > H_CAP or G_out * H8 * BC * 3 > budget:
        return None
    p2 = np.full((G_out, BC), NH // BC, np.int32)
    l2 = np.full((G_out, BC), NH % BC, np.int32)
    grp = (heavy_ids // BC).astype(np.int64)
    lane = (heavy_ids % BC).astype(np.int64)
    k = np.arange(NH, dtype=np.int64)
    p2[grp, lane] = (k // BC).astype(np.int32)
    l2[grp, lane] = (k % BC).astype(np.int32)
    return p2, l2


MERGE_R_H = 16        # windowed-merge reach (sublanes): heavy ranks
#                       are CONTIGUOUS per 128-row output group (k is
#                       sorted by heavy id), so a group's slots span
#                       <= ceil(128/128)+1 = 2 sublanes; +8 covers the
#                       8-sublane base alignment.


def merge_tables_windowed(heavy_ids: np.ndarray, m: int, G_pad: int,
                          r_h: int = MERGE_R_H):
    """Windowed variant of :func:`merge_tables`: per-output-row window
    bases cut the merge's gather from O(G_out*H8) to O(G_out*r_h) —
    measured consequence of the ranked form: a webbase-class tail
    (NH=18.6k heavy rows) pays 4.6e8 VPU ops (~0.5 ms) in the merge
    ALONE. Heavy ranks are contiguous per output group, so a 16-sublane
    window always suffices. Out-of-window p (== r_h) lanes gather an
    exact 0 (no mask row matches), replacing the ranked form's
    dedicated zero-pad slot. Returns (base8, p2, l2, H8) or None when
    the resident hot region would bust the VMEM cap.
    """
    NH = int(heavy_ids.size)
    assert NH == 0 or int(heavy_ids.max()) < min(m, G_pad * BC), \
        "heavy_ids must index rows (< m <= G_pad*128)"
    if NH and np.any(np.diff(heavy_ids) <= 0):
        # contiguous-ranks-per-group needs ascending ids (the chips
        # plans order heavy rows by (length, id) — they keep the
        # ranked merge; the compacted-PELL tail passes sorted uniques)
        return None
    H8 = max(_merge_h8(NH), r_h)
    if H8 > H_WIN_CAP:
        return None
    G_out = -(-G_pad // 8) * 8
    k = np.arange(NH, dtype=np.int64)
    grp = (heavy_ids // BC).astype(np.int64)
    lane = (heavy_ids % BC).astype(np.int64)
    k_lo = np.searchsorted(heavy_ids, np.arange(G_out) * BC)
    base8 = np.clip(k_lo // BC // 8, 0, (H8 - r_h) // 8).astype(
        np.int32)
    p2 = np.full((G_out, BC), r_h, np.int32)   # out-of-window => 0
    l2 = np.zeros((G_out, BC), np.int32)
    p2[grp, lane] = (k // BC - base8[grp].astype(np.int64) * 8) \
        .astype(np.int32)
    l2[grp, lane] = (k % BC).astype(np.int32)
    assert NH == 0 or (0 <= p2[grp, lane]).all() \
        and (p2[grp, lane] < r_h).all(), "merge window overflow"
    return base8, p2, l2, H8


def merge_hbm(NH: int, G_pad: int) -> int:
    """HBM bytes the panel merge streams per call: p2/l2/out lanes
    (12 B each) + the tiny resident ys region."""
    G_out = -(-G_pad // 8) * 8
    return G_out * BC * 12 + _merge_h8(NH) * BC * 4


def make_merge_apply(NH: int, m: int, G_pad: int, dtype,
                     interpret: bool, use_merge: bool):
    """The shared heavy-row landing step: ``apply(y, ys, *tables) ->
    y'`` adding per-heavy-row sums ``ys`` (NH,) into a dense y (m,).

    ``use_merge=True`` — zero-scatter panel merge: the padded ys
    vector becomes a resident (H8, 128) region and each 128-row output
    group gathers its heavy rows' sums into panel lanes
    (``panel[r // 128, r % 128] = ys[pos(r)]``) added to y DENSELY;
    tables = (p2d, l2d) from :func:`merge_tables`. ``False`` — the
    scalar scatter fallback (~30 ns/row); tables = (hid,). One builder
    serves the standalone chips strategy, the hybrid tail and the
    distributed per-shard merge so the composition can't drift.
    """
    if use_merge:
        H8 = _merge_h8(NH)
        G_out = -(-G_pad // 8) * 8
        s2 = ext_gather.make_ranked_gather(H8, G_out, dtype, interpret)
        pad = H8 * BC - NH

        def apply(y, ys, p2d, l2d):
            ysp = jnp.pad(ys.astype(dtype), (0, pad)).reshape(H8, BC)
            return y + s2(ysp, p2d, l2d).reshape(-1)[:m]
    else:
        def apply(y, ys, hid):
            return y.at[hid].add(ys.astype(y.dtype),
                                 mode="promise_in_bounds",
                                 unique_indices=True)
    return apply


def make_merge_apply_windowed(NH: int, m: int, G_pad: int, H8: int,
                              dtype, interpret: bool,
                              r_h: int = MERGE_R_H):
    """``apply(y, ys, b8d, p2d, l2d) -> y'`` for the windowed merge
    tables — O(r_h) per output row (vs O(H8) ranked)."""
    G_out = -(-G_pad // 8) * 8
    s2 = ext_gather.make_resident_window_gather(
        G_out // 8, r_h, H8, dtype, interpret)
    pad = H8 * BC - NH

    def apply(y, ys, b8d, p2d, l2d):
        ysp = jnp.pad(ys.astype(dtype), (0, pad)).reshape(H8, BC)
        return y + s2(b8d, ysp, p2d, l2d).reshape(-1)[:m]

    return apply


def make_landing(heavy_ids: np.ndarray, m: int, G_pad: int, dtype,
                 interpret: bool, budget: float = 6e8):
    """The heavy-row landing step, fully composed: returns
    ``(land, margs, use_merge, extra_hbm)`` where
    ``land(y, ys, hid, *margs) -> y'`` adds the per-heavy-row sums
    into a dense y. Prefers the zero-scatter panel merge (tables
    travel as the ``margs`` jit arguments; ``hid`` is ignored) and
    falls back to the scalar scatter (``margs`` empty) when the
    tables bust the budgets. The single production composition for
    the standalone chips strategy AND the hybrid tail — the
    distributed builder composes merge_tables/make_merge_apply
    directly because its table shapes unify across shards.
    """
    tw = merge_tables_windowed(heavy_ids, m, G_pad)
    if tw is not None:
        base8, p2, l2, H8 = tw
        apply = make_merge_apply_windowed(
            int(heavy_ids.size), m, G_pad, H8, dtype, interpret)
        margs = (jax.device_put(jnp.asarray(base8)),
                 jax.device_put(jnp.asarray(p2)),
                 jax.device_put(jnp.asarray(l2)))
        extra = merge_hbm(int(heavy_ids.size), G_pad)

        def land(y, ys, hid, *mt):
            return apply(y, ys, *mt)

        return land, margs, True, extra
    t = merge_tables(heavy_ids, m, G_pad, budget)
    use_merge = t is not None
    apply = make_merge_apply(int(heavy_ids.size), m, G_pad, dtype,
                             interpret, use_merge)
    if use_merge:
        margs = (jax.device_put(jnp.asarray(t[0])),
                 jax.device_put(jnp.asarray(t[1])))
        extra = merge_hbm(int(heavy_ids.size), G_pad)

        def land(y, ys, hid, *mt):
            return apply(y, ys, *mt)
    else:
        margs = ()
        extra = 0

        def land(y, ys, hid, *mt):
            return apply(y, ys, hid)

    return land, margs, use_merge, extra


def prepare_chips_strategy(A, dtype=jnp.float32,
                           interpret: bool | None = None,
                           Prepared=None, **_):
    """Standalone ``pallas-chips`` strategy: the whole matrix as
    chips — a pure CSR-vector SpMV (every row cooperatively reduced,
    the CUDA k3 shape) with zero format assumptions. Wins when rows
    are long/imbalanced; refuses (ValueError) when even the split plan
    exceeds the gather budgets so sweeps skip it."""
    from spmv_scpa_tpu.ops.registry import Prepared as _Prepared
    from spmv_scpa_tpu.ops.registry import bind
    if Prepared is None:
        Prepared = _Prepared
    if interpret is None:
        from spmv_scpa_tpu.utils.platform import is_tpu
        interpret = not is_tpu()
    rows = A.row_ids().astype(np.int64)
    cols = A.ja.astype(np.int64)
    plan = plan_chips(rows, cols, A.as_.astype(np.float32), A.m, A.n)
    if plan is None:
        raise ValueError(
            "pallas-chips: matrix exceeds the resident-hot/VPU budget "
            f"(uniq cols or {A.nnz} entries too large)")
    c_raw, c_args, hbm = prepare_chips(plan, A.n, dtype, interpret)
    m = A.m
    G_pad = -(-m // BC)

    land, margs, use_merge, extra = make_landing(
        plan.heavy_ids, m, G_pad, dtype, interpret)
    hbm += extra
    n_c = len(c_args)

    def raw(x, *a):
        ys, hid = c_raw(x, *a[:n_c])
        return land(jnp.zeros((m,), dtype), ys, hid, *a[n_c:])

    c_args = c_args + margs

    split = isinstance(plan, SplitChipsPlan)
    meta = {"chunk": plan.rows_per_step, "heavy_rows": plan.NH,
            "windows": plan.num_windows, "split": split,
            "panel_merge": use_merge}
    if split:
        meta["loc_entries"] = plan.loc.n_entries if plan.loc else 0
        meta["far_entries"] = plan.far.n_entries if plan.far else 0
        meta["cold_entries"] = (plan.cold.n_entries if plan.cold
                                else 0)
        meta["hot_h"] = tuple(s.H_pad for s in plan.streams)
    else:
        meta["hot_h"] = plan.H
        meta["gather_groups"] = plan.n_groups
        meta["tile_rows"] = plan.E8
    return Prepared(
        "pallas-chips", A.name, bind(raw, c_args), on_device=True,
        nnz=A.nnz, raw=raw, args=c_args, hbm_bytes=hbm,
        # chunk is not a tuning axis here: report the fixed
        # rows_per_step so the runner's chunk sweep dedups to one row
        meta=meta)
