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
three EXISTING kernels — no new Pallas code:

1. **stage-1 sorted gather** (ext_gather.make_sorted_gather): the
   tail's globally-sorted unique columns, packed <= 1024 per R-aligned
   x window, become a compact VMEM "hot region" (H, 128). Unique-col
   spacing makes the windows tiny even when raw entries scatter.
2. **stage-2 ranked gather** (ext_gather.make_ranked_gather): every
   tail ENTRY reads its x value from the resident hot region —
   out xg[e] = hot[pos[col[e]]] in the chip layout below.
3. **windowed one-hot MXU segment-sum** (segsum_kernel
   .make_window_segsum): heavy rows are sorted by length and grouped
   8 to a *block*; chip quantum (tile t, lane q) holds the rank-k
   entries of block b(t,q)'s 8 rows in its 8 sublanes — exactly the
   (total_tile_rows, nq) partial layout the segsum kernel consumes.
   prod = vals * xg elementwise IS the partial array; the kernel's
   bf16x3 one-hot dot reduces it to per-row sums with zero scatter.

A final ``y.at[heavy_ids].add`` (unique indices, one per heavy ROW —
hundreds, not thousands of entries) is the only scalar-ish step left.

Length-sorting the heavy rows keeps block fill near 1 (a block's
quanta count is its max row length); the per-entry tables are host
NumPy; device arrays travel as jit arguments per repo convention.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from spmv_scpa_tpu.formats.panel_ell import BC
from spmv_scpa_tpu.ops import ext_gather
from spmv_scpa_tpu.ops.segsum_kernel import make_window_segsum

# stage-2 resident hot cap, in 8-row sublane units (= ext_gather.H_MAX:
# 1024 sublanes * 128 lanes * 4 B = 512 KB of VMEM).
H_CAP = ext_gather.H_MAX
# stage-2 VPU budget: each output sublane-row costs H*BC*3 ops; keep
# the whole gather under ~2e8 ops (~0.1 ms at a conservative 2 Tops).
VPU_BUDGET = 2e8
# stage-1 window reach (panels); tail uniques are dense after dedup so
# modest windows suffice, but wide spacing still plans (more groups).
R_PANELS = 512


class ChipsPlan:
    __slots__ = ("n_e", "H", "n_groups", "R", "n1p_blocks", "base",
                 "p1", "l1", "E8", "p2", "l2", "vals", "rbl",
                 "win_of_step", "num_windows", "h", "rows_per_step",
                 "heavy_ids", "NH")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def plan_chips(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
               m: int, n: int, h: int = 256,
               rows_per_step: int = 8) -> ChipsPlan | None:
    """Plan the chips tail for ``(rows, cols, vals)`` entries (CSR
    order). Returns None when the tail is out of the resident-hot /
    VPU budgets (caller falls back to the XLA compact tail)."""
    n_e = int(rows.size)
    if n_e == 0:
        return None

    # ---- stage-1: dedup columns, pack sorted uniques into R-aligned
    # window groups (same packing as ext_gather.plan_ext but global —
    # no per-group cap: every entry is covered by construction).
    uniq, inv = np.unique(cols, return_inverse=True)
    if -(-uniq.size // BC) > H_CAP:
        return None
    region = uniq // (R_PANELS * BC)
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
    Hs = cursor                       # hot sublanes incl. group pad
    if Hs > H_CAP:
        return None
    n_panels = -(-n // BC)
    n1p_blocks = max(-(-n_panels // R_PANELS), int(max(base_l)) + 1)
    p1 = np.zeros((n_groups * 8, BC), np.int32)
    l1 = np.zeros((n_groups * 8, BC), np.int32)
    srow, slane = pos // BC, pos % BC
    p1[srow, slane] = (uniq // BC
                       - np.asarray(base_l, np.int64)[srow // 8]
                       * R_PANELS)
    l1[srow, slane] = uniq % BC

    # ---- chip layout: heavy rows length-sorted, 8 to a block;
    # quantum (tile t, lane q) = one block x one rank; sublane = row
    # position within the block. Entry (r, k) -> table position
    # (tile, sublane, lane).
    hr_ids, first, counts = np.unique(rows, return_index=True,
                                      return_counts=True)
    NH = int(hr_ids.size)
    order = np.argsort(-counts, kind="stable")   # longest first
    hr_sorted = hr_ids[order]
    hpos_of_row = np.empty(NH, np.int64)         # row -> heavy index
    hpos_of_row[order] = np.arange(NH)
    # per-entry: heavy index + rank within row (entries row-grouped)
    e_hpos = hpos_of_row[np.searchsorted(hr_ids, rows)]
    rank = np.arange(n_e) - first[np.searchsorted(hr_ids, rows)]
    blk = e_hpos // 8                            # heavy block
    sub = e_hpos % 8                             # sublane in block
    # quanta: per (block, rank); block quanta are contiguous, blocks
    # in index order (descending length => block 0 widest).
    cnt_sorted = counts[order]
    blk_w = np.zeros(-(-NH // 8), np.int64)      # quanta per block
    np.maximum.at(blk_w, np.arange(NH) // 8, cnt_sorted)
    blk_q0 = np.concatenate([[0], np.cumsum(blk_w)])
    q_of_e = blk_q0[blk] + rank                  # global quantum id
    n_q = int(blk_q0[-1])

    # segsum stream: quanta windows of h blocks; each step's quanta
    # must share a window -> pad each window's quanta count to a
    # rows_per_step-tile multiple. nq = BC quanta per tile row.
    q_blk = np.repeat(np.arange(blk_w.size), blk_w)
    q_win = q_blk // h
    num_windows = int(q_win.max()) + 1 if n_q else 1
    # pad per window to full tiles (rows_per_step sublanes x BC lanes
    # = rows_per_step//8 * BC quanta per step)
    qps = (rows_per_step // 8) * BC
    new_q = np.full(n_q, -1, np.int64)
    win_of_step_l: list[int] = []
    cur = 0
    for w in range(num_windows):
        qi = np.flatnonzero(q_win == w)
        new_q[qi] = cur + np.arange(qi.size)
        n_steps_w = -(-qi.size // qps)
        win_of_step_l.append(w)
        win_of_step_l.extend([w] * (n_steps_w - 1))
        cur += n_steps_w * qps
    n_q_pad = cur
    q_of_e = new_q[q_of_e]
    steps = n_q_pad // qps
    win_of_step = np.asarray(win_of_step_l, np.int64)

    E8 = steps * rows_per_step                   # total tile rows
    if (E8 // 8) * 8 * Hs * BC * 3 > VPU_BUDGET:
        return None

    # per-entry tables in the (tile, sublane, lane) layout
    tile = q_of_e // BC
    lane = q_of_e % BC
    erow = tile * 8 + sub
    vals_a = np.zeros((E8, BC), np.float32)
    p2 = np.zeros((E8, BC), np.int32)
    l2 = np.zeros((E8, BC), np.int32)
    vals_a[erow, lane] = vals
    hotpos = pos[inv]                            # per-entry hot slot
    p2[erow, lane] = (hotpos // BC).astype(np.int32)
    l2[erow, lane] = (hotpos % BC).astype(np.int32)

    # rbl: window-local block id per quantum, (E8//8 * BC,) in
    # (tile, lane) order; padding quanta -> h (matches no one-hot row)
    rbl = np.full(n_q_pad, h, np.int32)
    rbl[new_q] = (q_blk - q_win * h).astype(np.int32)

    return ChipsPlan(
        n_e=n_e, H=Hs, n_groups=n_groups, R=R_PANELS,
        n1p_blocks=n1p_blocks, base=np.asarray(base_l, np.int32),
        p1=p1, l1=l1, E8=E8, p2=p2, l2=l2, vals=vals_a, rbl=rbl,
        win_of_step=win_of_step, num_windows=num_windows, h=h,
        rows_per_step=rows_per_step, heavy_ids=hr_sorted, NH=NH)


def prepare_chips(plan: ChipsPlan, n: int, dtype, interpret: bool):
    """Build ``raw(x, *args) -> y_add`` (length-m add-contribution is
    done by the caller via heavy_ids scatter) + device args."""
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


def prepare_chips_strategy(A, dtype=jnp.float32,
                           interpret: bool | None = None,
                           Prepared=None, **_):
    """Standalone ``pallas-chips`` strategy: the whole matrix as
    chips — a pure CSR-vector SpMV (every row cooperatively reduced,
    the CUDA k3 shape) with zero format assumptions. Wins when rows
    are long/imbalanced and the dedup'd column set fits the resident
    hot region; refuses (ValueError) otherwise so sweeps skip it."""
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

    def raw(x, *a):
        ys, hid = c_raw(x, *a)
        return jnp.zeros((m,), dtype).at[hid].set(
            ys.astype(dtype), mode="promise_in_bounds",
            unique_indices=True)

    return Prepared(
        "pallas-chips", A.name, bind(raw, c_args), on_device=True,
        nnz=A.nnz, raw=raw, args=c_args, hbm_bytes=hbm,
        # chunk is not a tuning axis here: report the fixed
        # rows_per_step so the runner's chunk sweep dedups to one row
        meta={"chunk": plan.rows_per_step,
              "heavy_rows": plan.NH, "hot_h": plan.H,
              "gather_groups": plan.n_groups, "tile_rows": plan.E8,
              "windows": plan.num_windows})
