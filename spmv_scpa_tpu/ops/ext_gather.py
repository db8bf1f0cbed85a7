"""Exact-f32 Pallas gather pipeline for scattered out-of-window columns.

The reference handles scattered short-row matrices (amazon0302,
webbase-1M) with thread-per-row CSR/HLL kernels whose per-thread x
reads ride the GPU's global-load/texture path
(/root/reference/src/cuda_csr.cu:145-178, cuda_hll.cu:49-72). TPU has
no per-lane HBM gather: XLA lowers ``take`` to ~30 ns/element scalar
loops, and a measured 27k-entry tail costs ~0.55 ms — 5x the whole
lane-ELL core. This module replaces that tail with two tiny Pallas
stages that exploit the measured structure of the scattered regime
(amazon archetype: 165k out-of-window entries dedup 23x to 7.2k unique
columns = 28 KB):

* **stage 1 — sorted-window gather**: the globally sorted unique
  out-columns are packed into groups of <= 8*128 whose members share
  one R-panel ALIGNED x window (index_map blocks are R-granular).
  Each grid step DMAs one (R,128) x block and, per output sublane,
  runs ONE lane-wise ``take_along_axis`` + a panel-mask sublane
  reduction: out[c,j] = x[p[c,j], l[c,j]] with p/l host-precomputed.
  All moves are exact f32 (no MXU, no precision passes).
* **stage 2 — ranked gather**: the stage-1 output (the compact "hot
  region", <= a few hundred KB) is fully VMEM-resident; the same
  gather+mask-reduce builds ONE 128-lane "ext panel" per 128-row
  group holding exactly that group's unique out-of-window x values.

The ext panels stream into the lane-ELL core step-aligned, so an
out-of-window entry costs the same as a local one: a lane gather from
the group's own panel (ops/lane_ell.py). The near-scalar XLA tail
shrinks to per-group-capacity spill only.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_scpa_tpu.formats.panel_ell import BC

# stage-1 window reach, in 128-col panels (block-granular: windows are
# R-panel aligned). 512 panels = 65,536 cols = 256 KB f32 per step.
R_PANELS = 512
# stage-2 resident hot region cap (sublanes): 1024*128*4 = 512 KB.
H_MAX = 1024
# windowed stage-2: adopt when the p97 per-group window is at most
# half the hot region (below H_WIN_MIN the resident reduce is already
# cheap); hot cap for the windowed kernel (full hot lives in VMEM).
H_WIN_MIN = 64
H_WIN_CAP = 16384            # 8 MB f32


def _mask_gather(src, p_row, l_row):
    """out[j] = src[p_row[j], l_row[j]] for a (H, BC) f32 ``src``.

    One lane-wise dynamic_gather (operand/indices same 2D shape — the
    Mosaic constraint, CLAUDE.md) + a one-hot sublane reduction. Exact
    f32: exactly one mask row is nonzero per lane.
    """
    H = src.shape[0]
    lc = jnp.broadcast_to(l_row[None, :], (H, BC))
    g = jnp.take_along_axis(src, lc, axis=1)
    pi = jax.lax.broadcasted_iota(jnp.int32, (H, BC), 0)
    pc = jnp.broadcast_to(p_row[None, :], (H, BC))
    return jnp.sum(jnp.where(pi == pc, g, jnp.zeros_like(g)), axis=0)


def make_sorted_gather(n_groups: int, n1p_blocks: int, R: int,
                       dtype, interpret: bool):
    """Stage-1 pallas_call: (base, x1, p1, l1) -> hot (n_groups*8, BC).

    ``base`` (prefetched, int32 (n_groups,)) is the R-block index of
    each group's x window; ``p1``/``l1`` (n_groups*8, BC) are the
    window-relative panel / lane of each packed unique column.
    """

    def kernel(base_ref, x_ref, p_ref, l_ref, o_ref):
        xb = x_ref[...]
        o_ref[...] = jnp.stack(
            [_mask_gather(xb, p_ref[c, :], l_ref[c, :]) for c in range(8)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((R, BC), lambda i, base: (base[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BC), lambda i, base: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BC), lambda i, base: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, BC), lambda i, base: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups * 8, BC), dtype),
        cost_estimate=pl.CostEstimate(
            flops=n_groups * 8 * R * BC,
            bytes_accessed=n_groups * (R + 3 * 8) * BC * 4,
            transcendentals=0),
        interpret=interpret)


def make_ranked_gather(H: int, G_pad: int, dtype, interpret: bool,
                       EB: int = 8):
    """Stage-2 pallas_call: (hot, p2, l2) -> ext (G_pad, BC).

    ``hot`` (H, BC) stays VMEM-resident across the grid; each step
    emits EB group panels. p2/l2 (G_pad, BC) give each group-lane's
    hot-region sublane / lane.
    """

    assert G_pad % EB == 0, \
        f"ranked gather needs EB({EB})-aligned G_pad, got {G_pad} " \
        "(trailing output groups would be uninitialized VMEM)"

    def kernel(hot_ref, p_ref, l_ref, o_ref):
        hb = hot_ref[...]
        o_ref[...] = jnp.stack(
            [_mask_gather(hb, p_ref[c, :], l_ref[c, :])
             for c in range(EB)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G_pad // EB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # hot resident
            pl.BlockSpec((EB, BC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, BC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G_pad, BC), dtype),
        cost_estimate=pl.CostEstimate(
            flops=G_pad * H * BC,
            bytes_accessed=(H + 3 * G_pad) * BC * 4,
            transcendentals=0),
        interpret=interpret)


def make_resident_window_gather(n_out_groups: int, R_h: int,
                                H_pad: int, dtype, interpret: bool):
    """Windowed stage-2: (base8, hot, p, l) -> out (n_out_groups*8, BC)
    with out[r, j] = hot[base8[r]*8 + p[r%8,j], l[r%8,j]] — a PER-ROW
    window base (``base8`` has one entry per output row, 8-sublane
    units).

    ``hot`` (H_pad, BC) stays fully VMEM-resident; per output row an
    (R_h, BC) dynamic sublane slice (the proven lane_ell
    sliding-window pattern, ops/lane_ell.py) feeds the usual
    mask-gather — O(R_h) per output row instead of O(H), which unlocks
    hot regions far past the resident-reduction budget (webbase-class:
    4k+ sublanes of dedup'd near-diagonal columns, each chip row
    touching a ~30-sublane window because entries within a row are
    column-sorted and each chip row holds ONE row's entries).
    """

    def kernel(base_ref, hot_ref, p_ref, l_ref, o_ref):
        i = pl.program_id(0)
        outs = []
        for c in range(8):
            wb = hot_ref[pl.ds(base_ref[i * 8 + c] * 8, R_h), :]
            outs.append(_mask_gather(wb, p_ref[c, :], l_ref[c, :]))
        o_ref[...] = jnp.stack(outs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_out_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # hot resident
            pl.BlockSpec((8, BC), lambda i, base: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BC), lambda i, base: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, BC), lambda i, base: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_groups * 8, BC), dtype),
        cost_estimate=pl.CostEstimate(
            flops=n_out_groups * 8 * R_h * BC,
            bytes_accessed=(H_pad + n_out_groups * (3 * 8 + R_h))
            * BC * 4,
            transcendentals=0),
        interpret=interpret)


class ExtPlan:
    """Host-side plan: stage tables + per-entry ext lane assignment."""

    __slots__ = ("n_groups", "H", "R", "n1p_blocks", "base", "p1",
                 "l1", "pair_grp", "pair_lane", "pair_key", "pair_pos",
                 "ext_lane", "covered", "n_out",
                 "windowed", "r_hot", "base8", "H_pad")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def plan_ext(rows: np.ndarray, cols: np.ndarray, out_mask: np.ndarray,
             m: int, n: int, r_cap: int = R_PANELS,
             allow_windowed: bool = True) -> ExtPlan | None:
    """Plan the 2-stage gather for entries flagged in ``out_mask``.

    Per 128-row group, the group's unique out-columns (capped at 128,
    most-referenced kept) each get one lane of the group's ext panel.
    Returns None when there is nothing to plan or the resident hot
    region would exceed H_MAX sublanes. ``allow_windowed=False``
    restricts stage-2 to the plain resident reduce — the distributed
    builder requires it (the windowed kernel's per-shard ``r_hot``
    would be program structure, not data; parallel/distributed.py).
    """
    oi = np.flatnonzero(out_mask)
    if not oi.size:
        return None
    grp = rows[oi] // BC
    oc = cols[oi]
    key = grp * np.int64(n) + oc
    pk, cnt = np.unique(key, return_counts=True)    # sorted (grp, col)
    pg = (pk // n).astype(np.int64)
    pc = (pk % n).astype(np.int64)

    # per-group cap: keep the 128 most-referenced pairs
    order = np.lexsort((-cnt, pg))
    pgo = pg[order]
    newg = np.r_[True, pgo[1:] != pgo[:-1]]
    first = np.flatnonzero(newg)
    gid = np.cumsum(newg) - 1
    rank = np.arange(pgo.size) - first[gid]
    lane_of_pair = np.full(pk.size, -1, np.int64)
    kept = rank < BC
    lane_of_pair[order[kept]] = rank[kept]

    uniq = np.unique(pc[lane_of_pair >= 0])
    if not uniq.size:
        return None

    # stage-1 packing: groups of <= 8*BC uniques within one R-aligned
    # x region (index_map blocks are R-granular)
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
    H = cursor
    if H > H_WIN_CAP:
        return None
    n_panels = -(-n // BC)
    n1p_blocks = max(-(-n_panels // r_cap), int(max(base_l)) + 1)

    p1 = np.zeros((n_groups * 8, BC), np.int32)
    l1 = np.zeros((n_groups * 8, BC), np.int32)
    srow, slane = pos // BC, pos % BC
    gidx = srow // 8
    p1[srow, slane] = (uniq // BC
                       - np.asarray(base_l, np.int64)[gidx] * r_cap)
    l1[srow, slane] = uniq % BC

    # per-pair hot-region position (only kept pairs are looked up)
    kept_i = lane_of_pair >= 0
    pair_pos = np.full(pk.size, 0, np.int64)
    pair_pos[kept_i] = pos[np.searchsorted(uniq, pc[kept_i])]

    # ---- windowed stage-2 planning ----------------------------------
    # Hot positions follow the global sorted column order, so a row
    # group whose out-columns are themselves localized (webbase-class:
    # just past the loc_w window) touches a small contiguous band of
    # the hot region. A per-group window base turns the O(H) resident
    # mask-reduce into O(r_hot) (make_resident_window_gather) — and
    # lifts the resident cap H_MAX to H_WIN_CAP for such matrices.
    # Pairs past the p97-weighted reach are dropped back to the tail.
    windowed = False
    r_hot = 0
    base8 = np.zeros(0, np.int32)
    H_pad = H
    if allow_windowed and H > H_WIN_MIN and kept_i.any():
        kidx = np.flatnonzero(kept_i)
        kg = pg[kidx]
        kpos = pair_pos[kidx] // BC
        n_grp = int(kg.max()) + 1
        gmin = np.full(n_grp, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(gmin, kg, kpos)
        b8 = np.where(gmin == np.iinfo(np.int64).max, 0, gmin // 8)
        off = kpos - b8[kg] * 8
        w = cnt[kidx].astype(np.float64)   # entry-weighted reach
        o_ord = np.argsort(off, kind="stable")
        cw = np.cumsum(w[o_ord])
        tgt = int(off[o_ord[min(int(np.searchsorted(cw, 0.97 * cw[-1])),
                                off.size - 1)]]) + 1
        rh = 32
        while rh < tgt and rh < 512:
            rh *= 2
        if 2 * rh <= H:
            lane_of_pair[kidx[off >= rh]] = -1
            kept_i = lane_of_pair >= 0
            windowed = True
            r_hot = rh
            base8 = b8.astype(np.int32)
            H_pad = int(b8.max(initial=0)) * 8 + rh
    if not windowed and H > H_MAX:
        return None               # resident reduce past the VMEM cap

    # per-entry ext lane (-1 = dropped by the per-group cap)
    ent_pair = np.searchsorted(pk, key)
    ext_lane = np.full(rows.size, -1, np.int64)
    ext_lane[oi] = lane_of_pair[ent_pair]
    covered = float(np.mean(lane_of_pair[ent_pair] >= 0))

    return ExtPlan(n_groups=n_groups, H=H, R=r_cap,
                   n1p_blocks=n1p_blocks,
                   base=np.asarray(base_l, np.int32), p1=p1, l1=l1,
                   pair_grp=pg[kept_i], pair_lane=lane_of_pair[kept_i],
                   pair_key=pk, pair_pos=pair_pos[kept_i],
                   ext_lane=ext_lane, covered=covered, n_out=oi.size,
                   windowed=windowed, r_hot=r_hot, base8=base8,
                   H_pad=H_pad)


def build_group_tables(plan: ExtPlan, G_pad: int):
    """Stage-2 p2/l2 (G_pad, BC) from the plan's kept pairs.

    In windowed mode p2 is WINDOW-RELATIVE (psub - base8*8, always in
    [0, r_hot) for set lanes); unset lanes may go negative, which is
    harmless — a negative sublane never matches the one-hot iota, and
    unset panel lanes are never read by the core anyway.
    """
    p2 = np.zeros((G_pad, BC), np.int32)
    l2 = np.zeros((G_pad, BC), np.int32)
    p2[plan.pair_grp, plan.pair_lane] = plan.pair_pos // BC
    l2[plan.pair_grp, plan.pair_lane] = plan.pair_pos % BC
    if plan.windowed:
        p2 -= build_base8(plan, G_pad)[:, None].astype(np.int32) * 8
    return p2, l2


def build_base8(plan: ExtPlan, G_pad: int):
    """Per-group window bases padded to (G_pad,) (8-sublane units)."""
    b = np.zeros(G_pad, np.int32)
    b[:plan.base8.size] = plan.base8
    return b
