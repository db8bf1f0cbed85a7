"""PELL — panel-local ELLPACK: the TPU-native evolution of HLL.

The reference's HLL regularizes rows into 32-row ELLPACK blocks so SIMD
lanes never chase per-row pointers (``include/hll.h``); its fast GPU
variant keeps x cached in texture memory (cuda_csr.cu:145-178) and uses
the coalesced column-major layout (cuda_hll.cu:49-72). On TPU the
analogous constraints are:

* the VPU gather primitive (``tpu.dynamic_gather``) only gathers
  within a tile of the *same shape*, along lanes or sublanes — so
  column indices must be **panel-local** (< 128) to be gatherable;
* x lives in VMEM (the texture-memory analog), viewed as
  ``(ceil(n/128), 128)`` so a column panel is one aligned row.

Hence PELL: nonzeros are bucketed by (8-row block, 128-column panel)
and packed into ``(8, 128)`` slot tiles:

* ``vals[t]``  (8,128) f32 — values; padding slots are 0.0,
* ``lcol[t]``  (8,128) int32 — panel-local column (0..127); padding 0
  (always in-bounds — the reference's dummy-read trick,
  cuda_hll.cu:176-195, is free here),
* ``panel[t]`` int32 — which 128-wide x panel the tile reads.

**Slot quanta** (the HLL per-block-padding idea, hll.c:38-60, pushed
one level down): padding every (row, panel) bucket to 128 slots wastes
most of the tile when rows have ~10-30 nonzeros per panel. Instead the
128 lanes are cut into ``nq = 128 // quantum`` quanta, and each quantum
of a tile can serve a *different* 8-row block (same panel). A bucket
occupies ``ceil(max_row_nnz / quantum)`` consecutive quanta. Per-tile
metadata is then ``rowblk[t, s]`` — the 8-row block fed by quantum
``s`` — and the kernel reduces each quantum separately with one MXU
matmul against a (128, nq) segment matrix (ops/pallas_kernels.py).
``quantum=128`` degenerates to the plain one-bucket-per-tile layout.

Fill is ``nnz / (num_tiles * 1024)``; storage is 8 bytes/slot (4+4),
so PELL beats ideal CSR (~8 B/nnz) whenever fill > ~0.5 within its
quanta — which quantum=32 achieves on banded/FEM matrices (runs of
20-30 nonzeros per panel). Power-law matrices degrade to the XLA
segment-sum path (the runner picks per-matrix winners, like the
reference's strategy sweep).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from spmv_scpa_tpu.formats.csr import CSR

BR = 8      # rows per bucket (f32 sublane count)
BC = 128    # columns per panel (lane count)
DEFAULT_QUANTUM = 32


@dataclass
class PanelEll:
    name: str
    m: int
    n: int
    nnz: int
    quantum: int
    vals: np.ndarray     # (T, 8, 128) float64 host / cast on device
    lcol: np.ndarray     # (T, 8, 128) int32, values in [0, 128)
    panel: np.ndarray    # (T,) int32
    rowblk: np.ndarray   # (T, nq) int32; mb = dump block for padding

    @property
    def nq(self) -> int:
        return BC // self.quantum

    @property
    def num_tiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def num_row_blocks(self) -> int:
        return (self.m + BR - 1) // BR

    @property
    def num_panels(self) -> int:
        return (self.n + BC - 1) // BC

    @property
    def fill(self) -> float:
        return self.nnz / max(self.num_tiles * BR * BC, 1)

    @property
    def hbm_bytes(self) -> int:
        """Matrix bytes streamed per SpMV (f32 vals + i32 lcol)."""
        return self.num_tiles * BR * BC * 8

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.m, self.n), dtype=np.float64)
        q = self.quantum
        for t in range(self.num_tiles):
            c0 = int(self.panel[t]) * BC
            for lane in range(BC):
                rb = int(self.rowblk[t, lane // q])
                if rb >= self.num_row_blocks:
                    continue
                for i in range(min(BR, self.m - rb * BR)):
                    v = self.vals[t, i, lane]
                    if v != 0.0:
                        col = c0 + int(self.lcol[t, i, lane])
                        out[rb * BR + i, min(col, self.n - 1)] += v
        return out


def csr_to_pell(A: CSR, quantum: int = DEFAULT_QUANTUM) -> PanelEll:
    """Convert CSR → PELL (vectorized single pass).

    Spiritual port of ``csr_to_hll`` (hll.c:19-95): instead of padding
    each 32-row block to its max row length, each (8-row, 128-col
    panel) bucket is padded to a multiple of ``quantum`` slots; buckets
    sharing a panel pack into tiles quantum-by-quantum (straddling tile
    boundaries freely — metadata is per quantum, not per bucket).
    """
    if BC % quantum != 0:
        raise ValueError(f"quantum must divide {BC}")
    nq = BC // quantum
    mb = (A.m + BR - 1) // BR
    rows = A.row_ids().astype(np.int64)
    cols = A.ja.astype(np.int64)
    nnz = rows.shape[0]
    if nnz == 0:
        return PanelEll(A.name, A.m, A.n, 0, quantum,
                        np.zeros((1, BR, BC)),
                        np.zeros((1, BR, BC), np.int32),
                        np.zeros(1, np.int32),
                        np.full((1, nq), mb, np.int32))

    pn = cols // BC
    rb = rows // BR
    npan = (A.n + BC - 1) // BC

    # --- per-(row, panel) run slots (CSR order => runs contiguous) ---
    idx = np.arange(nnz, dtype=np.int64)
    run_start = np.ones(nnz, dtype=bool)
    run_start[1:] = (rows[1:] != rows[:-1]) | (pn[1:] != pn[:-1])
    s = idx - np.maximum.accumulate(np.where(run_start, idx, -1))

    # --- buckets: (rowblock, panel) ---
    bkey = rb * npan + pn
    b_uniq, bucket_of = np.unique(bkey, return_inverse=True)
    nb = b_uniq.shape[0]
    b_rb = (b_uniq // npan).astype(np.int64)
    b_pn = (b_uniq % npan).astype(np.int64)
    b_maxc = np.zeros(nb, dtype=np.int64)
    np.maximum.at(b_maxc, bucket_of, s + 1)
    b_quanta = -(-b_maxc // quantum)

    # --- pack buckets panel-by-panel (order: panel, then rowblock) ---
    order = np.lexsort((b_rb, b_pn))
    q_end = np.cumsum(b_quanta[order])
    # panel boundaries in the ordered bucket list
    pn_sorted = b_pn[order]
    panel_change = np.ones(nb, dtype=bool)
    panel_change[1:] = pn_sorted[1:] != pn_sorted[:-1]
    panel_start_qend = np.where(panel_change, q_end - b_quanta[order], 0)
    panel_base = np.maximum.accumulate(
        np.where(panel_change, panel_start_qend, -1))
    g0_sorted = (q_end - b_quanta[order]) - panel_base   # within-panel

    # per-panel totals → tiles per panel → global tile bases
    pan_ids = pn_sorted[panel_change]
    pan_total = np.diff(np.concatenate(
        [q_end[panel_change] - b_quanta[order][panel_change],
         [q_end[-1]]]))
    pan_tiles = -(-pan_total // nq)
    tile_base = np.zeros(pan_ids.shape[0], dtype=np.int64)
    np.cumsum(pan_tiles[:-1], out=tile_base[1:])
    T = int(pan_tiles.sum())

    # map arrays back to original bucket indexing
    g0 = np.empty(nb, dtype=np.int64)
    g0[order] = g0_sorted
    pan_slot = np.searchsorted(pan_ids, b_pn)       # panel → dense id
    b_tile_base = tile_base[pan_slot]

    # --- per-nonzero placement ---
    G = g0[bucket_of] + s // quantum                # within-panel quantum
    tile = b_tile_base[bucket_of] + G // nq
    lane = (G % nq) * quantum + s % quantum
    ri = rows % BR

    out_vals = np.zeros((T, BR, BC), dtype=np.float64)
    out_lcol = np.zeros((T, BR, BC), dtype=np.int32)
    out_vals[tile, ri, lane] = A.as_
    out_lcol[tile, ri, lane] = (cols % BC).astype(np.int32)

    # --- per-quantum rowblk metadata ---
    rowblk = np.full((T, nq), mb, dtype=np.int32)
    reps = b_quanta                                  # quanta per bucket
    bq_bucket = np.repeat(np.arange(nb), reps)
    intra = np.arange(reps.sum()) - np.repeat(
        np.cumsum(reps) - reps, reps)
    Gq = g0[bq_bucket] + intra
    tq = b_tile_base[bq_bucket] + Gq // nq
    rowblk[tq, Gq % nq] = b_rb[bq_bucket]

    # --- per-tile panel ---
    panel = np.repeat(pan_ids, pan_tiles).astype(np.int32)

    return PanelEll(A.name, A.m, A.n, nnz, quantum,
                    vals=out_vals, lcol=out_lcol,
                    panel=panel, rowblk=rowblk)
