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
* ``panel[t]`` int32 — which 128-wide x panel the tile reads,
* ``rowblk[t]`` int32 — which 8-row y block the tile feeds.

Row ``i`` of a tile holds the nonzeros of matrix row
``rowblk*8 + i`` that fall in the panel, in column order, in slots
``0..c-1``; a (row, panel) pair with more than 128 nonzeros spills into
additional tiles of the same bucket. Fill is
``nnz / (num_tiles * 1024)``; storage is 8 bytes/slot (4+4), so PELL
beats ideal CSR (8 B/nnz) whenever fill > ~0.5 *per panel*, which holds
for banded/FEM matrices, and degrades gracefully to the BCSR/XLA paths
otherwise (the runner picks per-matrix winners, like the reference's
strategy sweep).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from spmv_scpa_tpu.formats.csr import CSR

BR = 8      # rows per tile (f32 sublane count)
BC = 128    # columns per panel (lane count)


@dataclass
class PanelEll:
    name: str
    m: int
    n: int
    nnz: int
    vals: np.ndarray     # (T, 8, 128) float64 host / cast on device
    lcol: np.ndarray     # (T, 8, 128) int32, values in [0, 128)
    panel: np.ndarray    # (T,) int32
    rowblk: np.ndarray   # (T,) int32, non-decreasing

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
        for t in range(self.num_tiles):
            r0 = int(self.rowblk[t]) * BR
            c0 = int(self.panel[t]) * BC
            for i in range(min(BR, self.m - r0)):
                cols = c0 + self.lcol[t, i]
                np.add.at(out[r0 + i], np.minimum(cols, self.n - 1),
                          self.vals[t, i])
        return out


def csr_to_pell(A: CSR) -> PanelEll:
    """Convert CSR → PELL (vectorized single pass).

    Spiritual port of ``csr_to_hll`` (hll.c:19-95): instead of padding
    each 32-row block to its max row length, we pad each
    (8-row x 128-col panel) bucket to 128 slots per row, spilling long
    (row, panel) runs into extra tiles.
    """
    rows = A.row_ids().astype(np.int64)
    cols = A.ja.astype(np.int64)
    vals = A.as_
    nnz = rows.shape[0]
    if nnz == 0:
        return PanelEll(A.name, A.m, A.n, 0,
                        np.zeros((1, BR, BC)), np.zeros((1, BR, BC), np.int32),
                        np.zeros(1, np.int32), np.zeros(1, np.int32))

    pn = cols // BC
    # CSR order is (row, col) ascending => (row, pn) runs are contiguous.
    # Slot index within each (row, panel) run:
    run_start = np.ones(nnz, dtype=bool)
    run_start[1:] = (rows[1:] != rows[:-1]) | (pn[1:] != pn[:-1])
    idx = np.arange(nnz, dtype=np.int64)
    slot = idx - np.maximum.accumulate(np.where(run_start, idx, -1))
    sub = slot // BC                       # spill tile within the bucket
    slot_in = slot % BC

    rb = rows // BR
    # Tile key: (rowblk, panel, spill) — unique returns sorted keys, so
    # tiles come out ordered by row block then panel (the streaming
    # order the kernel and the segment-sum epilogue rely on).
    nspill = int(sub.max()) + 1
    npan = (A.n + BC - 1) // BC
    key = (rb * npan + pn) * nspill + sub
    uniq, tile_of = np.unique(key, return_inverse=True)
    T = uniq.shape[0]

    out_vals = np.zeros((T, BR, BC), dtype=np.float64)
    out_lcol = np.zeros((T, BR, BC), dtype=np.int32)
    ri = (rows % BR).astype(np.int64)
    out_vals[tile_of, ri, slot_in] = vals
    out_lcol[tile_of, ri, slot_in] = (cols % BC).astype(np.int32)

    tile_rbpn = uniq // nspill
    return PanelEll(A.name, A.m, A.n, nnz,
                    vals=out_vals, lcol=out_lcol,
                    panel=(tile_rbpn % npan).astype(np.int32),
                    rowblk=(tile_rbpn // npan).astype(np.int32))
