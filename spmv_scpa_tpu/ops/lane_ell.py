"""Lane-ELL hybrid — rows-as-lanes SpMV with local-window / hub split.

This is the faithful TPU analog of the reference's WINNING CUDA HLL
kernel, k1 thread-per-row over the col-major (coalesced) layout
(cuda_hll.cu:49-72): consecutive GPU threads read consecutive rows'
k-th slot. Here consecutive *lanes* are consecutive rows and the k-th
slots form a *slot plane* — a (chunk, 128) block per plane — so the
slot reduction is a plain sequence of f32 fused multiply-adds across
planes. Compared with the PELL/fused one-hot path
(ops/pallas_kernels.py) this eliminates, by construction:

* the MAC segment dot and its bf16 precision passes (sums are exact
  f32 adds — measured flagship ablation: MXU dots = 0.22 ms of
  0.55 ms),
* the (chunk,8,nq)->(g,8) partial transpose (0.12 ms — rows already
  live in lanes, never in sublanes),
* the windowed one-hot epilogue, output revisits and W-span machinery
  (y rows are a LINEAR function of the grid step: direct writes).

What remains is the x gather, organized around two observations:

* **local window**: with rows in original order, row-group ``g``
  (128 rows) reads x panels ``[g, g+S)`` of a ``loc_w``-padded x — a
  linear window, so one contiguous VMEM slice per STEP feeds every
  group via static sliding sub-slices (``xw[w:w+chunk]``). This is
  the VMEM-resident analog of the reference's texture-cached x
  (cuda_csr.cu:145-178).
* **per-plane strip sets**: entries are packed in column order, so
  the q-th entries of neighboring rows sit at nearly the same column
  offset (FEM/banded matrices: patterns repeat down the band —
  SURVEY §6). Each plane therefore touches only 1-3 of the S window
  strips; the kernel is SPECIALIZED per plane to its measured strip
  set (host-computed), skipping the select entirely for single-strip
  planes. Mosaic's dynamic_gather reach is exactly 128 lanes
  (probed), hence the per-strip gather+select.
* **strip demotion + relocation**: the multi-strip select chain
  measured 31% of flagship runtime, so each primary plane keeps only
  its dominant strips (cumulative coverage >= ``strip_cov``). A
  demoted entry RELOCATES to another plane that kept its strip —
  plane assignment is free bin-packing (the kernel only needs the
  entry's plane to list its strip and the (row, plane) slot to be
  unique); leftovers land in a few catch-all overflow planes.
* **hub split** (SURVEY §7 hard part 3): out-of-window entries
  mostly target a few Zipf-hot columns; the top ``hot_k`` become
  extra strips of an ``x_hot`` region gathered once per call and
  appended to the resident x — step-invariant broadcasts.
* **CSR tail**: per-row overflow (> Q slots) and cold scatter
  entries. Tiny tails CANNOT ride a device strategy (every kernel's
  grid scales with m — a 2.4k-nnz PELL tail on the 377k-row flagship
  measured 1.75 ms): they run a compact-row XLA segment-sum +
  unique-index scatter-add, O(tail_nnz) scalar-ish work. Big tails
  (> ``tail_xla_max``) amortize the auto-tuned PELL path; partial
  y's sum on device.

Auto heuristics measure the entry statistics: ``loc_w`` (smallest
window within 2% of max local coverage), ``hot_k`` (90% of the
out-of-window coverage achievable at 2048), ``Q`` (bytes-cost model:
each plane streams G*128*6 B vs ~2 kB/nnz effective tail cost).

Flagship measured history (real v5e, 22.6M-nnz ML_Laplace stand-in):
mixed planes 0.391 ms -> chunk=24 0.351 ms -> "nosel" diag probe
0.243 ms = the 747 GB/s stream roofline -> demotion+relocation
closes most of that gap (see docs/PERF_LOG.md round 3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_scpa_tpu.formats.csr import CSR
from spmv_scpa_tpu.formats.panel_ell import BC, BR

X_VMEM_BUDGET = 10 << 20     # same budget as the fused PELL kernel
# bytes-equivalent cost of one extra per-plane strip pass
# (gather+cmp+select over the (chunk, BC) block each step),
# calibrated from the flagship's measured 31% select share at ~1
# extra pass/plane: 88 planes * 6 B * 0.31 / ~80 passes ~= 2 B
SEL_B = 2.0
# Tail size (entries) past which the tail routes to the compacted-row
# PELL delegation (split-mode chips' one-hot gathers measured 1.67 ms
# on the webbase archetype's 851k-entry tail; the same shape as a
# compacted PELL problem runs at powerlaw's ~0.16 ns/entry).
BIG_TAIL = 131072


def pow2_bound(v, min_exp: int = -60):
    """EXACT f32 power-of-two bound for ``v`` (v > 0), by exponent-bit
    surgery: 2^(floor(log2 v) + 2) — strictly above v with one guard
    bit (in (v, 4v]) — clamped below at 2^min_exp.

    ``jnp.exp2`` must NOT be used for this: XLA CPU lowers it to a
    polynomial approximation — measured exp2(33.0) = 8589939712 !=
    2^33 = 8589934592 — and a non-power-of-two scale silently breaks
    every "exact by power-of-two grid" step of the df64 digit-plane
    kernels (this was found as a ~2^-25 rel error on wide-exponent
    matrices). Reading the exponent field from the float's bits is
    exact by construction.
    """
    import jax.numpy as jnp
    eb = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(
            jnp.asarray(v, jnp.float32), jnp.int32), 23) & 0xff
    # +2: strictly above v plus one guard bit (the f32 head of a can
    # overshoot amax by 2^-24 rel), mirroring the ceil(log2)+1 rule
    e2 = jnp.maximum(eb - 127 + 2, min_exp)
    return jax.lax.bitcast_convert_type(
        jax.lax.shift_left(e2 + 127, 23), jnp.float32)

_LOC_CHOICES = (128, 256, 512, 1024, 2048, 4096)
_HOT_CHOICES = (128, 256, 512, 1024, 2048, 4096, 8192)
# slot-count candidates for the byte-cost model: fine (8-step) past 8
# so near-uniform row lengths land exactly (the stencil flagship has
# 72-nnz rows; a 64->80->96 grid forced Q=80 = 8 always-empty planes
# streamed per step — ~8% of the core's HBM bytes for nothing)
_Q_CHOICES = (1, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64, 72, 80, 88,
              96, 104, 112, 120, 128)


def _auto_interpret() -> bool:
    from spmv_scpa_tpu.utils.platform import is_tpu
    return not is_tpu()


class _CoreBuild:
    """Host-side packing result (``core_only=True``): everything the
    distributed builder needs to pad/stack shards into one SPMD
    program (parallel/distributed.py:prepare_row_sharded_hybrid)."""

    __slots__ = ("vals_a", "idx_a", "used", "Q", "Qo", "QT", "S",
                 "chunk", "steps", "G_pad", "P_pad", "loc_w",
                 "n_local", "m", "trows", "tcols", "tvals",
                 "n_demoted", "n_reloc",
                 # per-shard ext-gather tables (ext_ng=0: no ext);
                 # non-windowed stage-2 only (see core_only gate)
                 "ext_ng", "ext_n1p", "ext_base", "ext_p1", "ext_l1",
                 "ext_p2", "ext_l2", "ext_cov", "ext_n_out")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def idx8_partition(sets: list, chunk: int):
    """Plane partition for the int8 idx stream (shared by the
    single-chip packer and the distributed builder — one encoding
    rule, one alignment constraint).

    Orders planes so <=2-strip ones lead. ``n8`` is rounded down so
    the int8 block height (n8*chunk) is 32-aligned (Mosaic int8
    sublane tiling — same guard as the PELL lcol planes,
    ops/pallas_kernels.py:341-346). ``second`` maps each int8 plane to
    its set's second strip (-1 when single-strip) for the positional
    bit-7 encoding. Returns (order, reordered_sets, n8, second).
    """
    import math
    QT = len(sets)

    def _i8ok(s):
        # dynamic slots (negative members) use nw+j codes that don't
        # fit the 1-bit positional encoding — int16 always
        return len(s) <= 2 and all(w >= 0 for w in s)

    order = sorted(range(QT), key=lambda q: not _i8ok(sets[q]))
    sets2 = [sets[q] for q in order]
    n8 = sum(_i8ok(s) for s in sets2)
    step8 = 32 // math.gcd(chunk, 32)
    n8 = (n8 // step8) * step8
    second = np.array([s[1] if len(s) == 2 else -1
                       for s in sets2[:n8]], np.int64)
    return order, sets2, n8, second


def idx8_encode(enc: np.ndarray, second_b: np.ndarray) -> np.ndarray:
    """Absolute (strip<<7 | lane) int codes -> positional int8 codes:
    bit 7 = (strip == the plane's second strip), bits 0-6 = lane.
    ``second_b`` must broadcast against ``enc``."""
    enc = enc.astype(np.int64)
    pos = (enc >> 7) == second_b
    return (np.where(pos, 128 + (enc & 127), enc & 127)
            .astype(np.uint8).view(np.int8))


def _lane_ell_kernel(chunk: int, Q: int, S: int, hp0: int,
                     used: tuple, diag: str = "", ext_w: int = -1,
                     n8: int = 0, nw: int = 0,
                     dyn_off: dict | None = None, TD: int = 0):
    """One grid step = ``chunk`` row-groups of 128 rows.

    ``vals``/``idx`` blocks are plane-major: rows ``q*chunk + c``.
    ``idx`` packs (strip << 7) | lane; strips ``< S`` index the
    step's sliding local window, strip ``ext_w`` the step-aligned
    per-group ext panels (ops/ext_gather.py), other strips ``>= S``
    the resident hot panels at ``hp0``. ``used[q]`` is the plane's
    static strip set. y rows are direct: out block = (chunk, 128) at
    step index.

    ``n8 > 0`` splits the idx stream by byte width: planes ``< n8``
    (whose strip set has <= 2 members) ride an int8 plane — bit 7 is
    the POSITION of the strip within ``used[q]``, bits 0-6 the lane —
    cutting those planes' slot bytes 6 -> 5 (the idx stream is pure
    HBM traffic; the flagship's planes are 84% <= 2 strips). Planes
    ``>= n8`` keep the absolute int16 encoding.
    """
    has_ext = ext_w >= 0

    def kernel(*krefs):
        if TD:
            dynw_ref, x_ref, vals_ref, *refs = krefs
        else:
            x_ref, vals_ref, *refs = krefs
            dynw_ref = None
        if n8 > 0 and n8 < Q:
            idx8_ref, idx16_ref, *refs = refs
        elif n8 > 0:
            idx8_ref, *refs = refs
            idx16_ref = None
        else:
            idx16_ref, *refs = refs
            idx8_ref = None
        if has_ext:
            ext_ref, o_ref, xw_ref = refs
        else:
            o_ref, xw_ref = refs
        i = pl.program_id(0)
        xw_ref[:, :] = x_ref[pl.ds(i * chunk, chunk + S), :]
        acc = None
        for q in range(Q):
            vq = vals_ref[q * chunk:(q + 1) * chunk, :]
            if q < n8:
                iq = idx8_ref[q * chunk:(q + 1) * chunk, :] \
                    .astype(jnp.int32) & 255          # undo sign ext
            else:
                q16 = q - n8
                iq = idx16_ref[q16 * chunk:(q16 + 1) * chunk, :] \
                    .astype(jnp.int32)
            lq = jax.lax.bitwise_and(iq, 127)
            xv = None
            for k, w in enumerate(used[q]):
                if w < 0:        # per-step DYNAMIC slot: strip id is
                    #              scalar-prefetched SMEM data
                    j = -w - 1
                    wd = dynw_ref[i * TD + dyn_off[q] + j]
                    xs = xw_ref[pl.ds(wd, chunk), :]
                elif w < S:      # sliding local strip
                    xs = xw_ref[w:w + chunk, :]
                elif has_ext and w == ext_w:
                    # per-group ext panel: group-aligned block rows
                    xs = ext_ref[:, :]
                else:            # hot panel: step-invariant broadcast
                    xs = jnp.broadcast_to(
                        x_ref[hp0 + (w - S), :][None, :], (chunk, BC))
                gw = xs if "nogather" in diag \
                    else jnp.take_along_axis(xs, lq, axis=1)
                # strip code: positional bit for int8 planes, absolute
                # window id for int16 planes, nw+j for dynamic slots
                code = (k if q < n8
                        else (nw - w - 1) if w < 0 else w)
                if xv is None:
                    xv = gw
                elif len(used[q]) > 1 and "nosel" not in diag:
                    xv = jnp.where(
                        jax.lax.shift_right_logical(iq, 7) == code,
                        gw, xv)
            if xv is None:       # plane entirely padding
                continue
            t = vq * xv
            acc = t if acc is None else acc + t
        o_ref[:, :] = acc if acc is not None \
            else jnp.zeros((chunk, BC), o_ref.dtype)

    return kernel


DF64_LANE_PLANES = 8     # 7-bit digit planes: 56 bits below the scale


def _lane_ell_kernel_df64(chunk: int, Q: int, S: int, used: tuple,
                          planes: int = DF64_LANE_PLANES):
    """fp64-grade lane-ELL core: exact digit-plane accumulation on the
    rows-as-lanes reduction (the reference computes natively in fp64,
    /root/reference/include/csr.h:12; TPUs have no fp64).

    Why not compensated (TwoSum) pairs: XLA duplicates cheap multiplies
    across fusions and CONTRACTS them into FMAs at the consuming add —
    measured here: ``t = s + ah*xvh`` compiled as fma broke the TwoSum
    invariant by a half-ulp of t (adding a debug store of the product
    flipped the compilation and fixed the result). Error-free
    transforms that depend on the rounding of a mul-feeding-add are
    not compiler-stable. The digit-plane scheme (same design as the
    MXU one, ops/pallas_kernels.py:_fused_kernel_df64) is immune: every
    operation is either exact by value range (integer digits < 2^24 in
    f32; digit-residual subtractions on a power-of-two grid) or
    second-order (Dekker ``err`` terms — contraction only re-rounds
    quantities that are already O(2^-48) relative).

    Per slot plane: gather the x (hi, lo) pair from the sliding
    window, Dekker-split the product into (ph, plo) exactly, slice ph
    into ``planes`` signed 7-bit digits on the runtime power-of-two
    scale E (SMEM), and add each digit into its own per-lane integer
    accumulator — plain f32 adds of integers, exact for any Q <= 128
    (|digit sum| <= 129*Q < 2^24). ``plo`` joins the residual chain at
    k==2 where the grid has reached its magnitude. Outputs: ``planes``
    digit accumulators scaled by E*2^-7(k+1) on device (exact:
    integer x power of two); the host recombines in real float64
    (Prepared.post). Padding slots (vh=vl=0, idx=0) contribute 0.
    """

    def kernel(sc_ref, xh_ref, xl_ref, vh_ref, vl_ref, idx_ref,
               o_ref, wh_ref, wl_ref):
        i = pl.program_id(0)
        wh_ref[:, :] = xh_ref[pl.ds(i * chunk, chunk + S), :]
        wl_ref[:, :] = xl_ref[pl.ds(i * chunk, chunk + S), :]
        E = sc_ref[0, 0]
        invE = jnp.float32(1.0) / E
        acc = [jnp.zeros((chunk, BC), jnp.float32)
               for _ in range(planes)]
        for q in range(Q):
            if not used[q]:          # plane entirely padding
                continue
            sl_q = slice(q * chunk, (q + 1) * chunk)
            vh = vh_ref[sl_q, :]
            vl = vl_ref[sl_q, :]
            iq = idx_ref[sl_q, :].astype(jnp.int32)
            lq = jax.lax.bitwise_and(iq, 127)
            xvh = xvl = None
            for w in used[q]:
                gh = jnp.take_along_axis(wh_ref[w:w + chunk, :], lq,
                                         axis=1)
                gl = jnp.take_along_axis(wl_ref[w:w + chunk, :], lq,
                                         axis=1)
                if xvh is None:
                    xvh, xvl = gh, gl
                else:
                    sel = jax.lax.shift_right_logical(iq, 7) == w
                    xvh = jnp.where(sel, gh, xvh)
                    xvl = jnp.where(sel, gl, xvl)
            # Dekker product: vh*xvh = ph + err exactly (12-bit splits)
            ph = vh * xvh
            t = jnp.float32(4097.0) * vh
            v1 = t - (t - vh)
            v2 = vh - v1
            t = jnp.float32(4097.0) * xvh
            u1 = t - (t - xvh)
            u2 = xvh - u1
            err = ((v1 * u1 - ph) + v1 * u2 + v2 * u1) + v2 * u2
            plo = err + vh * xvl + vl * xvh
            r = ph
            for k in range(planes):
                d = jnp.round(r * (invE * jnp.float32(2.0 ** (7 * (k + 1)))))
                r = r - d * (E * jnp.float32(2.0 ** (-7 * (k + 1))))
                if k == 2:           # grid reached the low word
                    r = r + plo
                acc[k] = acc[k] + d
        for k in range(planes):
            o_ref[k * chunk:(k + 1) * chunk, :] = \
                acc[k] * (E * jnp.float32(2.0 ** (-7 * (k + 1))))

    return kernel


def prepare_lane_ell_df64(A: CSR, chunk: int | None = None,
                          loc_w: int | str = "auto",
                          interpret: bool | None = None,
                          Prepared=None, **_):
    """fp64-grade lane-ELL strategy (``pallas-hybrid-df64``).

    Scope: the pure lane-ELL regime — every entry must sit inside the
    diagonal window and every row must fit in <= 128 slot planes (no
    demotion, no hot/ext region, no tail: each would need its own
    exact landing to preserve the error budget; 128 also keeps digit
    sums < 2^24). The flagship class (banded/FEM, <= ~128 nnz/row)
    qualifies; scattered matrices keep ``pallas-pell-df64`` (digit
    planes over the one-hot MXU path handle arbitrary structure) or
    ``xla-ell-df64``.

    x enters as a host-split (2, n) hi/lo f32 pair (``prep_x``), y
    leaves as (planes, m) scaled digit planes summed in float64 on
    the host (``post``) — the same plumbing as pallas-pell-df64.
    """
    from spmv_scpa_tpu.ops.registry import Prepared as _Prepared
    from spmv_scpa_tpu.ops.registry import bind
    if Prepared is None:
        Prepared = _Prepared
    if interpret is None:
        interpret = _auto_interpret()

    m, n = A.m, A.n
    nnz = A.nnz
    rows = A.row_ids().astype(np.int64)
    cols = A.ja.astype(np.int64)

    if loc_w == "auto":
        loc_w = _LOC_CHOICES[-1]
        if nnz:
            d = np.abs(cols - rows)
            for w in _LOC_CHOICES:
                if float(np.max(d, initial=0)) <= w:
                    loc_w = w
                    break
    if loc_w % BC:
        raise ValueError("loc_w must be a multiple of 128")
    PL = loc_w // BC
    S = 1 + 2 * PL

    grp = rows // BC
    off = cols - grp * BC + loc_w
    if nnz and not bool(np.all((off >= 0) & (off < S * BC))):
        n_out = int(np.sum((off < 0) | (off >= S * BC)))
        raise ValueError(
            f"pallas-hybrid-df64: {n_out} entries outside the "
            f"loc_w={loc_w} diagonal window (no df64 tail); use "
            "pallas-pell-df64")
    sl = (np.arange(nnz, dtype=np.int64)
          - A.irp[rows].astype(np.int64)) if nnz else np.zeros(0, np.int64)
    Q = int(sl.max(initial=0)) + 1
    if Q > 128:
        raise ValueError(
            f"pallas-hybrid-df64: max row length {Q} > 128 slot "
            "planes; use pallas-pell-df64")
    if chunk is None:
        chunk = max(8, min(256, (2048 // Q) // 8 * 8))

    G_tot = max(1, -(-m // BC))
    G_pad = -(-G_tot // chunk) * chunk
    steps = G_pad // chunk
    P_pad = G_pad + S
    x_bytes = 2 * P_pad * BC * 4
    if x_bytes > X_VMEM_BUDGET:
        raise ValueError(
            f"pallas-hybrid-df64: resident x pair ({x_bytes} B) "
            "exceeds the VMEM budget; use xla-ell-df64")
    n_local = min(n, P_pad * BC - loc_w)

    # host-side f32 split (f64 available here, never on device)
    a64 = np.asarray(A.as_, np.float64)
    vh = a64.astype(np.float32)
    vl = (a64 - vh.astype(np.float64)).astype(np.float32)
    amax = float(np.max(np.abs(a64), initial=0.0))

    planes = DF64_LANE_PLANES
    shape = (steps * Q * chunk, BC)
    vh_a = np.zeros(shape, np.float32)
    vl_a = np.zeros(shape, np.float32)
    idx_a = np.zeros(shape, np.int16)
    used: list[set] = [set() for _ in range(Q)]
    if nnz:
        lane = (rows % BC).astype(np.int64)
        arow = (grp // chunk) * (Q * chunk) + sl * chunk + grp % chunk
        vh_a[arow, lane] = vh
        vl_a[arow, lane] = vl
        idx_a[arow, lane] = off.astype(np.int16)
        qs = np.unique(np.stack([sl, off // BC]), axis=1)
        for q, w in qs.T:
            used[int(q)].add(int(w))
    used_t = tuple(tuple(sorted(u)) for u in used)

    dtype = jnp.float32
    vh_d = jax.device_put(jnp.asarray(vh_a))
    vl_d = jax.device_put(jnp.asarray(vl_a))
    idx_d = jax.device_put(jnp.asarray(idx_a))

    blk = lambda i: (i, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # E scale (1, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xh resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xl resident
            pl.BlockSpec((Q * chunk, BC), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((Q * chunk, BC), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((Q * chunk, BC), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((planes * chunk, BC), blk,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk + S, BC), dtype),
                        pltpu.VMEM((chunk + S, BC), dtype)],
    )
    call = pl.pallas_call(
        _lane_ell_kernel_df64(chunk, Q, S, used_t, planes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((planes * G_pad, BC), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                2 * x_bytes + 2 * planes * G_pad * BC * 4
                + 4 * Q * chunk * BC * 10
                + 2 * (chunk + S) * BC * 4
                + 2 * planes * chunk * BC * 4
                + (8 << 20), 110 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=60 * steps * Q * chunk * BC,
            bytes_accessed=int(steps * Q * chunk * BC * 10 + x_bytes
                               + planes * G_pad * BC * 4),
            transcendentals=0),
        interpret=interpret,
    )

    amax_c = float(max(amax, np.finfo(np.float32).tiny))

    def raw(x2, vh_f, vl_f, idx_f):
        xh, xl = x2[0], x2[1]
        xmax = jnp.maximum(jnp.max(jnp.abs(xh)), jnp.float32(1e-30))
        # EXACT power-of-two bound with a guard bit (pow2_bound — NOT
        # jnp.exp2, which XLA approximates); keep E*2^-56 normal (TPU
        # flushes f32 denormals). Same scale rule as pallas-pell-df64.
        E = pow2_bound(jnp.float32(amax_c) * xmax)
        xph = jnp.zeros((P_pad * BC,), dtype)
        xph = xph.at[loc_w:loc_w + n_local].set(xh[:n_local])
        xpl = jnp.zeros((P_pad * BC,), dtype)
        xpl = xpl.at[loc_w:loc_w + n_local].set(xl[:n_local])
        yp = call(E.reshape(1, 1), xph.reshape(P_pad, BC),
                  xpl.reshape(P_pad, BC), vh_f, vl_f, idx_f)
        # (planes*G_pad, BC) with step-interleaved plane blocks:
        # rows [s*planes*chunk + k*chunk + c] -> plane k, group
        # s*chunk + c
        return yp.reshape(steps, planes, chunk * BC) \
                 .transpose(1, 0, 2).reshape(planes, -1)[:, :m]

    def prep_x(x):
        x = np.asarray(x, np.float64)
        hi = x.astype(np.float32)
        lo = (x - hi.astype(np.float64)).astype(np.float32)
        return jax.device_put(jnp.stack([hi, lo]))

    def post(yp):
        return np.asarray(yp, np.float64).sum(axis=0)

    args = (vh_d, vl_d, idx_d)
    return Prepared(
        "pallas-hybrid-df64", A.name, bind(raw, args, prep_x, post),
        on_device=True, nnz=nnz, raw=raw, args=args,
        prep_x=prep_x, post=post,
        hbm_bytes=int(steps * Q * chunk * BC * 10 + 2 * n * 4
                      + planes * G_pad * BC * 4),
        meta={"loc_w": loc_w, "slots": Q, "strips": S, "chunk": chunk,
              "steps": steps, "planes": planes,
              "fill": float(nnz) / max(G_pad * Q * BC, 1)})


def _auto_loc_w(rows: np.ndarray, cols: np.ndarray) -> int:
    d = np.abs(cols - rows)
    cov = {w: float(np.mean(d <= w)) for w in _LOC_CHOICES}
    best = cov[_LOC_CHOICES[-1]]
    for w in _LOC_CHOICES:
        if cov[w] >= best - 0.02:
            return w
    return _LOC_CHOICES[-1]


def _auto_hot_k(out_cols: np.ndarray, nnz: int) -> int:
    if out_cols.size == 0:
        return 0
    _, cnt = np.unique(out_cols, return_counts=True)
    top = np.sort(cnt)[::-1]
    csum = np.cumsum(top)

    def cov(k):
        return float(csum[min(k, top.size) - 1])

    if cov(_HOT_CHOICES[-1]) < 0.05 * nnz:
        return 0                 # hubs don't carry enough to pay strips
    for k in _HOT_CHOICES:
        if cov(k) >= 0.9 * cov(_HOT_CHOICES[-1]):
            return k
    return _HOT_CHOICES[-1]


def prepare_lane_ell_hybrid(A: CSR, dtype=jnp.float32,
                            chunk: int | None = None,
                            loc_w: int | str = "auto",
                            slots: int | str = "auto",
                            hot_k: int | str = "auto",
                            tail_strategy: str = "pallas-pell",
                            ext: bool | str = "auto",
                            ext_windowed: bool = True,
                            idx8: bool = False,
                            interpret: bool | None = None,
                            strip_cov: float | None = 0.985,
                            dyn_strips: bool | str = False,
                            dyn_k: int = 4,
                            ov_max: int = 8, ov_budget: int = 64,
                    aug: bool = True, undrop_min: int = 512,
                            ded_bytes: int = 32 << 20,
                            ded_max: int = 4, max_strips: int = 4,
                            tail_xla_max: int = 32768,
                            depth: int = 0, max_depth: int = 2,
                            diag: str = "", Prepared=None,
                            x_off: int = 0, core_only: bool = False,
                            **_):
    """Build the hybrid: lane-ELL core + hot region + CSR tail.

    ``x_off`` shifts the diagonal window by a global column offset —
    row ``i`` of a ROW SHARD is global row ``x_off + i``, so its local
    window sits around column ``x_off + i`` (parallel/distributed.py
    slices a shared padded x per shard). ``core_only`` stops after the
    host-side packing and returns a ``_CoreBuild`` (NumPy arrays +
    static config) instead of a Prepared — the distributed builder
    pads/stacks those across shards into one SPMD program.
    """
    from spmv_scpa_tpu.ops.registry import Prepared as _Prepared
    from spmv_scpa_tpu.ops.registry import bind, get_strategy
    if Prepared is None:
        Prepared = _Prepared
    if interpret is None:
        interpret = _auto_interpret()

    m, n = A.m, A.n
    rows = A.row_ids().astype(np.int64)
    cols = A.ja.astype(np.int64)
    nnz = A.nnz

    cols_w = cols - x_off        # window-relative column frame
    if (loc_w == "auto" and depth == 0 and not core_only and nnz
            and ext == "auto" and tail_strategy == "pallas-pell"):
        # No-locality escape: when even the widest diagonal window
        # covers a minority of entries, the hybrid's core+ext+tail
        # split just adds overhead over the panel-local PELL kernel
        # (measured: powerlaw archetype 8.4 GF/s through the split vs
        # 12.5 GF/s whole-matrix pallas-pell row_sort chunk=256) —
        # delegate the WHOLE matrix to pallas-pell's own auto tuning.
        d_cov = float(np.mean(np.abs(cols_w - rows)
                              <= _LOC_CHOICES[-1]))
        if d_cov < 0.4:
            prep = get_strategy("pallas-pell").prepare(
                A, dtype=dtype, interpret=interpret)
            prep.meta.setdefault("tail_kind", "pallas-pell")
            prep.meta["delegated"] = "pallas-pell"
            prep.meta["d_cov"] = round(d_cov, 4)
            return prep
    if loc_w == "auto":
        loc_w = _auto_loc_w(rows, cols_w) if nnz else 128
    if loc_w % BC:
        raise ValueError("loc_w must be a multiple of 128")
    PL = loc_w // BC
    S = 1 + 2 * PL               # local strips per group window

    grp = rows // BC
    off = cols_w - grp * BC + loc_w        # window-relative position
    is_local = (off >= 0) & (off < S * BC)

    out_cols = cols[~is_local]

    # ---- ext pipeline (ops/ext_gather.py): absorb out-of-window
    # entries as per-group ext panels built by two exact-f32 Pallas
    # gather stages. Replaces the hot mechanism (which caps at top-k
    # and leaves mid-frequency hubs to the ~30 ns/entry XLA tail).
    from spmv_scpa_tpu.ops import ext_gather
    plan = None
    if nnz and out_cols.size and ext in ("auto", True):
        plan = ext_gather.plan_ext(rows, cols, ~is_local, m, n,
                                   allow_windowed=ext_windowed)
        if plan is not None and ext == "auto":
            G_est0 = max(1, -(-m // BC))
            h_eff = plan.r_hot if plan.windowed else plan.H
            vpu_ops = G_est0 * h_eff * BC * 3      # stage-2 dominates
            # Cost-aware gate (measured on chip, round 3): stage-2 VPU
            # ops convert at ~0.74 bytes-equivalent each (1e12 ops/s
            # vs the 742 GB/s stream), while an ext-dropped entry
            # costs ~500 B-equiv in the tail (chips / compact-PELL).
            # webbase: 7.4e8 ops = 550 MB-eq vs 500k x 500 = 250 MB-eq
            # -> drop ext (measured 2.46 vs 2.68 ms); amazon: 42 vs
            # 82 MB-eq -> keep (0.294 vs 0.461 ms).
            if (plan.covered < 0.5 or plan.n_out < 2048
                    or plan.n_out < 0.005 * nnz
                    or vpu_ops * 0.74 > plan.n_out * 500):
                plan = None
    use_ext = plan is not None
    ext_lane = plan.ext_lane if use_ext else None
    if use_ext:
        hot_k = 0                # ext supersedes the top-k hot region

    if hot_k == "auto":
        hot_k = _auto_hot_k(out_cols, nnz) if nnz else 0
    Hs = hot_k // BC
    hot_idx = np.zeros(Hs * BC, np.int64)
    hot_rank = np.full(nnz, -1, np.int64)
    if hot_k:
        uniq, cnt = np.unique(out_cols, return_counts=True)
        topk = uniq[np.argsort(cnt)[::-1][:hot_k]]
        hot_idx[:topk.size] = np.sort(topk)
        lookup = np.full(n, -1, np.int64)
        lookup[hot_idx[:topk.size]] = np.arange(topk.size)
        hot_rank = lookup[cols]
        hot_rank[is_local] = -1

    eligible = is_local | (hot_rank >= 0)
    if use_ext:
        eligible |= ext_lane >= 0

    # per-row rank among eligible entries (CSR order = column order)
    if nnz:
        excl = np.cumsum(eligible) - eligible
        start_excl = np.full(m, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(start_excl, rows, excl)
        sl = excl - start_excl[rows]
    else:
        sl = np.zeros(0, np.int64)

    G_est = max(1, -(-m // BC))
    # Chips-tail feasibility probe at the smallest realistic Q (spill
    # sets shrink with Q, so this bounds every candidate): single
    # resident pipeline, else the local/far split proxy.
    from spmv_scpa_tpu.ops import chips_tail as _ct
    cheap_tail = False
    if nnz:
        probe0 = ~(eligible & (sl < 8))
        if int(np.sum(probe0)):
            pu0 = np.unique(cols[probe0]).size
            e80 = -(-int(np.sum(probe0)) // (8 * BC)) * 8
            if (-(-pu0 // BC) <= _ct.H_CAP
                    and e80 * (-(-pu0 // BC)) * BC * 3
                    <= _ct.VPU_BUDGET):
                cheap_tail = True
            else:
                pf0 = probe0 & (np.abs(cols_w - rows) > _ct.W_LOC)
                fu0 = np.unique(cols[pf0]).size if pf0.any() else 0
                cheap_tail = -(-fu0 // BC) <= _ct.H_CAP
    if slots == "auto":
        # Minimize estimated HBM traffic: each slot plane streams
        # G*BC*(4+2) bytes regardless of fill, while every spilled or
        # ineligible entry runs a tail at ~TAIL_BPN effective
        # bytes/nnz. Two tail regimes: the chips tail
        # (ops/chips_tail.py — MXU-reduced 128-lane chips) costs
        # ~40-80 B/entry equivalent, while the scalar fallbacks are
        # brutal (near-scalar XLA ~30 ns/nnz == ~22 kB/nnz
        # bandwidth-equivalent; PELL tails pay O(m) grid work).
        # Chips eligibility is monotone in Q (a larger Q's spill set
        # is a subset), so probing it at the smallest realistic Q
        # bounds every candidate.
        TAIL_BPN = 100 if cheap_tail else 2000
        # The chips tail ends in one y.at[heavy_rows].add — a scalar
        # scatter at ~30 ns/row == ~22 kB/row bandwidth-equivalent;
        # rows longer than Q each become one heavy row. (With the
        # scalar fallbacks, per-ROW cost is already folded into
        # TAIL_BPN=2000 per entry.)
        # Per-heavy-row landing cost: recalibrated from 22000 (the
        # scalar-scatter era) to 8000 B-equiv now that the panel merge
        # (ranked, or windowed at O(r_h)/row) carries the landing —
        # measured: amazon slots=24 runs 6.79 GF/s vs the old model's
        # slots=32 pick at 5.46 (round 3, docs/PERF_LOG.md).
        SCAT_B = 8000 if TAIL_BPN < 2000 else 0
        rl_elig = np.bincount(rows[eligible], minlength=m) if nnz \
            else np.zeros(1)
        best_cost, Q = None, _Q_CHOICES[-1]
        for cand in _Q_CHOICES:
            spill = int(np.sum(eligible & (sl >= cand))) + \
                int(np.sum(~eligible))
            n_heavy = int(np.sum(rl_elig > cand))
            cost = (G_est * BC * 6 * cand + TAIL_BPN * spill
                    + SCAT_B * n_heavy)
            if best_cost is None or cost < best_cost:
                best_cost, Q = cost, cand
    else:
        Q = int(slots)
    if chunk is None:
        chunk = max(8, min(256, (2048 // Q) // 8 * 8))
    take0 = eligible & (sl < Q)

    # ---- strip demotion + relocation --------------------------------
    # The multi-strip gather+cmp+select chain measured 31% of flagship
    # runtime (the "nosel" diag hits the full 747 GB/s stream
    # roofline); a rare strip costs a whole gather+shift+cmp+select
    # pass for <2% of a plane's entries. Cap each primary plane's
    # strip set at cumulative coverage >= strip_cov. An entry whose
    # strip was dropped is RELOCATED to a nearby plane that kept it:
    # plane assignment is free bin-packing — the kernel only needs the
    # entry's plane to list its strip and the (row, plane) slot to be
    # unique. Leftovers go to a few catch-all OVERFLOW planes appended
    # after the Q primary ones; the external tail stays near-empty by
    # construction (critical: every device-wide tail path costs O(m)
    # grid work or ~30 ns/nnz XLA scalar work — measured 1.75 ms for
    # a 2.4k-nnz PELL tail on the 377k-row flagship).
    enc_all = np.where(is_local, off, S * BC + hot_rank)
    if use_ext:                  # ext strip sits after the hot strips
        enc_all = np.where(is_local, enc_all,
                           (S + Hs) * BC + ext_lane)
    strip_all = enc_all // BC
    plane = np.where(take0, sl, -1)           # final plane per entry
    nw = S + Hs + (1 if use_ext else 0)
    ext_w = (S + Hs) if use_ext else -1
    n_demoted = n_reloc = 0
    unpl = np.empty(0, np.int64)
    # ---- per-step DYNAMIC strip slots --------------------------------
    # A plane whose entries spread over many sliding strips used to
    # face a lose-lose choice: keep the strips (one gather+cmp+select
    # pass EACH — webbase: 321 passes = 1.07 ms) or demote the entries
    # (overflow-plane padding / tail). Per-step slots break the
    # dilemma: the strip id becomes scalar-prefetched SMEM DATA
    # ((steps, TD) table), so each plane holds dyn_k slots whose strip
    # is chosen per grid step — scattered-local matrices keep short
    # chains because per-step spread << global spread. Encoded as
    # NEGATIVE members of used[q] (slot j = -(j+1)); entry idx codes
    # are nw + j (int16 planes only; dyn planes skip idx8).
    G_tot = max(1, -(-m // BC))
    G_pad = -(-G_tot // chunk) * chunk
    steps = G_pad // chunk
    dyn_k_of: dict[int, int] = {}        # plane -> dyn slot count
    dyn_keep: dict[int, np.ndarray] = {}  # plane -> (steps, S) kept
    dyn_pos: dict[int, np.ndarray] = {}   # plane -> (steps, S) slot j
    dyn_tab: dict[int, np.ndarray] = {}   # plane -> (steps, K) strips
    dyn_on = (dyn_strips if dyn_strips != "auto" else not core_only)
    if nnz and strip_cov is not None and Q > 0:
        pair, cnt = np.unique(sl[take0] * nw + strip_all[take0],
                              return_counts=True)
        keep = np.zeros((Q, nw), bool)
        ti = np.flatnonzero(take0)
        step_all = grp // chunk
        for q in range(Q):
            msk = (pair // nw) == q
            if not msk.any():
                continue
            ws, cs = pair[msk] % nw, cnt[msk]
            n_loc = int(np.sum(ws < S))
            if dyn_on and n_loc > max_strips:
                # dynamic plane: ext/hot strips stay static members;
                # local strips ride per-step slots
                keep[q, ws[ws >= S]] = True
                ei = ti[sl[ti] == q]
                li = ei[strip_all[ei] < S]
                hist = np.zeros((steps, S), np.int64)
                np.add.at(hist, (step_all[li], strip_all[li]), 1)
                K = int(min(dyn_k, max(1, int((hist > 0).sum(
                    axis=1).max(initial=1)))))
                # top-K strips per step; ties broken by strip id
                part = np.argpartition(-hist, K - 1, axis=1)[:, :K]
                kept = np.zeros((steps, S), bool)
                np.put_along_axis(kept, part, True, axis=1)
                kept &= hist > 0
                # never keep a zero-count slot; stable slot order by
                # strip id so the table is deterministic
                pos = np.full((steps, S), -1, np.int64)
                srt = np.sort(np.where(kept, np.arange(S)[None, :],
                                       S), axis=1)[:, :K]
                for j in range(K):
                    sj = srt[:, j]
                    ok = sj < S
                    pos[np.flatnonzero(ok), sj[ok]] = j
                dyn_k_of[q] = K
                dyn_keep[q] = kept
                dyn_pos[q] = pos
                dyn_tab[q] = np.where(srt < S, srt, 0).astype(np.int32)
                continue
            order = np.argsort(cs)                    # ascending
            cum = np.cumsum(cs[order])
            ndrop = int(np.searchsorted(
                cum, (1 - strip_cov) * cum[-1], side="right"))
            # hard cap: scattered planes spread mass evenly over many
            # strips (coverage alone drops nothing) — keep at most
            # max_strips and let relocation + dedicated overflow
            # planes absorb the rest
            ndrop = max(ndrop, len(ws) - max_strips)
            ndrop = min(ndrop, len(ws) - 1)
            keep[q, ws[order[ndrop:]]] = True
        nat = np.zeros(nnz, bool)
        nat[ti] = keep[sl[ti], strip_all[ti]]
        for q, kept in dyn_keep.items():
            ei = ti[sl[ti] == q]
            li = ei[strip_all[ei] < S]
            nat[li] = kept[step_all[li], strip_all[li]]
        unpl = np.flatnonzero(take0 & ~nat)
        n_demoted = int(unpl.size)
        plane[unpl] = -1
        if unpl.size:
            base_keys = np.sort(rows[nat] * (Q + 1) + sl[nat])
            extra_keys = np.empty(0, np.int64)

            def _in_sorted(keys, arr):
                if not arr.size:
                    return np.zeros(keys.shape, bool)
                p = np.minimum(np.searchsorted(arr, keys), arr.size - 1)
                return arr[p] == keys

            # per-strip keeper-plane lists, tried round-robin (spread
            # by row so same-strip entries of one row hit distinct
            # planes in the same pass); dynamic planes accept only
            # their STATIC members (per-step local slots can't host
            # arbitrary relocations)
            def _reloc(unpl, extra_keys):
                kp = [np.flatnonzero(keep[:, w]) for w in range(nw)]
                kp_size = np.array([p.size for p in kp])
                kp_len = np.maximum(kp_size, 1)
                kp_tab = np.zeros((nw, int(kp_len.max(initial=1))),
                                  np.int64)
                for w, p in enumerate(kp):
                    if p.size:
                        kp_tab[w, :p.size] = p
                n_pass = int(min(kp_len.max(initial=1), 24))
                for t in range(n_pass):
                    if not unpl.size:
                        break
                    w_u = strip_all[unpl]
                    slot = (rows[unpl] + t) % kp_len[w_u]
                    q2 = kp_tab[w_u, slot]
                    oki = np.flatnonzero(kp_size[w_u] > 0)
                    if not oki.size:
                        break
                    key = rows[unpl[oki]] * (Q + 1) + q2[oki]
                    free = ~(_in_sorted(key, base_keys)
                             | _in_sorted(key, extra_keys))
                    oki, key = oki[free], key[free]
                    if not oki.size:
                        continue
                    _, first = np.unique(key, return_index=True)
                    oki, key = oki[first], key[first]
                    plane[unpl[oki]] = q2[oki]
                    extra_keys = np.sort(np.concatenate([extra_keys,
                                                         key]))
                    unpl = np.delete(unpl, oki)
                return unpl, extra_keys

            unpl, extra_keys = _reloc(unpl, extra_keys)

            # ---- relocation-target augmentation (round 5) -----------
            # Flagship diagnosis (docs/PERF_LOG.md round 5): leftovers
            # concentrate in strips whose keeper planes' row slots are
            # FULL (stencil strip 2: 10 mid-band keepers, 36k
            # leftovers), while trailing planes — where short rows
            # leave (row, q) gaps — don't keep the strip. Adding the
            # starved strip to high-free-capacity planes costs one
            # select pass each (SEL_B*G_pad*BC ~ 0.76 MB-equiv) and
            # lets relocation drain leftovers that would otherwise
            # burn near-empty overflow planes (measured: 16 planes at
            # fill 0.008 = 21% of the core stream). Marginal gate:
            # a keeper is added only while >= 1024 leftovers could
            # route to it (1024 entries ~ 1/3 ov plane ~ one pass,
            # break-even).
            if aug and unpl.size > 2048:
                occ = np.bincount(plane[plane >= 0], minlength=Q)[:Q]
                free_q = m - occ
                w_left = strip_all[unpl]
                mass = np.bincount(w_left, minlength=nw)
                added = 0
                for w in np.argsort(-mass):
                    if mass[w] < 2048:
                        continue
                    # a row with k same-strip leftovers needs k
                    # DISTINCT keeper planes with a free slot in that
                    # row — size the augmentation by the per-(row)
                    # rank tiers (measured flagship: multiplicity up
                    # to 24; one plane absorbs one entry per row)
                    lw = unpl[w_left == w]
                    rk = np.bincount(
                        np.unique(rows[lw], return_inverse=True)[1])
                    tier_sz = np.bincount(
                        np.concatenate([np.arange(k) for k in rk]))
                    n_add = int(np.sum(tier_sz >= 1024))
                    # int8-aware target order: planes already at >= 3
                    # strips are int16 anyway (a new strip is free
                    # byte-wise), 1-strip planes stay int8 at 2 —
                    # avoid flipping 2-strip (int8) planes to int16
                    # (+1 B/slot = +G_pad*BC*steps bytes)
                    n_aug = keep[:Q].sum(axis=1)
                    cand = sorted(
                        (q for q in range(Q)
                         if not keep[q, w] and q not in dyn_k_of
                         and free_q[q] >= 1024),
                        key=lambda q: (0 if n_aug[q] >= 3 else
                                       1 if n_aug[q] <= 1 else 2,
                                       -free_q[q]))
                    for q in cand[:n_add]:
                        if added >= 24:
                            break
                        keep[q, w] = True
                        added += 1
                if added:
                    unpl, extra_keys = _reloc(unpl, extra_keys)

            # ---- post-relocation undrop (round 5) -------------------
            # What remains sits in FULL rows (demand > free slots —
            # flagship: 12.5k entries, per-row same-strip multiplicity
            # up to 24) and can never relocate. Returning a leftover
            # GROUP to its native (plane, strip) costs one select pass
            # (SEL_B*G_pad*BC ~ 0.76 MB-eq) vs ~2-3 kB-eq/entry on the
            # near-empty overflow planes — undrop groups >= 512
            # entries whose native slot wasn't taken by a relocation.
            if unpl.size and undrop_min:
                gkey = sl[unpl] * np.int64(nw) + strip_all[unpl]
                skey = rows[unpl] * (Q + 1) + sl[unpl]
                taken = _in_sorted(skey, extra_keys)
                u_g, inv_g, c_g = np.unique(
                    gkey, return_inverse=True, return_counts=True)
                # a (plane, strip) pass that PLACED entries already
                # pay for makes undropping into it free at any size
                pm = plane >= 0
                present = np.unique(plane[pm] * np.int64(nw)
                                    + strip_all[pm])
                free_pass = _in_sorted(gkey, present)
                # free_pass joins are free at any size; a NEW pass
                # costs ~1.5 us on chip (measured round 5: 12 extra
                # passes ate the whole 18 MB byte cut) — only groups
                # >= undrop_min entries (~2.9 kB-eq each on the ov
                # planes) buy one
                back = ((c_g[inv_g] >= undrop_min) | free_pass) & ~taken
                plane[unpl[back]] = sl[unpl[back]]
                unpl = unpl[~back]
        n_reloc = n_demoted - int(unpl.size)

    # Leftovers whose row is ALREADY heavy (rank-spilled past Q) ride
    # the chips tail for free — the row is in the tail's scatter set
    # regardless — instead of burning overflow-plane bytes.
    if unpl.size and cheap_tail:
        rl_all = np.bincount(rows[eligible], minlength=m)
        already_heavy = rl_all[rows[unpl]] > Q
        unpl = unpl[~already_heavy]
    # (measured refutation, docs/PERF_LOG.md round 3: routing ALL
    # demotion leftovers to the big-tail compacted-PELL delegation
    # polluted the tail with ~500k LIGHT rows — the compacted
    # sub-problem became the original scatter problem again and ran
    # slower than the overflow planes it replaced. Leftovers stay on
    # the dedicated/catch-all plane path; the catch-all select chains
    # are tamed by per-step dynamic strips below instead.)

    # Overflow planes for unrelocatable leftovers, in two tiers:
    # (a) strip-wise DEDICATED planes — single-strip (no select
    #     chain), sized to each strip's max per-(row,strip) count.
    #     These absorb hub entries and jitter strips cheaply.
    # (b) a few catch-all planes (full decode) for the remainder.
    next_q = Q
    # dedicated planes stream G_pad*128*6 B each regardless of fill —
    # cap their count by a bytes budget (the measured amazon failure:
    # 101 dedicated planes = 160 MB = 0.22 ms of pure padding DMA)
    G_tot0 = max(1, -(-m // BC))
    ov_budget = min(ov_budget,
                    max(0, int(ded_bytes // (G_tot0 * BC * 6))))
    # a TINY residue rides the XLA tail (~30 ns/entry: 384 entries =
    # ~12 us-eq) instead of spawning near-empty ded/catch planes
    # (measured flagship: 288 leftovers cost 5 planes = 11.3 MB =
    # ~15 us of padding DMA)
    if aug and unpl.size <= 384:
        unpl = np.empty(0, np.int64)
    if unpl.size:
        w_u = strip_all[unpl]
        key = w_u * np.int64(m + 1) + rows[unpl]
        order = np.argsort(key, kind="stable")
        ks = key[order]
        newgrp = np.r_[True, ks[1:] != ks[:-1]]
        first = np.flatnonzero(newgrp)
        gid = np.cumsum(newgrp) - 1
        rank = np.arange(ks.size) - first[gid]
        rank_u = np.empty(unpl.size, np.int64)
        rank_u[order] = rank
        strip_mass = np.bincount(w_u, minlength=nw)
        placed_mask = np.zeros(unpl.size, bool)
        for w in np.argsort(-strip_mass):
            if strip_mass[w] == 0 or next_q - Q >= ov_budget:
                break
            mw = w_u == w
            k_w = min(int(rank_u[mw].max()) + 1, ded_max,
                      Q + ov_budget - next_q)
            hit = mw & (rank_u < k_w)
            plane[unpl[hit]] = next_q + rank_u[hit]
            placed_mask |= hit
            next_q += k_w
        unpl = unpl[~placed_mask]
    catch0 = next_q
    if unpl.size:
        rem = np.zeros(nnz, bool)
        rem[unpl] = True
        excl2 = np.cumsum(rem) - rem
        start2 = np.full(m, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(start2, rows, excl2)
        sl2 = excl2 - start2[rows]
        ov = rem & (sl2 < ov_max)
        plane[ov] = next_q + sl2[ov]
        if ov.any():
            next_q += int(sl2[ov].max()) + 1
    # Catch-all planes get per-step DYNAMIC local strips instead of
    # the full strip decode: a webbase-class core's 13 catch-alls
    # carried 321 static strip passes = 1.07 ms of pure select VPU
    # (vs 0.30 ms core stream). Per-step top-dyn_k keeps most entries
    # (demotion leftovers cluster); the rest join the tail. Primary
    # planes stay static — measured on chip, per-step slots LOSE there
    # (flagship 161.6 -> 155.5 GF/s; uniform scatter spreads per-step
    # exactly like global, so the SMEM-driven chain buys no coverage).
    if next_q > catch0 and not core_only and nnz:
        step_all2 = grp // chunk
        for qc in range(catch0, next_q):
            ei = np.flatnonzero(plane == qc)
            li = ei[strip_all[ei] < S]
            if not li.size:
                continue
            hist = np.zeros((steps, S), np.int64)
            np.add.at(hist, (step_all2[li], strip_all[li]), 1)
            n_strips_q = int(np.unique(strip_all[li]).size)
            if n_strips_q <= max_strips:
                continue                   # static set already short
            K = int(min(dyn_k, max(1, int((hist > 0).sum(
                axis=1).max(initial=1)))))
            part = np.argpartition(-hist, K - 1, axis=1)[:, :K]
            kept = np.zeros((steps, S), bool)
            np.put_along_axis(kept, part, True, axis=1)
            kept &= hist > 0
            pos = np.full((steps, S), -1, np.int64)
            srt = np.sort(np.where(kept, np.arange(S)[None, :], S),
                          axis=1)[:, :K]
            for j in range(K):
                sj = srt[:, j]
                ok = sj < S
                pos[np.flatnonzero(ok), sj[ok]] = j
            drop = li[~kept[step_all2[li], strip_all[li]]]
            plane[drop] = -1
            dyn_k_of[qc] = K
            dyn_keep[qc] = kept
            dyn_pos[qc] = pos
            dyn_tab[qc] = np.where(srt < S, srt, 0).astype(np.int32)
    Qo = next_q - Q
    take = plane >= 0
    QT = Q + Qo

    G_tot = max(1, -(-m // BC))
    G_pad = -(-G_tot // chunk) * chunk
    steps = G_pad // chunk

    # ---- cost-aware demotion acceptance ------------------------------
    # Demotion trades streamed plane bytes (each plane: 6 B/lane/step)
    # for select-chain VPU work (~SEL_B bytes-equivalent per extra
    # strip pass). The coverage rule alone can lose badly: measured on
    # a plain banded matrix it demoted 1.5k entries to save ONE strip
    # pass while adding 8 overflow planes (+50% core bytes, fill
    # 0.74 -> 0.49). Compare both packings and keep the cheaper.
    if n_demoted and nnz:
        def _strip_ops(pl_arr, msk):
            return np.unique(pl_arr[msk] * np.int64(nw)
                             + strip_all[msk]).size
        if dyn_k_of:
            # dynamic planes run exactly K select passes per step
            # (their entry-level strip variety is SMEM data, not
            # extra passes); count their static (ext/hot) members
            # from entries as usual
            dv = np.zeros(QT, bool)
            dv[list(dyn_k_of)] = True
            in_dyn = (plane >= 0) & dv[np.clip(plane, 0, QT - 1)]
            stat = take & (~in_dyn | (strip_all >= S))
            ops_d = _strip_ops(plane, stat) + sum(dyn_k_of.values())
        else:
            ops_d = _strip_ops(plane, take)
        plane_n = np.where(take0, sl, -1)
        ops_n = _strip_ops(plane_n, take0)
        n_tail_d = int(np.sum(take0 & ~take))   # demotion leftovers
        tb = 100 if cheap_tail else 2000
        cost_d = (QT * 6 + max(ops_d - QT, 0) * SEL_B) * G_pad * BC \
            + n_tail_d * tb
        cost_n = (Q * 6 + max(ops_n - Q, 0) * SEL_B) * G_pad * BC
        if cost_n < cost_d:
            plane = plane_n
            take = plane >= 0
            Qo, QT = 0, Q
            n_demoted = n_reloc = 0
            dyn_k_of, dyn_keep = {}, {}
            dyn_pos, dyn_tab = {}, {}

    # overflow-plane occupancy BEFORE the idx8 remap permutes ids
    n_ov_nnz = int(np.sum(plane >= Q)) if nnz else 0

    # ---- pack plane-major arrays ------------------------------------
    # Per-plane static strip sets come first: the idx8 partition
    # reorders planes so <=2-strip ones lead (their idx rides an int8
    # plane — bit 7 = strip POSITION in the set, bits 0-6 = lane —
    # cutting slot bytes 6 -> 5; flagship: 84% of planes qualify).
    sets: list[tuple] = [() for _ in range(QT)]
    if nnz:
        pq = plane[take]
        pw = (enc_all[take] // BC).astype(np.int64)
        # dynamic planes list their local strips as negative SLOT
        # members (-1.. -K), not as static strips
        dyn_loc = np.zeros(take.sum() if nnz else 0, bool)
        if dyn_k_of:
            dvec = np.zeros(QT, bool)
            dvec[list(dyn_k_of)] = True
            dyn_loc = dvec[pq] & (pw < S)
        qs = np.unique(np.stack([pq[~dyn_loc], pw[~dyn_loc]]), axis=1)
        acc_sets: list[set] = [set() for _ in range(QT)]
        for q, w in qs.T:
            acc_sets[int(q)].add(int(w))
        for q, K in dyn_k_of.items():
            acc_sets[q].update(-(j + 1) for j in range(K))
        sets = [tuple(sorted(u)) for u in acc_sets]
    n8 = 0
    second8 = np.zeros(0, np.int64)
    if idx8 and not core_only and nnz:
        order, sets, n8, second8 = idx8_partition(sets, chunk)
        remap = np.zeros(QT, np.int64)
        for newq, oldq in enumerate(order):
            remap[oldq] = newq
        plane[take] = remap[plane[take]]
        dyn_k_of = {int(remap[q]): K for q, K in dyn_k_of.items()}
        dyn_pos = {int(remap[q]): v for q, v in dyn_pos.items()}
        dyn_tab = {int(remap[q]): v for q, v in dyn_tab.items()}
    used_t = tuple(sets)
    n16 = QT - n8

    vals_a = np.zeros((steps * QT * chunk, BC), np.float32)
    idx_a = np.zeros((steps * n16 * chunk, BC), np.int16)
    idx8_a = np.zeros((steps * n8 * chunk, BC), np.int8)
    if nnz:
        tg = grp[take]
        tq = plane[take]
        lane = (rows[take] % BC).astype(np.int64)
        enc = enc_all[take].copy()
        if dyn_k_of:
            st_t = tg // chunk
            pw_t = enc // BC          # absolute strip id
            for q, posq in dyn_pos.items():
                mloc = (tq == q) & (pw_t < S)
                if not mloc.any():
                    continue
                j = posq[st_t[mloc], pw_t[mloc]]
                assert (j >= 0).all(), "dyn slot missing for kept entry"
                enc[mloc] = (nw + j) * BC + enc[mloc] % BC
        arow = (tg // chunk) * (QT * chunk) + tq * chunk + tg % chunk
        vals_a[arow, lane] = A.as_[take]
        m16 = tq >= n8
        if m16.any():
            arow16 = ((tg[m16] // chunk) * (n16 * chunk)
                      + (tq[m16] - n8) * chunk + tg[m16] % chunk)
            idx_a[arow16, lane[m16]] = enc[m16].astype(np.int16)
        if n8:
            m8 = ~m16
            arow8 = ((tg[m8] // chunk) * (n8 * chunk)
                     + tq[m8] * chunk + tg[m8] % chunk)
            idx8_a[arow8, lane[m8]] = idx8_encode(enc[m8],
                                                  second8[tq[m8]])

    # resident x: loc_w left pad + local span + window slack, then hot
    P_pad = G_pad + S            # window read for the last step fits
    hp0 = P_pad
    x_bytes = (P_pad + Hs) * BC * jnp.dtype(dtype).itemsize
    if x_bytes > X_VMEM_BUDGET:
        raise ValueError(
            f"pallas-hybrid: resident x ({x_bytes} B) exceeds VMEM "
            f"budget {X_VMEM_BUDGET} B; use pallas-pell (striped)")
    n_local = min(n - x_off, P_pad * BC - loc_w)

    if core_only:
        # shard-packing mode: hot stays off (its gather indexes global
        # x with per-shard tables); ext IS allowed when forced to the
        # non-windowed stage-2 (per-shard table shapes pad to a
        # unified SPMD shape in parallel/distributed.py — windowed
        # mode's r_hot would be program structure, hence the gate)
        assert Hs == 0, "core_only requires hot_k=0"
        assert not (use_ext and ext_windowed), \
            "core_only ext requires ext_windowed=False"
        assert not dyn_k_of, \
            "core_only (distributed) runs static strip sets only"
        tm = ~take if nnz else np.zeros(0, bool)
        if use_ext:
            p2_a, l2_a = ext_gather.build_group_tables(plan, G_pad)
            extb = dict(ext_ng=plan.n_groups, ext_n1p=plan.n1p_blocks,
                        ext_base=plan.base, ext_p1=plan.p1,
                        ext_l1=plan.l1, ext_p2=p2_a, ext_l2=l2_a,
                        ext_cov=plan.covered, ext_n_out=plan.n_out)
        else:
            extb = dict(ext_ng=0, ext_n1p=0, ext_base=None,
                        ext_p1=None, ext_l1=None, ext_p2=None,
                        ext_l2=None, ext_cov=0.0, ext_n_out=0)
        return _CoreBuild(
            vals_a=vals_a, idx_a=idx_a, used=used_t, Q=Q, Qo=Qo,
            QT=QT, S=S, chunk=chunk, steps=steps, G_pad=G_pad,
            P_pad=P_pad, loc_w=loc_w, n_local=n_local, m=m,
            trows=rows[tm], tcols=cols[tm], tvals=A.as_[tm],
            n_demoted=n_demoted, n_reloc=n_reloc, **extb)

    vals_d = jax.device_put(jnp.asarray(vals_a, dtype))
    idx_ds = []
    if n8:
        idx_ds.append(jax.device_put(jnp.asarray(idx8_a)))
    if n16 or not n8:            # n8==QT: idx16 plane absent entirely
        idx_ds.append(jax.device_put(jnp.asarray(idx_a)))
    idx_ds = tuple(idx_ds)
    hot_d = jax.device_put(jnp.asarray(hot_idx, jnp.int32))

    # per-step dynamic strip table, flattened for SMEM scalar prefetch
    dyn_off: dict[int, int] = {}
    TD = 0
    for q in sorted(dyn_k_of):
        dyn_off[q] = TD
        TD += dyn_k_of[q]
    if TD:
        dynw_a = np.zeros((steps, TD), np.int32)
        for q, tab in dyn_tab.items():
            dynw_a[:, dyn_off[q]:dyn_off[q] + dyn_k_of[q]] = tab
        dynw_d = jax.device_put(jnp.asarray(dynw_a.reshape(-1)))
        pre = (dynw_d,)

        def _im(i, dw):
            return (i, 0)
    else:
        dynw_d = None
        pre = ()

        def _im(i):
            return (i, 0)

    slot_b = 4 * QT + 1 * n8 + 2 * n16     # f32 vals + split idx
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),              # x resident
        pl.BlockSpec((QT * chunk, BC), _im,
                     memory_space=pltpu.VMEM),
    ]
    if n8:
        in_specs.append(pl.BlockSpec((n8 * chunk, BC), _im,
                                     memory_space=pltpu.VMEM))
    if n16 or not n8:
        in_specs.append(pl.BlockSpec(((n16 if n8 else QT) * chunk,
                                      BC), _im,
                                     memory_space=pltpu.VMEM))
    if use_ext:                  # per-group ext panels, step-aligned
        in_specs.append(pl.BlockSpec((chunk, BC), _im,
                                     memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if TD else 0,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk, BC), _im,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk + S, BC), dtype)],
    )
    call = pl.pallas_call(
        _lane_ell_kernel(chunk, QT, S, hp0, used_t, diag, ext_w,
                         n8=n8, nw=nw, dyn_off=dyn_off, TD=TD),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G_pad, BC), dtype),
        compiler_params=pltpu.CompilerParams(
            # Generous: XLA may hoist the whole (G_pad, BC) output and
            # the resident x into the kernel's scoped-vmem scope when
            # the call sits inside a fori_loop (measured webbase
            # compile OOM: demand 29.7 MB vs the old tight 16.7 MB
            # estimate), so budget both in full plus slack.
            vmem_limit_bytes=min(
                2 * x_bytes + 2 * G_pad * BC * 4
                + 4 * chunk * BC * slot_b
                + (chunk + S) * BC * 4 + chunk * BC * 4 * 2
                + (chunk * BC * 8 if use_ext else 0)
                + (8 << 20), 110 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * QT * chunk * BC,
            bytes_accessed=int(steps * chunk * BC * slot_b + x_bytes
                               + (G_pad * BC * 4 if use_ext else 0)),
            transcendentals=0),
        interpret=interpret,
    )

    if use_ext:
        # windowed stage-2 needs 8-row output steps; fall back to the
        # resident reduce when G_pad isn't 8-aligned (rare chunks)
        ext_windowed = plan.windowed and G_pad % 8 == 0
        if plan.windowed and not ext_windowed:
            plan.windowed = False     # tables revert to absolute p2
        G2t = G_pad if (plan.windowed and G_pad % 8 == 0) \
            else -(-G_pad // 8) * 8
        p2_a, l2_a = ext_gather.build_group_tables(plan, G2t)
        base_d = jax.device_put(jnp.asarray(plan.base))
        p1_d = jax.device_put(jnp.asarray(plan.p1))
        l1_d = jax.device_put(jnp.asarray(plan.l1))
        p2_d = jax.device_put(jnp.asarray(p2_a))
        l2_d = jax.device_put(jnp.asarray(l2_a))
        s1_call = ext_gather.make_sorted_gather(
            plan.n_groups, plan.n1p_blocks, plan.R, dtype, interpret)
        if ext_windowed:
            s2_call = ext_gather.make_resident_window_gather(
                G_pad // 8, plan.r_hot, plan.H_pad, dtype, interpret)
            b8_d = jax.device_put(jnp.asarray(
                ext_gather.build_base8(plan, G_pad)))
        else:
            # the ranked gather emits 8-group blocks: pad the output
            # group count and slice back (G_pad isn't 8-aligned for
            # chunks that aren't multiples of 8)
            G2 = -(-G_pad // 8) * 8
            s2_call = ext_gather.make_ranked_gather(
                plan.H, G2, dtype, interpret)
        n1 = plan.n1p_blocks * plan.R * BC
        pad_h = plan.H_pad - plan.H

        NI = len(idx_ds)         # idx stream count (1, or 2 with idx8)
        if ext_windowed:
            def ell_raw(x, vals, *rest):
                idxs, (hot_i, base, p1, l1, p2, l2, b8, *dw) = \
                    rest[:NI], rest[NI:]
                xf = x.astype(dtype)
                xp = jnp.zeros((P_pad * BC,), dtype)
                xp = xp.at[loc_w:loc_w + n_local].set(xf[:n_local])
                x1 = jnp.zeros((n1,), dtype).at[:n].set(xf)
                hot = s1_call(base, x1.reshape(-1, BC), p1, l1)
                if pad_h > 0:
                    hot = jnp.pad(hot, ((0, pad_h), (0, 0)))
                elif pad_h < 0:
                    hot = hot[:plan.H_pad]
                extp = s2_call(b8, hot, p2, l2)
                y = call(*dw, xp.reshape(P_pad + Hs, BC), vals, *idxs,
                         extp)
                return y.reshape(-1)[:m]

            ell_args = (vals_d, *idx_ds, hot_d, base_d, p1_d, l1_d,
                        p2_d, l2_d, b8_d) + pre
        else:
            def ell_raw(x, vals, *rest):
                idxs, (hot_i, base, p1, l1, p2, l2, *dw) = \
                    rest[:NI], rest[NI:]
                xf = x.astype(dtype)
                xp = jnp.zeros((P_pad * BC,), dtype)
                xp = xp.at[loc_w:loc_w + n_local].set(xf[:n_local])
                x1 = jnp.zeros((n1,), dtype).at[:n].set(xf)
                hot = s1_call(base, x1.reshape(-1, BC), p1, l1)
                extp = s2_call(hot, p2, l2)[:G_pad]
                y = call(*dw, xp.reshape(P_pad + Hs, BC), vals, *idxs,
                         extp)
                return y.reshape(-1)[:m]

            ell_args = (vals_d, *idx_ds, hot_d, base_d, p1_d, l1_d,
                        p2_d, l2_d) + pre
    else:
        NI = len(idx_ds)
        def ell_raw(x, vals, *rest):
            idxs, (hot_i, *dw) = rest[:NI], rest[NI:]
            xf = x.astype(dtype)
            xp = jnp.zeros((P_pad * BC,), dtype)
            xp = xp.at[loc_w:loc_w + n_local].set(xf[:n_local])
            if Hs:
                xh = jnp.take(xf, hot_i, mode="fill", fill_value=0)
                xp = jnp.concatenate([xp, xh.astype(dtype)])
            y = call(*dw, xp.reshape(P_pad + Hs, BC), vals, *idxs)
            return y.reshape(-1)[:m]

        ell_args = (vals_d, *idx_ds, hot_d) + pre

    # ---- CSR tail ----------------------------------------------------
    # Tiny tails (demotion remainders, a few k nnz) CANNOT go through a
    # full device strategy: every registered kernel's grid scales with
    # m (measured: a 2.4k-nnz PELL tail on the 377k-row flagship costs
    # 1.75 ms — 5x the core kernel). Instead, compact the tail's
    # active rows and run an XLA segment-sum over just tail_nnz
    # entries + a unique-index scatter-add back: cost is O(tail_nnz +
    # |active rows|), near-scalar but tiny.
    tail_prep = None
    tail_hbm = 0
    tail_kind_used = tail_strategy
    n_ell = len(ell_args)
    tail_nnz = int(np.sum(~take)) if nnz else 0
    if "notail" in diag:        # diag-only: results invalid, core cost
        tail_nnz = 0
    chips_meta = None
    if tail_nnz:
        tm = ~take
        trows, tcols, tvals = rows[tm], cols[tm], A.as_[tm]
        R = np.unique(trows)
        # Chips tail first (ops/chips_tail.py): 128-lane chips with
        # two-stage Pallas x gather + MXU one-hot row reduction — the
        # CUDA-k3 block-per-row analog. Preferred whenever the tail is
        # big enough to beat the XLA compact path's fixed cost and the
        # dedup'd columns fit the resident-hot / VPU budgets.
        plan_c = None
        if tail_nnz >= 2048 and "nochips" not in diag:
            from spmv_scpa_tpu.ops import chips_tail
            plan_c = chips_tail.plan_chips(trows, tcols, tvals, m, n)
            if (plan_c is not None and tail_nnz > BIG_TAIL
                    and "forcechips" not in diag
                    and isinstance(plan_c, chips_tail.SplitChipsPlan)):
                # Split-mode chips pay O(entries x window) one-hot
                # gathers — measured 1.67 ms for the webbase
                # archetype's 851k-entry tail, vs ~0.13 ms for the
                # same shape (31k rows, scattered cols) as a
                # compacted-row PELL problem (the powerlaw archetype
                # IS this shape: 12.5 GF/s). Route huge split tails
                # to the compacted delegation below.
                plan_c = None
        if plan_c is not None:
            from spmv_scpa_tpu.ops import chips_tail
            c_raw, c_args, tail_hbm = chips_tail.prepare_chips(
                plan_c, n, dtype, interpret)
            tail_kind_used = "chips"
            # heavy-row landing: zero-scatter panel merge when the
            # tables fit, scalar scatter otherwise — the same composed
            # step as the standalone strategy (chips_tail.make_landing)
            land, margs, mg, extra = chips_tail.make_landing(
                plan_c.heavy_ids, m, G_pad, dtype, interpret)
            tail_hbm += extra
            if isinstance(plan_c, chips_tail.SplitChipsPlan):
                chips_meta = {
                    "heavy_rows": plan_c.NH, "split": True,
                    "panel_merge": mg,
                    "windows": plan_c.num_windows,
                    "loc_entries": (plan_c.loc.n_entries
                                    if plan_c.loc else 0),
                    "far_entries": (plan_c.far.n_entries
                                    if plan_c.far else 0),
                    "cold_entries": (plan_c.cold.n_entries
                                     if plan_c.cold else 0),
                    "hot_h": tuple(s.H_pad
                                   for s in plan_c.streams)}
            else:
                chips_meta = {
                    "heavy_rows": plan_c.NH, "hot_h": plan_c.H,
                    "split": False, "panel_merge": mg,
                    "gather_groups": plan_c.n_groups,
                    "tile_rows": plan_c.E8,
                    "windows": plan_c.num_windows}

            n_c = n_ell + len(c_args)

            def raw(x, *a):
                y = ell_raw(x, *a[:n_ell])
                ys, hid = c_raw(x, *a[n_ell:n_c])
                return land(y, ys, hid, *a[n_c:])

            args = ell_args + c_args + margs
        elif tail_nnz <= tail_xla_max:
            seg_d = jax.device_put(jnp.asarray(
                np.searchsorted(R, trows), jnp.int32))
            tc_d = jax.device_put(jnp.asarray(tcols, jnp.int32))
            tv_d = jax.device_put(jnp.asarray(tvals, dtype))
            ridx_d = jax.device_put(jnp.asarray(R, jnp.int32))
            nseg = int(R.size)

            def raw(x, *a):
                y = ell_raw(x, *a[:n_ell])
                seg_i, tc, tv, ridx = a[n_ell:]
                yt = jax.ops.segment_sum(
                    tv * jnp.take(x.astype(dtype), tc), seg_i,
                    num_segments=nseg, indices_are_sorted=True)
                return y.at[ridx].add(
                    yt, mode="promise_in_bounds", unique_indices=True)

            args = ell_args + (seg_d, tc_d, tv_d, ridx_d)
            tail_hbm = tail_nnz * 12
        else:
            # Big tails with diagonal/hub locality recurse into the
            # hybrid itself (the residual is just another lane-ELL
            # problem; y's sum on device) — heavy rows shed Q slots
            # per level. Pure scatter residuals run PELL in the
            # COMPACTED row space (rows renumbered 0..NH-1): a full-m
            # sub-strategy pays O(m) grid work for a few active rows
            # (webbase archetype: 31k active tail rows in a 1M-row
            # space), while the compact problem is exactly the
            # powerlaw shape PELL row_sort handles at 12.5 GF/s; the
            # per-row sums land through the zero-scatter panel merge
            # (chips_tail.make_landing).
            ts = tail_strategy
            if ts == "auto":
                d = np.abs(tcols - trows)
                local = float(np.mean(d <= 4096)) if tail_nnz else 0.0
                ts = ("pallas-hybrid"
                      if depth < max_depth and local >= 0.4
                      else "pallas-pell")
            if ts == "pallas-hybrid":
                tail = CSR.from_coo(A.name + "_tail", m, n,
                                    trows, tcols, tvals)
                tail_prep = prepare_lane_ell_hybrid(
                    tail, dtype=dtype, interpret=interpret,
                    depth=depth + 1, max_depth=max_depth,
                    tail_xla_max=tail_xla_max, Prepared=Prepared)
                ts = f"hybrid-r{depth + 1}"
                t_raw, t_args = tail_prep.raw, tail_prep.args

                def raw(x, *a):
                    return ell_raw(x, *a[:n_ell]) + t_raw(x, *a[n_ell:])

                args = ell_args + tuple(t_args)
            else:
                from spmv_scpa_tpu.ops import chips_tail
                NH = int(R.size)
                tail = CSR.from_coo(A.name + "_tail", NH, n,
                                    np.searchsorted(R, trows),
                                    tcols, tvals)
                tail_prep = get_strategy(ts).prepare(
                    tail, dtype=dtype, interpret=interpret)
                ts = f"compact-{ts}"
                t_raw, t_args = tail_prep.raw, tail_prep.args
                land, margs, _mg, extra = chips_tail.make_landing(
                    R, m, G_pad, dtype, interpret)
                hid_d = jax.device_put(jnp.asarray(R, jnp.int32))
                n_t = n_ell + len(t_args)

                def raw(x, *a):
                    y = ell_raw(x, *a[:n_ell])
                    yt = t_raw(x, *a[n_ell:n_t])
                    return land(y, yt[:NH], a[n_t], *a[n_t + 1:])

                args = (ell_args + tuple(t_args) + (hid_d,)
                        + tuple(margs))
                tail_hbm = extra
            tail_kind_used = ts
            tail_hbm += tail_prep.hbm_bytes
    else:
        raw, args = ell_raw, ell_args

    hbm = steps * chunk * BC * slot_b + tail_hbm
    n_strip_ops = sum(len(u) for u in used_t)
    return Prepared(
        "pallas-hybrid", A.name, bind(raw, args), on_device=True,
        nnz=nnz, raw=raw, args=args, hbm_bytes=int(hbm),
        meta={"loc_w": loc_w, "slots": Q, "ov_slots": Qo,
              "hot_k": hot_k, "idx8_planes": n8,
              "ext": use_ext,
              "ext_h": plan.H if use_ext else 0,
              "ext_windowed": bool(use_ext and plan.windowed),
              "ext_r_hot": plan.r_hot if use_ext else 0,
              "ext_groups": plan.n_groups if use_ext else 0,
              "ext_cov": round(plan.covered, 4) if use_ext else None,
              "strips": S, "hot_strips": Hs, "chunk": chunk,
              "steps": steps, "strip_ops": n_strip_ops,
              "dyn_planes": len(dyn_k_of),
              "dyn_k": max(dyn_k_of.values(), default=0),
              "demoted": n_demoted, "relocated": n_reloc,
              "ov_nnz": n_ov_nnz,
              "fill": float(np.sum(take)) / max(G_pad * QT * BC, 1),
              "tail_nnz": tail_nnz,
              "tail_kind": (None if not tail_nnz else
                            "chips" if chips_meta is not None else
                            "xla-compact" if tail_prep is None
                            else tail_kind_used),
              "tail_meta": (chips_meta if chips_meta is not None
                            else tail_prep.meta
                            if tail_prep is not None else None),
              "tail_frac": tail_nnz / max(nnz, 1)})
