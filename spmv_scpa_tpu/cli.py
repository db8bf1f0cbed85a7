"""Command-line interface — the reference binary's flag surface.

Reference flags (main.c:35-64): ``-m/--matrix`` (path, required),
``-o/--out`` (results dir, required), ``-d/--debug`` (validate against
the serial golden), ``-b/--bench`` (parsed but dead in the reference —
here it actually filters strategies), ``-h/--help``.

Extensions (documented differences):

* ``-m synth:<archetype>:k=v,...`` generates a synthetic matrix
  (no-network environments; archetypes in spmv_scpa_tpu/testing.py).
* ``--chunks`` — the device tuning sweep (warps_per_block analog).
* ``--list-strategies``, ``--host-parallel``, ``--seed``.

Exit codes are errno-style like the reference's ERR_PTR convention
(err.h:10-12).
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

from spmv_scpa_tpu.errors import ConfigError, SpmvError


def parse_synth_spec(spec: str):
    """``synth:banded:m=1000,row_nnz=32,seed=1`` → CSR."""
    from spmv_scpa_tpu import testing as synth

    parts = spec.split(":")
    if len(parts) < 2 or parts[0] != "synth":
        raise ConfigError(f"bad synth spec {spec!r}")
    archetype = parts[1]
    if archetype not in synth.ARCHETYPES:
        raise ConfigError(
            f"unknown archetype {archetype!r}; have {sorted(synth.ARCHETYPES)}")
    kwargs = {}
    if len(parts) > 2 and parts[2]:
        for kv in parts[2].split(","):
            k, _, v = kv.partition("=")
            try:
                kwargs[k] = int(v)
            except ValueError:
                try:
                    kwargs[k] = float(v)   # handles 1e-3 etc.
                except ValueError:
                    raise ConfigError(
                        f"bad numeric value {v!r} in synth spec {spec!r}"
                    ) from None
    A = synth.ARCHETYPES[archetype](**kwargs)
    return A.with_name(f"{archetype}_" + "_".join(
        f"{k}{v}" for k, v in sorted(kwargs.items())))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="spmv_scpa_tpu",
        description="TPU-native SpMV benchmark suite "
                    "(CSR/HLL/BCSR/PELL x XLA/Pallas strategies)")
    p.add_argument("-m", "--matrix",
                   help=".mtx path or synth:<archetype>:k=v,...")
    p.add_argument("-o", "--out", help="results directory (CSV logs)")
    p.add_argument("-d", "--debug", action="store_true",
                   help="validate every result against the serial golden")
    p.add_argument("-b", "--bench", default=None,
                   help="comma-separated strategy filter "
                        "(dead flag in the reference, live here)")
    p.add_argument("--chunks", default="32,64,128,256",
                   help="device kernel tile-chunk sweep")
    p.add_argument("--quantum", type=int, default=None,
                   help="PELL slot quantum (8/16/32/64/128)")
    p.add_argument("--window-h", type=int, default=None,
                   help="epilogue window height in 8-row blocks")
    p.add_argument("--precision-passes", type=int, default=None,
                   help="bf16 MXU passes for f32 reduction (2 or 3)")
    p.add_argument("--idx8", action="store_true",
                   help="int8 index planes on <=2-strip hybrid planes "
                        "(slot bytes 6 -> 5; ops/lane_ell.py)")
    p.add_argument("--spmm-cols", default="0",
                   help="also benchmark multi-vector SpMM at these "
                        "widths (comma list, e.g. 8,32,64; 0 = off)")
    p.add_argument("--seed", type=int, default=42, help="x vector seed")
    p.add_argument("--distributed", action="store_true",
                   help="also benchmark the row-sharded distributed "
                        "path (strategy id 9)")
    p.add_argument("--host-parallel", action="store_true",
                   help="also run the native C++/OpenMP kernels swept "
                        "over thread counts -> omp.csv (falls back to "
                        "one XLA-on-CPU row if the toolchain is "
                        "missing)")
    p.add_argument("--no-cache", action="store_true",
                   help="disable the .npz preprocessed-layout cache "
                        "(the reference re-parses the .mtx every run, "
                        "csr.c:31-171; we cache by default)")
    p.add_argument("--print-result", type=int, default=0, metavar="N",
                   help="print the first N entries of each result "
                        "vector (reference: print_result_vector)")
    p.add_argument("--list-strategies", action="store_true")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(levelname)s %(name)s: %(message)s")

    from spmv_scpa_tpu.ops.registry import get_strategy, list_strategies

    if args.list_strategies:
        for name in list_strategies():
            s = get_strategy(name)
            print(f"{name:18s} fmt={s.fmt:5s} backend={s.backend:6s} "
                  f"ref={s.cite}")
        return 0

    if not args.matrix or not args.out:
        print("error: -m/--matrix and -o/--out are required "
              "(see --help)", file=sys.stderr)
        return 2

    try:
        if args.matrix.startswith("synth:"):
            A = parse_synth_spec(args.matrix)
        elif args.no_cache:
            from spmv_scpa_tpu.io.loader import load_csr
            A = load_csr(args.matrix)
        else:
            # default-on .npz layout cache: repeat sweeps skip the
            # parse entirely (SURVEY.md section 5 improvement over the
            # reference's per-run re-parse, csr.c:31-171)
            from spmv_scpa_tpu.io.cache import load_csr_cached
            A = load_csr_cached(args.matrix)
    except SpmvError as e:
        print(f"error loading matrix: {e}", file=sys.stderr)
        return e.code
    except OSError as e:
        print(f"error reading {args.matrix}: {e}", file=sys.stderr)
        return 1

    print(f"[{A.name}] {A.m} x {A.n}, nnz={A.nnz}")

    from spmv_scpa_tpu.bench.runner import RunConfig, run_benchmarks

    params = {}
    if args.quantum:
        params["quantum"] = args.quantum
    if args.window_h:
        params["window_h"] = args.window_h
    if args.precision_passes:
        params["precision_passes"] = args.precision_passes
    if args.idx8:
        params["idx8"] = True
    cfg = RunConfig(
        out_dir=args.out,
        debug=args.debug,
        strategies=args.bench.split(",") if args.bench else None,
        chunks=tuple(int(c) for c in args.chunks.split(",")),
        seed=args.seed,
        host_parallel=args.host_parallel,
        params=params,
        spmm_cols=tuple(c for c in
                        (int(s) for s in str(args.spmm_cols).split(","))
                        if c > 0),
        distributed=args.distributed,
    )
    try:
        results = run_benchmarks(A, cfg)
    except SpmvError as e:
        print(f"benchmark failed: {e}", file=sys.stderr)
        return e.code

    for r in results:
        err = "" if r.rel_err is None else f"  rel_err={r.rel_err:.2e}"
        chunk = "" if r.chunk is None else f" chunk={r.chunk}"
        print(f"  {r.strategy:18s}{chunk:10s} {r.bench.duration_ms:10.4f} ms"
              f" {r.bench.gflops:9.3f} GFLOPS{err}")
        if args.print_result and r.bench.data is not None:
            head = np.array2string(
                np.asarray(r.bench.data).ravel()[:args.print_result],
                precision=6, max_line_width=100)
            print(f"    y[:{args.print_result}] = {head}")
    if cfg.skipped:
        print(f"WARNING: {len(cfg.skipped)} strategy x chunk cell(s) "
              "produced no row:", file=sys.stderr)
        for name, chunk, why in cfg.skipped:
            print(f"  {name} (chunk={chunk}): {why}", file=sys.stderr)
    print(f"CSV logs appended under {cfg.out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
