"""Test configuration: force JAX onto a CPU backend with 8 virtual
devices so the multi-chip sharding paths run without TPUs (the standard
JAX answer to testing distributed code, SURVEY.md section 4).

Must run before any ``import jax`` materializes a backend.
"""

import os

# 8 virtual CPU devices for mesh tests. Note: the environment may force
# a TPU plugin into every process (axon sitecustomize ignores
# JAX_PLATFORMS overrides), so we pin the default *device* to CPU below
# instead of trying to hide the TPU platform.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from spmv_scpa_tpu import testing as synth  # noqa: E402

# Two-tier suite: interpret-mode Pallas kernels on CPU are slow (the
# full suite is ~20 min on a 1-core box). The heavy cases carry a
# ``slow`` marker so `pytest -q -m "not slow"` is a <3-min sanity tier;
# CI/judging runs the full suite. Tiers are assigned centrally here
# (measured via --durations) instead of scattering decorators.
_SLOW_FILES = (
    "test_lane_ell.py",
    "test_distributed.py",
    "test_chips_tail.py",
    "test_round3_mechanisms.py",
)
_SLOW_PREFIXES = (
    "test_kernels.py::test_strategy_matches_oracle[pallas-",
    "test_kernels.py::test_empty_windows_regression[pallas-",
    "test_kernels.py::test_empty_rows_and_cols",
    "test_kernels.py::test_pell_df64_fused_matches_oracle_tight",
    "test_kernels.py::test_pell_superpanel_matches_oracle",
    "test_kernels.py::test_spmm_",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("/")[-1]
        if name.split("::")[0] in _SLOW_FILES or \
                any(name.startswith(p) for p in _SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def matrices():
    """A small zoo spanning the structural archetypes."""
    return [
        synth.tiny_fixture_csr(),
        synth.diag_csr(37),
        synth.banded_csr(256, row_nnz=9, bandwidth=40, seed=1),
        synth.banded_csr(300, 200, row_nnz=7, bandwidth=64, seed=2),
        synth.random_csr(200, 300, density=0.02, seed=3),
        synth.powerlaw_csr(400, 400, seed=4),
        synth.amazon_csr(m=3000, seed=6),
    ]


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
