#!/usr/bin/env python
"""Fetch the 30-matrix SuiteSparse benchmark suite — the
scripts/download-matrices.py analog (reference: download-matrices.py:7-38).

Downloads each matrix's .tar.gz from sparse.tamu.edu, extracts exactly
the main .mtx file into the target dir. Requires network egress (absent
in some sandboxes — use ``synth:`` matrix specs there, scripts/results.py
--synth-suite).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile
import urllib.request

BASE = "https://suitesparse-collection-website.engr.tamu.edu/MM"

# group/name pairs of the reference suite (download-matrices.py:7-38)
MATRICES = [
    ("vanHeukelum", "cage4"),
    ("Bai", "mhda416"),
    ("HB", "mcfe"),
    ("Bai", "olm1000"),
    ("Sandia", "adder_dcop_32"),
    ("HB", "west2021"),
    ("DRIVCAV", "cavity10"),
    ("Zitney", "rdist2"),
    ("Williams", "cant"),
    ("Simon", "olafu"),
    ("Janna", "Cube_Coup_dt0"),
    ("Janna", "ML_Laplace"),
    ("HB", "bcsstk17"),
    ("Williams", "mac_econ_fwd500"),
    ("Bai", "mhd4800a"),
    ("Williams", "cop20k_A"),
    ("Simon", "raefsky2"),
    ("Bai", "af23560"),
    ("Norris", "lung2"),
    ("Fluorem", "PR02R"),
    ("Botonakis", "FEM_3D_thermal1"),
    ("Schmid", "thermal1"),
    ("Schmid", "thermal2"),
    ("Botonakis", "thermomech_TK"),
    ("Schenk", "nlpkkt80"),
    ("Williams", "webbase-1M"),
    ("IBM_EDA", "dc1"),
    ("SNAP", "amazon0302"),
    ("Schenk_AFE", "af_1_k101"),
    ("SNAP", "roadNet-PA"),
]


def download_extract_exact_mtx(group: str, name: str, out_dir: str) -> str:
    """Fetch <group>/<name>.tar.gz and extract <name>/<name>.mtx."""
    dest = os.path.join(out_dir, f"{name}.mtx")
    if os.path.exists(dest):
        print(f"  {name}: already present")
        return dest
    url = f"{BASE}/{group}/{name}.tar.gz"
    print(f"  {name}: fetching {url}")
    with urllib.request.urlopen(url, timeout=120) as resp:
        data = resp.read()
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tar:
        want = f"{name}/{name}.mtx"
        member = tar.getmember(want)
        with tar.extractfile(member) as src, open(dest, "wb") as dst:
            dst.write(src.read())
    return dest


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--out", default="matrices",
                    help="destination directory")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of matrix names")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    only = set(args.only.split(",")) if args.only else None
    failures = []
    for group, name in MATRICES:
        if only and name not in only:
            continue
        try:
            download_extract_exact_mtx(group, name, args.out)
        except Exception as e:
            print(f"  {name}: FAILED {e}", file=sys.stderr)
            failures.append(name)
    if failures:
        print(f"failed: {failures}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
