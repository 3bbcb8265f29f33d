"""Smoke tests for the benchmark harnesses (tiny sizes, CPU backend).

Protects the driver's `python bench.py` entry point from code drift: the
full workload runs on the TPU, but the program structure — engine wiring,
serve protocol, accuracy check, the single-JSON-line contract — is
identical at the small sizes forced via SCL_BENCH_SIZES.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_prints_one_json_line():
    env = dict(os.environ)
    env["SCL_BENCH_SIZES"] = "120,80,400,300"
    env["SCL_TPU_CACHE_DIR"] = "/tmp/scl_bench_test_cache"
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import runpy, sys; sys.argv=['bench.py','auto','3'];"
         "runpy.run_path('bench.py', run_name='__main__')"],
        cwd=REPO, capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout
    data = json.loads(lines[0])
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in data
    assert data["value"] > 0
    assert data["extras"]["accuracy_300x194_diff_max"] <= 1
    # the shipped default is "auto"; at the tiny smoke size it must resolve
    # to the direct solver, and the layout-heal regression bit must exist
    assert data["extras"]["solver_resolved"] == "dst_gemm"
    assert data["extras"]["serve_layout_heal_fired"] is False
