"""Smoke test for scripts/run_matrix.py — the judge-facing strategy
runner must keep working end to end (argument parsing, rendering,
cross-check, JSON artifact), not just the library underneath it.

Runs two strategies at a tiny size via RUN_MATRIX_STRATEGIES; the five-
strategy full-size run with --golden is the on-chip artifact
(RUN_MATRIX_r05.json)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_matrix_smoke(tmp_path):
    out = tmp_path / "out"
    js = tmp_path / "rm.json"
    env = dict(os.environ)
    env["RUN_MATRIX_STRATEGIES"] = "sequential,ispc"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_matrix.py"),
         "--out", str(out), "--size", "48x36", "--json", str(js)],
        capture_output=True, text=True, env=env, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rec = json.loads(js.read_text())
    assert rec["all_match"] is True
    assert {s["strategy"] for s in rec["strategies"]} == {"sequential", "ispc"}
    for s in rec["strategies"]:
        assert s["steady_ms"] > 0
    assert (out / "outputsequential.ppm").exists()
    assert (out / "outputispc.ppm").exists()
