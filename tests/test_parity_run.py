"""Parity runbook CI: the one-command golden-parity path must stay
drivable even while the real assets (MSRVTT features, published .pth,
bert-base-cased vocab) are absent from the environment.

Target numbers when assets exist: /root/reference/README.md:77-91
(BASELINE.md); the dry run rehearses the identical convert -> eval ->
diff -> report path on a synthetic corpus + synthetic reference-style
.pth checkpoint.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

pytest.importorskip("torch")

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(args, tmp_path):
  env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
  return subprocess.run(
      [sys.executable, "scripts/parity_run.py", *args],
      env=env, cwd=REPO, text=True, capture_output=True, timeout=900)


def test_parity_check_reports_missing_assets(tmp_path):
  proc = _run(["--check", "--data_root", str(tmp_path / "nope"),
               "--checkpoint", str(tmp_path / "nope.pth"),
               "--vocab", str(tmp_path / "nope.txt")], tmp_path)
  assert proc.returncode == 2, proc.stdout + proc.stderr
  assert "MISSING" in proc.stdout


def test_parity_dry_run_end_to_end(tmp_path):
  out = tmp_path / "dry"
  proc = _run(["--dry_run", "--out_dir", str(out)], tmp_path)
  assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
  report = json.loads((out / "exps" / "parity_report.json").read_text())
  assert report["status"] == "PASS"
  assert set(report["metrics"]) >= {"t2v_metrics/R1", "v2t_metrics/MeanR"}
  # The real-assets gates are wired (present in the script, empty in dry
  # mode so synthetic weights don't fail them).
  assert (out / "exps" / "converted.msgpack").exists()
  assert (out / "exps" / "exp_results.json").exists()
