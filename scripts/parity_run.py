#!/usr/bin/env python
"""One-command golden-number parity vs the published reference checkpoints.

The reference publishes retrieval metrics for its released MSRVTT
checkpoints (/root/reference/README.md:77-91); this script turns "do we
match them" into a single command once the real assets exist:

  # 1. see what is present / missing (exit 0 = ready, 2 = missing)
  python scripts/parity_run.py --check

  # 2. full parity run (convert .pth -> msgpack -> --only_eval -> diff)
  python scripts/parity_run.py --run

  # 3. CI-able rehearsal of the identical path on a synthetic corpus +
  #    synthetic reference-style .pth (no real assets needed)
  python scripts/parity_run.py --dry_run

Assets (defaults under data/, override with flags):
  * MSRVTT expert features  -> --data_root  (data/MSRVTT/symlinked-feats)
  * MSRVTT_jsfusion_trainval.pth -> --checkpoint
  * bert-base-cased vocab.txt -> --vocab (also searched in the local
    HuggingFace cache; copied to data/bert-base-cased-vocab.txt)

Integrity: data/parity_manifest.json pins sha256 digests.  Hashes start
unpinned (this environment has no network to fetch canonical assets);
the first successful --check/--run with --pin records them, and every
later run verifies — trust-on-first-use, drift-detected-thereafter.

Pass criteria (BASELINE.md "Rebuild targets"): t2v R@1 >= 24.0 and
t2v R@5 >= 56.0 on MSRVTT jsfusion with the converted ECCV20 checkpoint;
the report also tabulates every published metric with its delta.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
DATA = REPO / "data"
MANIFEST = DATA / "parity_manifest.json"
DEFAULT_CONFIG = REPO / "configs" / "eccv20" / "msrvtt_jsfusion_trainval.json"

# /root/reference/README.md:77-91 (MSRVTT_jsfusion_trainval.pth).
PUBLISHED = {
    "t2v_metrics/R1": 24.1, "t2v_metrics/R5": 56.4,
    "t2v_metrics/R10": 69.6, "t2v_metrics/R50": 90.4,
    "t2v_metrics/MedR": 4.0, "t2v_metrics/MeanR": 25.797,
    "v2t_metrics/R1": 25.9, "v2t_metrics/R5": 58.1,
    "v2t_metrics/R10": 69.3, "v2t_metrics/R50": 90.8,
    "v2t_metrics/MedR": 4.0, "v2t_metrics/MeanR": 22.852,
}
HARD_GATES = {"t2v_metrics/R1": 24.0, "t2v_metrics/R5": 56.0}
BERT_VOCAB_LINES = 28996  # bert-base-cased (utils/nlp_utils.py:19-42)


def sha256_of(path: pathlib.Path) -> str:
  h = hashlib.sha256()
  with open(path, "rb") as f:
    while chunk := f.read(1 << 20):
      h.update(chunk)
  return h.hexdigest()


def load_manifest() -> dict:
  if MANIFEST.exists():
    return json.loads(MANIFEST.read_text())
  return {}


def save_manifest(m: dict) -> None:
  DATA.mkdir(parents=True, exist_ok=True)
  MANIFEST.write_text(json.dumps(m, indent=2, sort_keys=True) + "\n")


def find_vocab(explicit: str | None) -> pathlib.Path | None:
  """Locate a bert-base-cased vocab.txt: explicit flag, env, repo
  default, then the local HuggingFace cache (the reference downloads it
  from there at runtime, utils/nlp_utils.py:19-42)."""
  candidates = []
  if explicit:
    candidates.append(pathlib.Path(explicit))
  if os.environ.get("MMT_TPU_BERT_VOCAB"):
    candidates.append(pathlib.Path(os.environ["MMT_TPU_BERT_VOCAB"]))
  candidates.append(DATA / "bert-base-cased-vocab.txt")
  hf_home = pathlib.Path(os.environ.get("HF_HOME",
                                        pathlib.Path.home()
                                        / ".cache" / "huggingface"))
  if hf_home.exists():
    candidates.extend(p for p in hf_home.rglob("vocab.txt")
                      if "bert-base-cased" in str(p))
  for cand in candidates:
    if cand.is_file():
      n = sum(1 for _ in open(cand, encoding="utf-8"))
      if n == BERT_VOCAB_LINES:
        return cand
      print(f"  [vocab] {cand}: {n} lines != {BERT_VOCAB_LINES}, skipping")
  return None


def install_vocab(src: pathlib.Path) -> pathlib.Path:
  dst = DATA / "bert-base-cased-vocab.txt"
  if src.resolve() != dst.resolve():
    DATA.mkdir(parents=True, exist_ok=True)
    dst.write_bytes(src.read_bytes())
    print(f"  [vocab] installed {src} -> {dst}")
  return dst


def check_assets(args, verbose=True):
  """Returns (ok: bool, found: dict of name -> path|None)."""
  manifest = load_manifest()
  found, ok = {}, True

  def note(name, path, detail=""):
    nonlocal ok
    status = "OK " if path else "MISSING"
    if verbose:
      print(f"  [{status}] {name}: {path or detail}")
    found[name] = path
    if path is None:
      ok = False

  vocab = find_vocab(args.vocab)
  note("bert-base-cased vocab", vocab,
       f"place at {DATA / 'bert-base-cased-vocab.txt'} "
       f"({BERT_VOCAB_LINES} lines)")

  ckpt = pathlib.Path(args.checkpoint) if args.checkpoint else \
      DATA / "MSRVTT_jsfusion_trainval.pth"
  note("reference checkpoint (.pth)", ckpt if ckpt.is_file() else None,
       f"place at {ckpt}")

  data_root = pathlib.Path(args.data_root) if args.data_root else \
      DATA / "MSRVTT" / "symlinked-feats"
  has_feats = data_root.is_dir() and any(data_root.iterdir())
  note("MSRVTT expert features", data_root if has_feats else None,
       f"place under {data_root} (layout: docs/DATA.md)")

  # Pretrained text-BERT init (scripts/convert_hf_bert.py output).  The
  # eval parity run loads a full .pth (txt_bert included), so this is
  # OPTIONAL for --run — but TRAINING parity (from-scratch reproduction,
  # reference model/model.py:161-162 from_pretrained) requires it.
  init = DATA / "txt_bert_init.msgpack"
  status = "OK " if init.is_file() else "OPT"
  if verbose:
    print(f"  [{status}] txt_bert pretrained init (training parity only): "
          f"{init if init.is_file() else f'convert with scripts/convert_hf_bert.py -> {init}'}")
  found["txt_bert_init"] = init if init.is_file() else None

  # Hash verification / pinning for the file assets.
  for name, path in (("bert-base-cased-vocab.txt", vocab),
                     ("txt_bert_init.msgpack",
                      init if init.is_file() else None),
                     (ckpt.name if ckpt else "",
                      ckpt if ckpt and ckpt.is_file() else None)):
    if not path:
      continue
    digest = sha256_of(path)
    pinned = manifest.get(name, {}).get("sha256")
    if pinned and pinned != digest:
      print(f"  [FAIL] {name}: sha256 {digest[:16]}... != pinned "
            f"{pinned[:16]}... (asset drift!)")
      ok = False
    elif not pinned and args.pin:
      manifest.setdefault(name, {})["sha256"] = digest
      print(f"  [pin] {name}: sha256 {digest[:16]}... recorded")
  if args.pin:
    save_manifest(manifest)
  return ok, {"vocab": vocab, "checkpoint": ckpt if ckpt.is_file() else None,
              "data_root": data_root if has_feats else None,
              "txt_bert_init": init if init.is_file() else None}


def _rewrite_config(config_path, data_root, out_dir) -> pathlib.Path:
  cfg = json.loads(pathlib.Path(config_path).read_text())
  for key in ("train_sets", "continuous_eval_sets", "final_eval_sets"):
    for entry in cfg.get(key, []):
      for mix in entry.get("args", {}).get("mix", []):
        mix["data_dir"] = str(data_root)
  cfg.setdefault("trainer", {})["save_dir"] = str(out_dir)
  out_dir.mkdir(parents=True, exist_ok=True)
  dst = out_dir / "parity_config.json"
  dst.write_text(json.dumps(cfg, indent=2))
  return dst


def _eval_and_report(cfg_path, ckpt_path, out_dir, gates=HARD_GATES,
                     published=PUBLISHED, env=None):
  """convert -> --only_eval -> diff -> parity_report.json; returns ok."""
  env = dict(env or os.environ)
  env.setdefault("PYTHONPATH",
                 f"{REPO}:{env.get('PYTHONPATH', '')}".rstrip(":"))

  out_dir.mkdir(parents=True, exist_ok=True)
  converted = out_dir / "converted.msgpack"
  steps = []
  run = lambda cmd: subprocess.run(cmd, env=env, cwd=REPO, text=True,
                                   capture_output=True)

  print("  [1/3] converting checkpoint ...")
  proc = run([sys.executable, "scripts/convert_checkpoint.py",
              "--config", str(cfg_path), "--checkpoint", str(ckpt_path),
              "--out", str(converted)])
  steps.append({"step": "convert", "rc": proc.returncode})
  if proc.returncode:
    print(proc.stdout[-2000:] + proc.stderr[-2000:])
    return False, {"steps": steps}

  print("  [2/3] running --only_eval ...")
  proc = run([sys.executable, "train.py", "--config", str(cfg_path),
              "--only_eval", "--load_checkpoint", str(converted)])
  steps.append({"step": "only_eval", "rc": proc.returncode})
  if proc.returncode:
    print(proc.stdout[-2000:] + proc.stderr[-2000:])
    return False, {"steps": steps}

  print("  [3/3] diffing metrics ...")
  results = json.loads((out_dir / "exp_results.json").read_text())
  perfs = next(iter(results["perfs"].values()))  # single final-eval set

  def lookup(key):
    for suffix in ("/final_eval", ""):
      if key + suffix in perfs:
        return float(perfs[key + suffix])
    mt, mn = key.split("/")
    return float(perfs.get(mt, {}).get(mn, float("nan")))

  table, ok = {}, True
  for key, ref in published.items():
    got = lookup(key)
    delta = got - ref
    gate = gates.get(key)
    passed = (got >= gate) if gate is not None else None
    if passed is False:
      ok = False
    table[key] = {"ours": got, "published": ref,
                  "delta": round(delta, 3), "gate": gate, "pass": passed}
  report = {"status": "PASS" if ok else "FAIL", "metrics": table,
            "checkpoint": str(ckpt_path), "config": str(cfg_path),
            "steps": steps}
  (out_dir / "parity_report.json").write_text(json.dumps(report, indent=2))
  print(f"  report: {out_dir / 'parity_report.json'}")
  for key, row in table.items():
    mark = {True: "PASS", False: "FAIL", None: "    "}[row["pass"]]
    print(f"  [{mark}] {key:24s} ours={row['ours']:8.3f} "
          f"published={row['published']:8.3f} delta={row['delta']:+7.3f}")
  return ok, report


def run_parity(args) -> int:
  ok, assets = check_assets(args)
  if not ok:
    print("parity: assets missing — see above (docs/PARITY.md)")
    return 2
  install_vocab(assets["vocab"])
  out_dir = pathlib.Path(args.out_dir or (REPO / "exps" / "parity"))
  cfg_path = _rewrite_config(args.config, assets["data_root"], out_dir)
  ok, _ = _eval_and_report(cfg_path, assets["checkpoint"], out_dir)
  print(f"parity: {'PASS' if ok else 'FAIL'}")
  return 0 if ok else 1


def dry_run(args) -> int:
  """Rehearse the exact convert->eval->diff path on synthetic assets."""
  import tempfile

  import numpy as np

  sys.path.insert(0, str(REPO))
  sys.path.insert(0, str(REPO / "tests"))
  try:
    import torch  # noqa: F401
  except ImportError:
    print("dry_run requires torch (to write the synthetic .pth)")
    return 3
  import torch
  from mmt_tpu.data import synthetic
  from test_converter_e2e import make_reference_style_state_dict
  from test_train_e2e import make_config

  tmp = pathlib.Path(args.out_dir or tempfile.mkdtemp(prefix="parity_dry_"))
  tmp.mkdir(parents=True, exist_ok=True)
  print(f"dry run workspace: {tmp}")
  data_dir = synthetic.generate(tmp, num_videos=10, num_test=4,
                                experts={"rgb": 2048, "s3d": 1024})
  os.environ["MMT_TPU_BERT_VOCAB"] = str(tmp / "vocab.txt")

  from mmt_tpu.tokenization import WordPieceTokenizer
  vocab = WordPieceTokenizer(tmp / "vocab.txt").vocab_size

  out_dir = tmp / "exps"
  cfg = make_config(tmp, data_dir, out_dir)
  cfg["arch"]["args"]["text_bert_geometry"]["vocab_size"] = vocab
  cfg_path = tmp / "parity_config.json"
  cfg_path.write_text(json.dumps(cfg))

  rng = np.random.RandomState(0)
  sd = make_reference_style_state_dict(rng, vocab=vocab)
  pth = tmp / "synthetic_ref.pth"
  torch.save({"arch": "CENet", "epoch": 7, "state_dict": sd,
              "monitor_best": 0.0, "config": {}}, pth)

  env = dict(os.environ)
  env["PYTHONPATH"] = f"{REPO}:{REPO / 'tests'}"
  # Synthetic weights have no published numbers: gate only on the
  # machinery (finite metrics, report written).
  ok, report = _eval_and_report(cfg_path, pth, out_dir, gates={},
                                published=PUBLISHED, env=env)
  finite = all(np.isfinite(row["ours"]) for row in
               report.get("metrics", {}).values())
  if ok and finite and report.get("status") == "PASS":
    print("dry run: PASS (full parity path exercised end-to-end)")
    return 0
  print("dry run: FAIL")
  return 1


def main(argv=None) -> int:
  parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
  parser.add_argument("--check", action="store_true",
                      help="verify assets + manifest and exit")
  parser.add_argument("--run", action="store_true",
                      help="full parity run against real assets")
  parser.add_argument("--dry_run", action="store_true",
                      help="synthetic end-to-end rehearsal (CI-able)")
  parser.add_argument("--pin", action="store_true",
                      help="record unpinned asset hashes into the manifest")
  parser.add_argument("--config", default=str(DEFAULT_CONFIG))
  parser.add_argument("--checkpoint", default=None,
                      help=".pth path (default data/MSRVTT_jsfusion_trainval.pth)")
  parser.add_argument("--data_root", default=None,
                      help="MSRVTT features dir (default data/MSRVTT/symlinked-feats)")
  parser.add_argument("--vocab", default=None,
                      help="bert-base-cased vocab.txt path")
  parser.add_argument("--out_dir", default=None)
  args = parser.parse_args(argv)

  if args.dry_run:
    return dry_run(args)
  if args.run:
    return run_parity(args)
  ok, _ = check_assets(args)
  print(f"parity assets: {'READY' if ok else 'MISSING'}")
  return 0 if ok else 2


if __name__ == "__main__":
  raise SystemExit(main())
