#!/usr/bin/env python
"""Profile the benchmark programs and print a device-time breakdown.

This is the checked-in version of the recipe that produced the
docs/PERF.md numbers: run the EXACT jitted program bench.py times under
``jax.profiler.trace``, then post-process the captured xspace with
xprof's ``hlo_stats`` tool and roll HLO ops up into readable categories
(Pallas kernels, matmul fusions, elementwise fusions, copies, ...).

Works over the axon remote-dispatch tunnel (the trace captures device
self-times from the remote chip's runtime).

Usage (serialize with other TPU jobs — the tunnel serves ONE process):
  python scripts/profile_eval.py                 # eval program
  python scripts/profile_eval.py --mode train    # train step (batch 32)
  python scripts/profile_eval.py --top 40        # more rows
  python scripts/profile_eval.py --csv out.csv   # full table for diffing

No reference-file analogue: the torch reference has no profiling story
beyond wall-clock timers (/root/reference/utils/util.py Timer); this is
TPU-native observability built on jax.profiler + xprof.
"""

from __future__ import annotations

import argparse
import collections
import csv
import glob
import io
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _capture(mode: str, logdir: str, reps: int) -> None:
  import jax

  import bench

  if mode == "eval":
    run_eval, _, _, _ = bench.build_full_eval()
    run_eval()  # compile outside the trace
    with jax.profiler.trace(logdir):
      for _ in range(reps):
        run_eval()
  elif mode == "train":
    import jax.numpy as jnp
    with jax.profiler.trace(logdir):
      # _bench_train_step compiles then chains 20 donated steps; the
      # compile lands inside the trace but compile time is host-side
      # and does not pollute device self-times.
      bench._bench_train_step(jax, jnp)
  else:
    raise SystemExit(f"unknown --mode {mode!r}")


def _hlo_stats_rows(logdir: str):
  """Return (header, rows) from xprof's hlo_stats over the trace."""
  from xprof.convert import raw_to_tool_data

  xspaces = sorted(glob.glob(
      os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
  if not xspaces:
    raise SystemExit(f"no .xplane.pb under {logdir} — did the trace run?")
  data, _ = raw_to_tool_data.xspace_to_tool_data(xspaces, "hlo_stats", {})
  if isinstance(data, bytes):
    data = data.decode("utf-8", "replace")
  # The tool ships gviz: either a JSON DataTable or CSV depending on
  # xprof version; handle both.
  text = data.strip()
  if text.startswith("{") or text.startswith("["):
    table = json.loads(text)
    header = [c["label"] or c.get("id", "") for c in table["cols"]]
    rows = [[(cell or {}).get("v") for cell in r["c"]] for r in table["rows"]]
  else:
    reader = csv.reader(io.StringIO(text))
    all_rows = list(reader)
    header, rows = all_rows[0], all_rows[1:]
  return header, rows


_CATEGORY_PATTERNS = [
    ("pallas ffn", re.compile(r"ffn|mosaic.*(ffn|gelu)", re.I)),
    ("pallas similarity/rank", re.compile(r"moe_sim|rank|similarity", re.I)),
    ("convolution/matmul", re.compile(r"convolution|dot|matmul|gemm", re.I)),
    ("copy", re.compile(r"copy", re.I)),
    ("data formatting", re.compile(
        r"reshape|transpose|bitcast|concatenate|slice|pad|gather|scatter",
        re.I)),
]


def _category(op_name: str, op_category: str) -> str:
  for label, pat in _CATEGORY_PATTERNS:
    if pat.search(op_name) or pat.search(op_category or ""):
      return label
  return op_category or "other"


def main() -> None:
  ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
  ap.add_argument("--mode", default="eval", choices=["eval", "train"])
  ap.add_argument("--reps", type=int, default=3,
                  help="eval repetitions inside the trace")
  ap.add_argument("--top", type=int, default=25, help="rows to print")
  ap.add_argument("--csv", default=None,
                  help="also dump the full hlo_stats table to this path")
  ap.add_argument("--logdir", default=None,
                  help="keep the raw trace here (default: temp dir)")
  args = ap.parse_args()

  logdir = args.logdir or tempfile.mkdtemp(prefix="mmt_tpu_profile_")
  _capture(args.mode, logdir, args.reps)
  header, rows = _hlo_stats_rows(logdir)

  if args.csv:
    with open(args.csv, "w", newline="") as fh:
      w = csv.writer(fh)
      w.writerow(header)
      w.writerows(rows)

  low = [h.lower() for h in header]

  def col(*names):
    for n in names:
      for i, h in enumerate(low):
        if n in h:
          return i
    return None

  i_name = col("hlo op name", "op name", "name")
  i_cat = col("hlo op category", "category")
  i_self = col("total self time (us)", "self time (us)", "self-time")
  i_occ = col("#occurrences", "occurrences", "count")
  if i_name is None or i_self is None:
    raise SystemExit(f"unrecognized hlo_stats schema: {header}")

  def fnum(v):
    try:
      return float(str(v).replace(",", ""))
    except (TypeError, ValueError):
      return 0.0

  parsed = []
  for r in rows:
    parsed.append({
        "name": str(r[i_name]),
        "category": str(r[i_cat]) if i_cat is not None else "",
        "self_us": fnum(r[i_self]),
        "occ": int(fnum(r[i_occ])) if i_occ is not None else 0,
    })
  parsed.sort(key=lambda d: -d["self_us"])
  total_us = sum(d["self_us"] for d in parsed)
  denom = args.reps if args.mode == "eval" else 21  # compile step + 20

  print(f"\n== {args.mode} profile: device self time "
        f"{total_us / 1e3:.1f} ms total / {args.reps if args.mode == 'eval' else 21}"
        f" program runs = {total_us / 1e3 / denom:.1f} ms per run ==")
  print(f"{'self ms/run':>12}  {'%':>5}  {'occ':>5}  op")
  for d in parsed[:args.top]:
    print(f"{d['self_us'] / 1e3 / denom:12.3f}  {100 * d['self_us'] / total_us:5.1f}"
          f"  {d['occ']:5d}  {d['name'][:90]}")

  rollup = collections.Counter()
  for d in parsed:
    rollup[_category(d["name"], d["category"])] += d["self_us"]
  print("\n== category rollup ==")
  for cat, us in rollup.most_common():
    print(f"{us / 1e3 / denom:12.3f}  {100 * us / total_us:5.1f}  {cat}")
  print(f"\n(raw trace: {logdir})")


if __name__ == "__main__":
  main()
