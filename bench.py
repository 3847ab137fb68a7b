#!/usr/bin/env python
"""Headline benchmark: MSRVTT-scale 1k x 1k retrieval eval on one chip.

Measures the full on-device eval path of the flagship model (7-expert
CENet, 512-wide video BERT, bert-base-cased text tower — the
MSRVTT_jsfusion geometry): embed 1000 captions + 1000 videos, build the
fused MoE similarity matrix, compute tie-averaged t2v retrieval ranks.

North star (BASELINE.json / SURVEY.md §6): full 1k x 1k eval in < 1 s on
a v4-8 (4 chips) == 250 videos/s/chip.  vs_baseline = value / 250.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "videos/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N_VIDEOS = int(os.environ.get("BENCH_VIDEOS", "1000"))
# Per-chunk batch inside the single fused dispatch.  Swept on a v5e
# (docs/PERF.md): 50 beats 20/40/100/250/500/1000 — the video tower's
# fp32 softmax/LN working set stays VMEM-resident at 50.
BATCH = int(os.environ.get("BENCH_BATCH", "50"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
BASELINE_VIDEOS_PER_SEC_PER_CHIP = 250.0


def _staged_flagship(jax, jnp):
  """Flagship model + the staged n_chunks x BATCH device inputs shared by
  the single-dispatch and streaming benchmarks."""
  from __graft_entry__ import _flagship_model_and_batch
  from mmt_tpu.ops import ffn, similarity

  use_bf16 = os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
  use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
  use_pallas_ffn = os.environ.get("BENCH_PALLAS_FFN", "1") == "1"
  if use_pallas and jax.default_backend() == "tpu":
    similarity.use_pallas(True)
  if use_pallas_ffn and jax.default_backend() == "tpu":
    ffn.use_pallas(True)

  model, batch = _flagship_model_and_batch(
      batch_size=BATCH,
      compute_dtype=jnp.bfloat16 if use_bf16 else None)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)

  assert N_VIDEOS % BATCH == 0, (
      f"BENCH_VIDEOS ({N_VIDEOS}) must divide by BENCH_BATCH ({BATCH}); "
      "a truncated remainder would overstate throughput")
  n_chunks = N_VIDEOS // BATCH
  # The whole eval is ONE jitted program: scan the embed over n_chunks
  # DISTINCT chunks (distinct data defeats CSE — XLA dedupes identical
  # chunk computations), then fused similarity + on-device ranks.  One
  # dispatch and one host read total: through the remote-dispatch tunnel
  # a dispatch+sync round trip costs ~30 ms (measured; reported below),
  # and per-batch dispatching also prevents cross-chunk scheduling.
  rng = np.random.RandomState(1)
  stacked = jax.tree_util.tree_map(
      lambda leaf: np.stack([leaf] * n_chunks, 0), batch)
  stacked["token_ids"] = ((stacked["token_ids"] + rng.randint(
      1, 1000, size=(n_chunks, 1, 1, 1, 1))) % 28996).astype(np.int32)
  for mod in batch["features"]:
    stacked["features"][mod] = (
        stacked["features"][mod]
        + rng.randn(n_chunks, 1, 1, 1).astype(np.float32) * 0.01)
  device_batch = jax.device_put(stacked)
  if use_bf16:
    # Stage feature tensors as bf16: XLA's default-precision matmul
    # demotes fp32 dot operands to bf16 (one pass, RNE — verified
    # bitwise: precast x@w == fp32 x@w on this chip), so pre-casting at
    # staging keeps the identical arithmetic class while deleting ~2
    # ms/run of on-device convert ops and halving the features' HBM
    # footprint.  The recompiled program may re-tile the dots, which
    # reassociates the fp32 accumulation (~1e-6 relative output drift —
    # reassociation XLA never guaranteed stable anyway).  features_t
    # stays fp32 (tint position ids quantize through clip->int) and
    # features_ind stays fp32 (mask semantics).
    for key in ("features", "features_avgpool", "features_maxpool"):
      device_batch[key] = {m: v.astype(jnp.bfloat16)
                           for m, v in device_batch[key].items()}
  return model, variables, device_batch


def build_full_eval():
  """Build the fused 1k x 1k eval exactly as the benchmark runs it.

  Returns (run_eval, full_eval, variables, device_batch): run_eval() is
  the dispatch+sync closure main() times; full_eval is the underlying
  jitted program (shared with scripts/profile_eval.py so profiles
  measure the SAME program the benchmark reports).
  """
  import jax
  import jax.numpy as jnp

  from mmt_tpu.ops import ranking, similarity

  model, variables, device_batch = _staged_flagship(jax, jnp)

  @jax.jit
  def full_eval(variables, sb):
    def body(carry, b):
      out = model.apply(variables, b, train=False)
      bb, k, m, d = out["text_embds"].shape
      return carry, (out["text_embds"].reshape(bb * k, m, d),
                     out["vid_embds"],
                     out["text_weights"].reshape(bb * k, m),
                     out["vid_weights"])
    _, parts = jax.lax.scan(body, 0, sb)
    te, ve, tw, vw = [p.reshape((-1,) + p.shape[2:]) for p in parts]
    sims = similarity.moe_similarity(te, ve, tw, vw, merge="indep",
                                     num_caps=1)
    return ranking.t2v_ranks(sims).sum()

  def run_eval():
    # Force a scalar host read: through the remote-dispatch tunnel,
    # block_until_ready alone is not a reliable completion barrier.
    return float(full_eval(variables, device_batch))

  return run_eval, full_eval, variables, device_batch


def build_streaming_eval():
  """Large-corpus eval: embeddings accumulate on device, no sims matrix.

  The single-dispatch protocol above materializes every input feature on
  HBM (~25 GB at 20k videos — OOM); production-scale corpora instead
  stream through the embed program in 1k-video passes (dispatches
  pipeline, so pass boundaries cost nothing) and rank straight from the
  accumulated embeddings via the fused no-matrix kernel
  (mmt_tpu/ops/ranking.py:fused_t2v_ranks) — the [Q, V] matrix at 100k
  would be 40 GB fp32 and is never built.  Each pass perturbs the staged
  features by a per-pass salt ON DEVICE (one fused elementwise add), so
  all N videos are distinct without re-staging inputs over the tunnel.

  Returns run(n_videos) -> wall seconds.
  """
  import jax
  import jax.numpy as jnp

  from mmt_tpu.ops import ranking

  model, variables, device_batch = _staged_flagship(jax, jnp)

  @jax.jit
  def embed_pass(variables, sb, salt):
    def body(carry, b):
      b = dict(b)
      b["features"] = {m: v + salt.astype(v.dtype)
                       for m, v in b["features"].items()}
      out = model.apply(variables, b, train=False)
      bb, k, m, d = out["text_embds"].shape
      return carry, (out["text_embds"].reshape(bb * k, m, d),
                     out["vid_embds"],
                     out["text_weights"].reshape(bb * k, m),
                     out["vid_weights"])
    _, parts = jax.lax.scan(body, 0, sb)
    return tuple(p.reshape((-1,) + p.shape[2:]) for p in parts)

  rank_sum = jax.jit(
      lambda te, ve, tw, vw:
      ranking.t2v_ranks_from_embeddings(te, ve, tw, vw).sum())

  def run(n_videos):
    assert n_videos % N_VIDEOS == 0, (n_videos, N_VIDEOS)
    passes = n_videos // N_VIDEOS
    tic = time.perf_counter()
    parts = [embed_pass(variables, device_batch,
                        jnp.float32(0.001 * (p + 1)))
             for p in range(passes)]
    te, ve, tw, vw = (jnp.concatenate([p[i] for p in parts], 0)
                      for i in range(4))
    float(rank_sum(te, ve, tw, vw))  # host read = completion barrier
    return time.perf_counter() - tic

  return run


def main():
  import jax
  import jax.numpy as jnp

  use_bf16 = os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
  use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
  use_pallas_ffn = os.environ.get("BENCH_PALLAS_FFN", "1") == "1"
  run_eval, _, _, _ = build_full_eval()

  # Warmup / compile.
  checksum = run_eval()

  times = []
  for _ in range(REPS):
    tic = time.perf_counter()
    got = run_eval()
    times.append(time.perf_counter() - tic)
  latency = min(times)
  videos_per_sec = N_VIDEOS / latency

  # Dispatch+sync round trip of a trivial program: the fixed per-eval
  # overhead of the tunneled single-chip setup (a local runtime pays
  # well under 1 ms of this).
  tiny = jax.jit(lambda a: a.sum())
  x = jax.device_put(np.ones((8, 8), np.float32))
  float(tiny(x))
  rtt = min(_timed(lambda: float(tiny(x))) for _ in range(10))

  train_step_ms = None
  if os.environ.get("BENCH_TRAIN", "1") == "1":
    train_step_ms = _bench_train_step(jax, jnp)

  # BENCH_LARGE=<N>: streaming eval at corpus scale (N videos, N
  # captions).  Off by default — the driver's headline run stays fast.
  streaming = None
  n_large = int(os.environ.get("BENCH_LARGE", "0"))
  if n_large:
    run_large = build_streaming_eval()
    run_large(N_VIDEOS)  # compile both programs at full-corpus shape...
    run_large(n_large)   # ...then once at n_large (the ranking shape)
    wall = min(run_large(n_large) for _ in range(3))
    streaming = {"n_videos": n_large, "wall_s": round(wall, 3),
                 "videos_per_sec_per_chip": round(n_large / wall, 1)}

  # Device-only view: the tunnel's dispatch+sync RTT is a fixed
  # environmental cost a local runtime would not pay.
  device_latency = max(latency - rtt, 1e-9)
  result = {
      "metric": "msrvtt1k_eval_videos_per_sec_per_chip",
      "value": round(videos_per_sec, 2),
      "unit": "videos/s/chip",
      "vs_baseline": round(videos_per_sec / BASELINE_VIDEOS_PER_SEC_PER_CHIP,
                           3),
      "latency_s_1kx1k": round(latency, 4),
      "dispatch_rtt_s": round(rtt, 4),
      "videos_per_sec_device_only": round(N_VIDEOS / device_latency, 1),
      "backend": jax.default_backend(),
      "dtype": "bf16" if use_bf16 else "fp32",
      "pallas_similarity": bool(use_pallas
                                and jax.default_backend() == "tpu"),
      "pallas_ffn": bool(use_pallas_ffn
                         and jax.default_backend() == "tpu"),
  }
  if train_step_ms is not None:
    train_bs = int(os.environ.get("BENCH_TRAIN_BATCH", "32"))
    result[f"train_step_ms_b{train_bs}"] = round(train_step_ms, 2)
    result["train_samples_per_sec_per_chip"] = round(
        train_bs * 1000 / train_step_ms, 1)
  if streaming is not None:
    result["streaming_eval"] = streaming
  print(json.dumps(result))


def _timed(fn):
  tic = time.perf_counter()
  fn()
  return time.perf_counter() - tic


def _bench_train_step(jax, jnp):
  """Full jitted train step (fwd + similarity + loss + bwd + optimizer)
  on the flagship model, MSRVTT batch size 32 (BASELINE.md training
  scale; BENCH_TRAIN_BATCH overrides — e.g. 128 amortizes the optimizer
  update to ~1,450 samples/s, docs/PERF.md).  BENCH_TRAIN_OPT selects
  the optimizer (Adam default; Ranger = the reference's
  utils/ranger.py RAdam+Lookahead, whose slow-weight state doubles what
  the donated step carries — measured in docs/PERF.md)."""
  import optax
  from __graft_entry__ import _flagship_model_and_batch
  from mmt_tpu.models.cenet import similarity_from_outputs
  from mmt_tpu.train.losses import max_margin_ranking_loss
  from mmt_tpu.train.optim import build_optimizer

  train_bs = int(os.environ.get("BENCH_TRAIN_BATCH", "32"))
  model, batch = _flagship_model_and_batch(batch_size=train_bs,
                                           compute_dtype=jnp.bfloat16)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  params, bs = variables["params"], variables.get("batch_stats", {})
  opt_type = os.environ.get("BENCH_TRAIN_OPT", "Adam")
  tx, _ = build_optimizer({"type": opt_type, "args": {"lr": 5e-5,
                                                      "weight_decay": 0}})
  opt_state = tx.init(params)
  loss_fn = max_margin_ranking_loss(0.05, True)

  def step(params, bs, opt_state, batch, rng):
    def L(p):
      out, mut = model.apply({"params": p, "batch_stats": bs}, batch,
                             train=True, rngs={"dropout": rng},
                             mutable=["batch_stats"])
      return loss_fn(similarity_from_outputs(out, merge="avg")), \
          mut.get("batch_stats", bs)
    (loss, nbs), grads = jax.value_and_grad(L, has_aux=True)(params)
    updates, nopt = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), nbs, nopt, loss

  # Steady-state protocol: donated state, steps chained on device, one
  # host sync at the end (matches the trainer, which reads the loss only
  # at log intervals).
  jstep = jax.jit(step, donate_argnums=(0, 1, 2))
  db = jax.device_put(batch)
  params, bs, opt_state, loss = jstep(params, bs, opt_state, db,
                                      jax.random.PRNGKey(2))
  float(loss)  # sync after compile
  n_steps = 20
  tic = time.perf_counter()
  for i in range(n_steps):
    params, bs, opt_state, loss = jstep(params, bs, opt_state, db,
                                        jax.random.PRNGKey(3 + i))
  float(loss)
  return (time.perf_counter() - tic) / n_steps * 1000.0


if __name__ == "__main__":
  main()
