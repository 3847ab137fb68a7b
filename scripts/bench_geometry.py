"""On-chip perf at the OTHER published geometries (round-4 VERDICT #3).

Every TPU number in docs/PERF.md is the 7-expert MSRVTT flagship; this
script runs the same measured protocols (scan-fused single-dispatch
eval; donated device-chained train step) at:

  * ActivityNet (configs_pub/eccv20/ActivityNet_val1_trainval.json:
    2 experts s3d+vggish, max_expert_tokens 100, max_position_embeddings
    102, max_text_words 100, train bs 32) — 6.8x the flagship's video
    sequence length (S = 1 + 2*(1+100) = 203 vs 30-ish), so the fp32
    attention/LN working set and the VMEM gates are exercised where
    shapes actually differ;
  * HowTo100M pretrain (HowTo100M_full_train.json: 2 experts, L=30,
    train bs 64).

It also logs which compute path each kernel gate picked
(ops/ffn.py:kernel_fits, ops/similarity.py:qv_tiles) so a silent XLA
fallback cannot masquerade as a kernel number.

Run on the tunneled TPU:  python scripts/bench_geometry.py [activitynet|howto100m]
Env: BENCH_BATCH (eval chunk, default 25 for activitynet), BENCH_REPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GEOMETRIES = {
    # ActivityNet_val1_trainval.json:30-43 + mix args (L=100, pos 102).
    "activitynet": dict(modalities=["s3d", "vggish"], max_expert_tokens=100,
                        max_text_words=100, max_position_embeddings=102,
                        eval_chunk=25, train_batch=32, n_videos=1000),
    # HowTo100M_full_train.json:65,226-227 (train-only config, bs 64).
    "howto100m": dict(modalities=["s3d", "vggish"], max_expert_tokens=30,
                      max_text_words=30, max_position_embeddings=32,
                      eval_chunk=50, train_batch=64, n_videos=1000),
}


def _model_and_staged(geom, chunk, n_videos, use_bf16=True):
  import jax
  import jax.numpy as jnp
  from __graft_entry__ import _flagship_model_and_batch

  model, batch = _flagship_model_and_batch(
      batch_size=chunk, max_expert_tokens=geom["max_expert_tokens"],
      max_text_words=geom["max_text_words"],
      max_position_embeddings=geom["max_position_embeddings"],
      modalities=geom["modalities"],
      compute_dtype=jnp.bfloat16 if use_bf16 else None)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  n_chunks = n_videos // chunk
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
    for key in ("features", "features_avgpool", "features_maxpool"):
      device_batch[key] = {m: v.astype(jnp.bfloat16)
                           for m, v in device_batch[key].items()}
  return model, variables, device_batch


def bench_eval(geom, chunk, n_videos, reps):
  import jax

  from mmt_tpu.ops import ranking, similarity

  # CPU (smoke runs) lacks a bf16 dot thunk; bf16 is the TPU protocol.
  model, variables, device_batch = _model_and_staged(
      geom, chunk, n_videos, use_bf16=jax.default_backend() == "tpu")

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

  float(full_eval(variables, device_batch))   # compile + warm
  times = []
  for _ in range(reps):
    tic = time.perf_counter()
    float(full_eval(variables, device_batch))
    times.append(time.perf_counter() - tic)
  return min(times)


def bench_train(geom, batch_size, reps):
  import jax
  import jax.numpy as jnp
  import optax
  from mmt_tpu.models.cenet import similarity_from_outputs
  from mmt_tpu.train.losses import max_margin_ranking_loss
  from mmt_tpu.train.optim import build_optimizer
  from __graft_entry__ import _flagship_model_and_batch

  model, batch = _flagship_model_and_batch(
      batch_size=batch_size, max_expert_tokens=geom["max_expert_tokens"],
      max_text_words=geom["max_text_words"],
      max_position_embeddings=geom["max_position_embeddings"],
      modalities=geom["modalities"],
      compute_dtype=jnp.bfloat16 if jax.default_backend() == "tpu"
      else None)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  params = variables["params"]
  batch_stats = variables.get("batch_stats", {})
  tx, _ = build_optimizer(
      {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}})
  opt_state = tx.init(params)
  loss_fn = max_margin_ranking_loss(margin=0.05, fix_norm=True)

  def step(params, bs, opt_state, batch, rng):
    def L(p):
      out, mut = model.apply({"params": p, "batch_stats": bs}, batch,
                             train=True, rngs={"dropout": rng},
                             mutable=["batch_stats"])
      sims = similarity_from_outputs(out, merge="avg")
      return loss_fn(sims), mut.get("batch_stats", bs)
    (loss, new_bs), grads = jax.value_and_grad(L, has_aux=True)(params)
    updates, new_opt = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_bs, new_opt, loss

  # Device-chain CHAIN steps in one dispatch via donated args; the
  # tunnel RTT then amortizes (bench.py train protocol).
  CHAIN = 20
  step_j = jax.jit(step, donate_argnums=(0, 1, 2))
  dbatch = jax.device_put(batch)
  rngs = [jax.random.PRNGKey(7 + i) for i in range(CHAIN)]
  params, batch_stats, opt_state, _ = step_j(params, batch_stats, opt_state,
                                             dbatch, rngs[0])   # compile
  best = np.inf
  for _ in range(reps):
    tic = time.perf_counter()
    for r in rngs:
      params, batch_stats, opt_state, loss = step_j(params, batch_stats,
                                                    opt_state, dbatch, r)
    float(loss)   # host read = barrier over the tunnel
    best = min(best, (time.perf_counter() - tic) / CHAIN)
  return best


def main(argv=None):
  import jax
  from mmt_tpu.ops import ffn, similarity

  names = argv if argv else sys.argv[1:] or list(GEOMETRIES)
  on_tpu = jax.default_backend() == "tpu"
  if on_tpu:
    ffn.use_pallas(os.environ.get("BENCH_PALLAS_FFN", "1") == "1")
    similarity.use_pallas(os.environ.get("BENCH_PALLAS", "1") == "1")
  reps = int(os.environ.get("BENCH_REPS", "5"))

  for name in names:
    geom = GEOMETRIES[name]
    chunk = int(os.environ.get("BENCH_BATCH", geom["eval_chunk"]))
    n_videos = int(os.environ.get("BENCH_VIDEOS", geom["n_videos"]))
    n_videos -= n_videos % chunk
    m = len(geom["modalities"])
    md = m * 512
    routing = {
        "ffn_kernel_fits_h512_i3072_bf16":
            ffn.kernel_fits(512, 3072, "bfloat16"),
        "ffn_train_kernel_fits": ffn.kernel_fits(512, 3072, "bfloat16",
                                                 train=True),
        "qv_tiles": similarity.qv_tiles(n_videos, n_videos, md),
        "pallas_ffn": ffn.pallas_active(),
        "pallas_similarity": similarity.pallas_active(),
    }
    eval_s = bench_eval(geom, chunk, n_videos, reps)
    train_ms = bench_train(geom, geom["train_batch"], max(2, reps // 2))
    print(json.dumps({
        "geometry": name,
        "modalities": geom["modalities"],
        "max_expert_tokens": geom["max_expert_tokens"],
        "eval_chunk": chunk,
        "n_videos": n_videos,
        "eval_wall_s": round(eval_s, 4),
        "eval_videos_per_sec_per_chip": round(n_videos / eval_s, 1),
        "train_batch": geom["train_batch"],
        "train_step_ms": round(train_ms * 1000, 2),
        "train_samples_per_sec_per_chip": round(
            geom["train_batch"] / train_ms, 1),
        "backend": jax.default_backend(),
        "routing": routing,
    }))


if __name__ == "__main__":
  main()
