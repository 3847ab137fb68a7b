"""Measured retrieval-quality delta of the int8-quantized serving index.

SERVING.md claims the int8 index is "ranking-stable"; this harness backs
the claim with numbers instead of an error bound (round-4 VERDICT item
4).  It isolates exactly what quantization changes — the scored
similarity + top-k — by feeding IDENTICAL query embeddings to both
paths (in the real engine the query encoder is shared, so any quality
delta comes from the index representation alone):

  * fp32 path:  ops/similarity.py moe_similarity (the engine's exact
    XLA route, prefer_pallas=False like serving);
  * int8 path:  serving._quantize_rows_int8 on the weight-scaled
    flattened index + serving._int8_moe_similarity (the engine's
    quantize="int8" route, bit-identical construction).

The synthetic corpus is flagship-geometry ([N, 7, 512] L2-normalized
per-modality embeddings, L1-normalized MoE weights) with planted ground
truth: each query is a noise-perturbed copy of one video's embedding,
so R@K is a real retrieval metric, not a near-tie lottery.

Run (defaults match the round-5 on-chip protocol: 10k videos, 1k
queries):  python scripts/int8_quality.py
CPU smoke:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
            python scripts/int8_quality.py --videos 512 --queries 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(num_videos, num_queries, modalities=7, dim=512, seed=0,
                noise=0.35, weight_noise=0.1):
  """Synthetic flagship-geometry corpus with planted ground truth.

  ``noise`` is the relative L2 perturbation between a query and its
  ground-truth video embedding — 0.35 puts median GT rank at 1 with a
  realistic margin distribution (not degenerate-separable).
  """
  rng = np.random.RandomState(seed)

  def l2norm(x):
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, 1e-12)

  def l1norm(w):
    return w / np.maximum(w.sum(-1, keepdims=True), 1e-12)

  vid = l2norm(rng.randn(num_videos, modalities, dim).astype(np.float32))
  vw = l1norm(np.abs(rng.randn(num_videos, modalities))
              .astype(np.float32))
  gt = rng.randint(0, num_videos, size=num_queries)
  txt = l2norm(vid[gt] + noise * rng.randn(num_queries, modalities, dim)
               .astype(np.float32))
  tw = l1norm(np.abs(vw[gt] + weight_noise
                     * rng.randn(num_queries, modalities))
              .astype(np.float32))
  return vid, vw, txt.astype(np.float32), tw.astype(np.float32), gt


def rank_both_paths(vid, vw, txt, tw, topk=10, batch=256):
  """(fp32 topk idx, int8 topk idx, fp32 scores, int8 scores) — the
  engine's two scoring routes over identical query embeddings."""
  import jax
  import jax.numpy as jnp
  from mmt_tpu.ops import similarity as similarity_ops
  from mmt_tpu.serving import _int8_moe_similarity, _quantize_rows_int8

  flat = (vid.astype(np.float32) * vw[:, :, None]).reshape(len(vid), -1)
  q8, scale = _quantize_rows_int8(flat)

  dev = dict(vid=jnp.asarray(vid), vw=jnp.asarray(vw),
             q8=jnp.asarray(q8), scale=jnp.asarray(scale))

  @jax.jit
  def fp32_topk(txt_b, tw_b, vid_d, vw_d):
    sims = similarity_ops.moe_similarity(txt_b, vid_d, tw_b, vw_d,
                                         merge="indep", num_caps=1,
                                         prefer_pallas=False)
    return jax.lax.top_k(sims, topk)

  @jax.jit
  def int8_topk(txt_b, tw_b, q8_d, scale_d, vw_d, idx_f_b):
    sims = _int8_moe_similarity(txt_b, tw_b, q8_d, scale_d, vw_d)
    scores_q, top_q = jax.lax.top_k(sims, topk)
    # int8 scores gathered at the fp32 top-k INDICES: the quantization
    # error of each fp32-top-k video is |fp32 - int8| of the SAME video.
    # (A positional rank-by-rank diff would compare different videos
    # wherever the two rankings disagree.)
    sc_q_at_f = jnp.take_along_axis(sims, idx_f_b, axis=1)
    return scores_q, top_q, sc_q_at_f

  idx_f, idx_q, sc_f, sc_q = [], [], [], []
  for s in range(0, len(txt), batch):
    tb, wb = jnp.asarray(txt[s:s + batch]), jnp.asarray(tw[s:s + batch])
    scores_f, top_f = fp32_topk(tb, wb, dev["vid"], dev["vw"])
    scores_q, top_q, sc_q_at_f = int8_topk(
        tb, wb, dev["q8"], dev["scale"], dev["vw"], top_f)
    idx_f.append(np.asarray(top_f))
    idx_q.append(np.asarray(top_q))
    sc_f.append(np.asarray(scores_f))
    sc_q.append(np.asarray(sc_q_at_f))
  return (np.concatenate(idx_f), np.concatenate(idx_q),
          np.concatenate(sc_f), np.concatenate(sc_q))


def quality_report(vid, vw, txt, tw, gt, topk=10, batch=256):
  idx_f, idx_q, sc_f, sc_q = rank_both_paths(vid, vw, txt, tw,
                                             topk=topk, batch=batch)
  nq = len(gt)
  rep = {}
  for k in (1, 5, 10):
    k = min(k, topk)
    rep[f"R{k}_fp32"] = float((idx_f[:, :k] == gt[:, None]).any(1).mean())
    rep[f"R{k}_int8"] = float((idx_q[:, :k] == gt[:, None]).any(1).mean())
    rep[f"overlap@{k}"] = float(np.mean([
        len(set(idx_f[q, :k]) & set(idx_q[q, :k])) / k for q in range(nq)]))
  rep["top1_identical"] = float((idx_f[:, 0] == idx_q[:, 0]).mean())
  # Per-item quantization error over each query's fp32 top-k: sc_q holds
  # the int8 scores of the SAME videos (gathered at idx_f on device).
  rep["score_mae_topk"] = float(np.abs(sc_f - sc_q).mean())
  rep["score_max_err_topk"] = float(np.abs(sc_f - sc_q).max())
  return rep


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--videos", type=int, default=10_000)
  p.add_argument("--queries", type=int, default=1_000)
  p.add_argument("--modalities", type=int, default=7)
  p.add_argument("--dim", type=int, default=512)
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--noise", type=float, default=0.35)
  p.add_argument("--topk", type=int, default=10)
  args = p.parse_args(argv)

  vid, vw, txt, tw, gt = make_corpus(args.videos, args.queries,
                                     args.modalities, args.dim,
                                     seed=args.seed, noise=args.noise)
  rep = quality_report(vid, vw, txt, tw, gt, topk=args.topk)
  rep.update(videos=args.videos, queries=args.queries, seed=args.seed,
             noise=args.noise)
  import jax
  rep["backend"] = jax.default_backend()
  print(json.dumps(rep, indent=2, sort_keys=True))
  return rep


if __name__ == "__main__":
  sys.exit(0 if main() else 1)
