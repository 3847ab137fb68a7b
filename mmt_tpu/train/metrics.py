"""Retrieval metrics: host-side numpy parity path + on-device path.

``t2v_metrics`` / ``v2t_metrics`` reproduce the reference semantics
(/root/reference/model/metric.py:26-258) exactly, including tie-averaged
ranks, query masking, and the +1 offsets of MedR/MeanR.  The rank
computation can run on-device (mmt_tpu/ops/ranking.py) with the small
rank->metrics reduction on host; ``cols2metrics`` is shared.
"""

from __future__ import annotations

import numpy as np
import scipy.stats

from mmt_tpu.ops import ranking as ranking_ops
from mmt_tpu.registry import register


def cols2metrics(cols, num_queries):
  """model/metric.py:246-258 semantics (note: R1 counts exact rank 0, so a
  two-way tie at the top contributes rank 0.5 and does NOT count)."""
  cols = np.asarray(cols)
  metrics = {}
  metrics["R1"] = 100 * float(np.sum(cols == 0)) / num_queries
  metrics["R5"] = 100 * float(np.sum(cols < 5)) / num_queries
  metrics["R10"] = 100 * float(np.sum(cols < 10)) / num_queries
  metrics["R50"] = 100 * float(np.sum(cols < 50)) / num_queries
  metrics["MedR"] = float(np.median(cols) + 1)
  metrics["MeanR"] = float(np.mean(cols) + 1)
  stats = [metrics[x] for x in ("R1", "R5", "R10")]
  metrics["geometric_mean_R1-R5-R10"] = float(scipy.stats.mstats.gmean(stats))
  # The reference int()-casts every rank (model/metric.py:257), which would
  # raise on the inf rank v2t assigns to a video whose captions are all
  # masked; keep such ranks as floats instead of crashing the metrics path.
  metrics["cols"] = [int(i) if np.isfinite(i) else float(i)
                     for i in list(cols)]
  return metrics


def _t2v_ranks_np(sims):
  """Tie-averaged GT ranks, numpy (model/metric.py:41-121 semantics)."""
  nq, nv = sims.shape
  qu = nq // nv
  dists = -np.asarray(sims, dtype=np.float64)
  gt_col = np.arange(nq) // qu
  d_gt = dists[np.arange(nq), gt_col][:, None]
  closer = np.sum(dists < d_gt, axis=1)
  tied = np.sum(dists == d_gt, axis=1)
  return closer + (tied - 1) / 2.0


@register("metric", "t2v_metrics")
def t2v_metrics(sims, query_masks=None, device=False):
  """Text-to-video retrieval metrics from a [Nq, Nv] similarity matrix."""
  sims = np.asarray(sims)
  assert sims.ndim == 2, "expected a matrix"
  nq, nv = sims.shape
  if device:
    cols = np.asarray(ranking_ops.t2v_ranks(sims))
  else:
    cols = _t2v_ranks_np(sims)
  if query_masks is not None:
    assert query_masks.size == nq, "invalid query mask shape"
    keep = np.asarray(query_masks).reshape(-1).astype(bool)
    cols = cols[keep]
    nq = int(keep.sum())
  return cols2metrics(cols, nq)


def _v2t_ranks_np(sims, query_masks):
  """model/metric.py:169-218 semantics."""
  simsT = np.asarray(sims, dtype=np.float64).T
  num_queries, num_caps = simsT.shape
  dists = -simsT
  cpv = num_caps // num_queries
  if query_masks is not None:
    invalid = ~np.asarray(query_masks).reshape(-1).astype(bool)
    dists[:, invalid] = ranking_ops.MISSING_VAL
  ranks = np.empty(num_queries)
  for ii in range(num_queries):
    row = dists[ii]
    min_rank = np.inf
    for jj in range(ii * cpv, (ii + 1) * cpv):
      if row[jj] == ranking_ops.MISSING_VAL:
        continue
      closer = np.sum(row < row[jj])
      tied = np.sum(row == row[jj])
      rank = closer + (tied - 1) / 2.0
      min_rank = min(min_rank, rank)
    ranks[ii] = min_rank
  return ranks


def fused_retrieval_metrics(text_embds, vid_embds, text_weights,
                            vid_weights, query_masks,
                            which=("t2v_metrics", "v2t_metrics"),
                            mesh=None):
  """Retrieval metrics straight from embeddings, never materializing the
  [Q, V] similarity matrix (ops/ranking.py fused kernel on TPU, chunked
  XLA elsewhere).  For 50k+-video evals where the matrix is GBs of HBM.
  Semantics match t2v_metrics/v2t_metrics on the full matrix.

  With ``mesh`` (sharding rides the FIRST mesh axis — the 'data' axis
  of both the 1-D data mesh and the 2-D (data, model) TP mesh the
  trainer passes), each orientation shards its CANDIDATE operands
  across chips with queries replicated: the fused-counts op's
  partition rule (ops/ranking.py:_cand_sharded) counts shard-local
  candidates and psums, so corpus-side HBM and FLOPs scale with chips
  while the rank outputs stay replicated (multi-host lockstep-safe).
  Inputs may be host (numpy) arrays — each chip then receives only its
  candidate shard.  Videos are zero-padded to divide the mesh; pad
  candidates are biased out (-MISSING_VAL) and pad queries masked off.
  """
  import jax
  import jax.numpy as jnp

  nv = vid_embds.shape[0]
  cpv = text_embds.shape[0] // nv
  masks = np.asarray(query_masks if query_masks is not None
                     else np.ones((nv, cpv), np.float32))
  vid_valid = None
  shard3 = shard2 = shard1 = repl = None
  if mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec as P
    # Pad only to the axis the candidates actually shard over (axis 0);
    # padding to the full device count would embed+count dead rows per
    # model-parallel degree for nothing.
    n = int(mesh.shape[mesh.axis_names[0]])
    pad = (-nv) % n
    if pad:
      def padv(x, rows):
        x = np.asarray(x)
        return np.concatenate(
            [x, np.zeros((rows,) + x.shape[1:], x.dtype)], 0)
      vid_embds = padv(vid_embds, pad)
      vid_weights = padv(vid_weights, pad)
      text_embds = padv(text_embds, pad * cpv)
      text_weights = padv(text_weights, pad * cpv)
      masks = padv(masks, pad)   # pad caption slots: masked off
      vid_valid = np.concatenate([np.ones(nv, np.float32),
                                  np.zeros(pad, np.float32)])
    axis = mesh.axis_names[0]
    shard3 = NamedSharding(mesh, P(axis, None, None))
    shard2 = NamedSharding(mesh, P(axis, None))
    shard1 = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

  out = {}
  if "t2v_metrics" in which:
    if mesh is not None:   # candidates = videos: shard them
      te = jax.device_put(jnp_asarray(text_embds), repl)
      tw = jax.device_put(jnp_asarray(text_weights), repl)
      ve = jax.device_put(jnp_asarray(vid_embds), shard3)
      vw = jax.device_put(jnp_asarray(vid_weights), shard2)
      valid = (jax.device_put(jnp_asarray(vid_valid), shard1)
               if vid_valid is not None else None)
    else:
      te, tw = jnp_asarray(text_embds), jnp_asarray(text_weights)
      ve, vw = jnp_asarray(vid_embds), jnp_asarray(vid_weights)
      valid = jnp_asarray(vid_valid) if vid_valid is not None else None
    cols_dev = ranking_ops.t2v_ranks_from_embeddings(te, ve, tw, vw,
                                                     vid_valid=valid)
    if mesh is not None:
      # Explicitly replicate before the host read: the Pallas partition
      # rule psums to replicated by construction, but the chunked XLA
      # path's output sharding is GSPMD's choice — and a multi-HOST read
      # of a non-replicated array is not addressable.
      cols_dev = jax.device_put(cols_dev, repl)
    cols = np.asarray(cols_dev)
    keep = masks.reshape(-1).astype(bool)
    cols = cols[keep]
    out["t2v_metrics"] = cols2metrics(cols, int(keep.sum()))
  if "v2t_metrics" in which:
    if mesh is not None:   # candidates = caption slots: shard them
      te = jax.device_put(jnp_asarray(text_embds), shard3)
      tw = jax.device_put(jnp_asarray(text_weights), shard2)
      ve = jax.device_put(jnp_asarray(vid_embds), repl)
      vw = jax.device_put(jnp_asarray(vid_weights), repl)
      masks_dev = jax.device_put(jnp_asarray(masks), repl)
    else:
      te, tw = jnp_asarray(text_embds), jnp_asarray(text_weights)
      ve, vw = jnp_asarray(vid_embds), jnp_asarray(vid_weights)
      masks_dev = jnp_asarray(masks)
    ranks_dev = ranking_ops.v2t_ranks_from_embeddings(te, ve, tw, vw,
                                                      masks_dev)
    if mesh is not None:
      ranks_dev = jax.device_put(ranks_dev, repl)
    ranks = np.asarray(ranks_dev)
    out["v2t_metrics"] = cols2metrics(ranks[:nv], nv)
  return out


def jnp_asarray(x):
  import jax.numpy as jnp
  return jnp.asarray(np.asarray(x))


@register("metric", "v2t_metrics")
def v2t_metrics(sims, query_masks=None, device=False):
  """Video-to-text retrieval metrics (closest own caption, VSE-style)."""
  sims = np.asarray(sims)
  assert sims.ndim == 2, "expected a matrix"
  nq, nv = sims.shape
  if device:
    masks = (query_masks if query_masks is not None
             else np.ones((nv, nq // nv), dtype=np.float32))
    ranks = np.asarray(ranking_ops.v2t_ranks(sims, np.asarray(masks)))
  else:
    ranks = _v2t_ranks_np(sims, query_masks)
  return cols2metrics(ranks, nv)
