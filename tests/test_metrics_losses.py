"""Metrics + loss parity tests against closed-form / brute-force oracles."""

import numpy as np
import pytest

from mmt_tpu.ops import ranking
from mmt_tpu.train import losses, metrics


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def brute_force_t2v_ranks(sims):
  """Sort-based tie-averaged ranks (the reference's sorted-dists method)."""
  nq, nv = sims.shape
  qu = nq // nv
  dists = -sims
  sorted_dists = np.sort(dists, axis=1)
  ranks = np.empty(nq)
  for q in range(nq):
    gt = dists[q, q // qu]
    pos = np.where(sorted_dists[q] - gt == 0)[0]
    ranks[q] = pos.mean()
  return ranks


@pytest.mark.parametrize("caps", [1, 2])
def test_t2v_ranks_match_sort_method(rng, caps):
  nv = 20
  sims = rng.randn(nv * caps, nv).astype(np.float32)
  # inject some exact ties
  sims[3] = 0.0
  sims[5, :10] = sims[5, 0]
  want = brute_force_t2v_ranks(sims)
  got_np = metrics._t2v_ranks_np(sims)
  got_dev = np.asarray(ranking.t2v_ranks(sims))
  np.testing.assert_allclose(got_np, want)
  np.testing.assert_allclose(got_dev, want, atol=1e-5)


def test_t2v_metrics_identity():
  """Perfect diagonal similarity -> R@1 = 100, MedR = 1."""
  sims = np.eye(10, dtype=np.float32)
  m = metrics.t2v_metrics(sims)
  assert m["R1"] == 100.0
  assert m["MedR"] == 1.0
  assert m["MeanR"] == 1.0


def test_t2v_all_zero_ties():
  """Constant sims: tie-averaged rank = (V-1)/2 for everyone (not perfect)."""
  nv = 10
  sims = np.zeros((nv, nv), np.float32)
  m = metrics.t2v_metrics(sims)
  assert m["R1"] == 0.0  # averaging tie-break cannot give a perfect score
  np.testing.assert_allclose(m["MeanR"], (nv - 1) / 2 + 1)


def test_t2v_query_mask(rng):
  caps = 2
  nv = 8
  sims = rng.randn(nv * caps, nv).astype(np.float32)
  masks = np.ones((nv, caps))
  masks[0, 1] = 0
  masks[3, 1] = 0
  m = metrics.t2v_metrics(sims, query_masks=masks)
  assert len(m["cols"]) == nv * caps - 2


@pytest.mark.parametrize("device", [False, True])
def test_v2t_metrics(rng, device):
  caps = 3
  nv = 12
  sims = rng.randn(nv * caps, nv).astype(np.float32)
  masks = np.ones((nv, caps))
  masks[2, 2] = 0
  m = metrics.v2t_metrics(sims, query_masks=masks, device=device)
  assert len(m["cols"]) == nv
  base = metrics.v2t_metrics(sims, query_masks=masks, device=False)
  np.testing.assert_allclose(m["cols"], base["cols"])


@pytest.mark.parametrize("device", [False, True])
def test_v2t_all_captions_masked(rng, device):
  """A video whose captions are all masked gets an inf rank; the metrics
  path must not crash on it (reference would: model/metric.py:257)."""
  caps, nv = 2, 5
  sims = rng.randn(nv * caps, nv).astype(np.float32)
  masks = np.ones((nv, caps))
  masks[3, :] = 0
  m = metrics.v2t_metrics(sims, query_masks=masks, device=device)
  assert len(m["cols"]) == nv
  assert m["cols"][3] == float("inf")
  assert all(isinstance(c, (int, float)) for c in m["cols"])
  assert np.isinf(m["MeanR"])


def test_v2t_min_over_captions():
  """v2t rank is the best rank among the video's own captions."""
  nv, caps = 3, 2
  sims = np.full((nv * caps, nv), -1.0, np.float32)
  # video 0: caption 1 is its best match (rank 0), caption 0 is bad.
  sims[0, 0] = -5.0
  sims[1, 0] = 5.0
  m = metrics.v2t_metrics(sims)
  assert m["cols"][0] == 0


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def reference_max_margin(x, margin, fix_norm):
  """Direct transcription of model/loss.py:38-65."""
  n = x.shape[0]
  x1 = np.repeat(np.diag(x)[:, None], n, 1).reshape(-1, 1)
  x1 = np.concatenate([x1, x1], 0)
  x2 = np.concatenate([x.reshape(-1, 1), x.T.reshape(-1, 1)], 0)
  terms = np.maximum(0, margin - (x1 - x2))
  if fix_norm:
    keep = (1 - np.eye(n)).reshape(-1, 1)
    keep = np.concatenate([keep, (1 - np.eye(n)).T.reshape(-1, 1)], 0)
    terms = terms[keep.flatten() > 0]
  return terms.mean()


@pytest.mark.parametrize("fix_norm", [True, False])
def test_max_margin_matches_reference(rng, fix_norm):
  x = rng.randn(16, 16).astype(np.float32)
  loss_fn = losses.max_margin_ranking_loss(margin=0.05, fix_norm=fix_norm)
  got = float(loss_fn(x))
  want = reference_max_margin(x, 0.05, fix_norm)
  np.testing.assert_allclose(got, want, rtol=1e-6)


def test_infonce_matches_softmax_ce(rng):
  x = rng.randn(8, 8).astype(np.float32)
  loss_fn = losses.info_nce_loss()
  got = float(loss_fn(x))

  def ce(mat):
    e = np.exp(mat - mat.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return -np.mean(np.log(p[np.arange(len(mat)), np.arange(len(mat))]))

  want = ce(x) + ce(x.T)
  np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fused_rank_kernel_matches_two_pass(rng):
  """Fused Pallas similarity+rank kernel == moe_similarity -> t2v_ranks."""
  import jax.numpy as jnp
  from jax.experimental.pallas import tpu as pltpu
  from mmt_tpu.ops import similarity

  caps, nv, m, d = 2, 12, 3, 16
  q = nv * caps
  text = rng.randn(q, m, d).astype(np.float32)
  vid = rng.randn(nv, m, d).astype(np.float32)
  tw = np.abs(rng.rand(q, m)).astype(np.float32)
  vw = np.abs(rng.rand(nv, m)).astype(np.float32)

  sims = similarity.moe_similarity(text, vid, tw, vw, merge="indep",
                                   num_caps=caps)
  want = np.asarray(ranking.t2v_ranks(sims))
  # interpret=True (Pallas-level), not force_tpu_interpret_mode: the
  # callback-based TPU-interpret carries an IO effect that the kernel's
  # custom_partitioning wrapper cannot lower.
  got = np.asarray(ranking.fused_t2v_ranks(
      jnp.asarray(text), jnp.asarray(vid), jnp.asarray(tw),
      jnp.asarray(vw), interpret=True))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_chunked_t2v_ranks_match_two_pass_10k(rng):
  """10k-video eval through the no-matrix path (chunked XLA fallback of
  the fused kernel) agrees with the two-pass matrix path exactly."""
  import jax.numpy as jnp
  from mmt_tpu.ops import similarity

  caps, nv, m, d = 1, 10_000, 2, 8
  q = nv * caps
  text = rng.randn(q, m, d).astype(np.float32)
  vid = rng.randn(nv, m, d).astype(np.float32)
  tw = np.abs(rng.rand(q, m)).astype(np.float32)
  vw = np.abs(rng.rand(nv, m)).astype(np.float32)

  sims = similarity.moe_similarity(text, vid, tw, vw, merge="indep",
                                   num_caps=caps)
  want = np.asarray(ranking.t2v_ranks(sims))
  got = np.asarray(ranking.t2v_ranks_from_embeddings(
      jnp.asarray(text), jnp.asarray(vid), jnp.asarray(tw),
      jnp.asarray(vw)))
  # The no-matrix path computes the GT similarity directly (elementwise)
  # while the matrix path reads it from the matmul; fp32 rounding of
  # near-ties can move a rank by 1 for a few queries in 1e8 comparisons.
  diff = np.abs(got - want)
  assert diff.max() <= 1.0, f"rank disagreement > 1: {diff.max()}"
  assert (diff > 0).mean() < 1e-3, f"{(diff > 0).sum()} queries differ"


def test_chunked_v2t_ranks_match_two_pass_10k(rng):
  import jax.numpy as jnp
  from mmt_tpu.ops import similarity

  caps, nv, m, d = 2, 5_000, 2, 8
  q = nv * caps
  text = rng.randn(q, m, d).astype(np.float32)
  vid = rng.randn(nv, m, d).astype(np.float32)
  tw = np.abs(rng.rand(q, m)).astype(np.float32)
  vw = np.abs(rng.rand(nv, m)).astype(np.float32)
  masks = (rng.rand(nv, caps) > 0.1).astype(np.float32)
  masks[0, :] = 0  # one video with every caption masked -> inf rank

  sims = similarity.moe_similarity(text, vid, tw, vw, merge="indep",
                                   num_caps=caps)
  want = np.asarray(ranking.v2t_ranks(sims, masks))
  got = np.asarray(ranking.v2t_ranks_from_embeddings(
      jnp.asarray(text), jnp.asarray(vid), jnp.asarray(tw),
      jnp.asarray(vw), jnp.asarray(masks)))
  finite = np.isfinite(want)
  diff = np.abs(got[finite] - want[finite])
  assert diff.max() <= 1.0, f"rank disagreement > 1: {diff.max()}"
  assert (diff > 0).mean() < 1e-3, f"{(diff > 0).sum()} videos differ"
  np.testing.assert_array_equal(np.isinf(got), np.isinf(want))
  assert np.isinf(got[0])


def test_fused_v2t_kernel_matches_two_pass(rng):
  """Pallas v2t orientation (interpret mode) == matrix two-pass path."""
  import jax.numpy as jnp
  from jax.experimental.pallas import tpu as pltpu
  from mmt_tpu.ops import similarity

  caps, nv, m, d = 2, 12, 3, 16
  q = nv * caps
  text = rng.randn(q, m, d).astype(np.float32)
  vid = rng.randn(nv, m, d).astype(np.float32)
  tw = np.abs(rng.rand(q, m)).astype(np.float32)
  vw = np.abs(rng.rand(nv, m)).astype(np.float32)
  masks = np.ones((nv, caps), np.float32)
  masks[3, 1] = 0
  masks[5, :] = 0

  sims = similarity.moe_similarity(text, vid, tw, vw, merge="indep",
                                   num_caps=caps)
  want = np.asarray(ranking.v2t_ranks(sims, masks))
  got = np.asarray(ranking.fused_v2t_ranks(
      jnp.asarray(text), jnp.asarray(vid), jnp.asarray(tw),
      jnp.asarray(vw), jnp.asarray(masks), interpret=True))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_retrieval_metrics_match_matrix_metrics(rng):
  from mmt_tpu.ops import similarity

  caps, nv, m, d = 2, 20, 2, 8
  q = nv * caps
  text = rng.randn(q, m, d).astype(np.float32)
  vid = rng.randn(nv, m, d).astype(np.float32)
  tw = np.abs(rng.rand(q, m)).astype(np.float32)
  vw = np.abs(rng.rand(nv, m)).astype(np.float32)
  masks = (rng.rand(nv, caps) > 0.2).astype(np.float32)

  sims = np.asarray(similarity.moe_similarity(text, vid, tw, vw,
                                              merge="indep", num_caps=caps))
  fused = metrics.fused_retrieval_metrics(text, vid, tw, vw, masks)
  want_t2v = metrics.t2v_metrics(sims, query_masks=masks)
  want_v2t = metrics.v2t_metrics(sims, query_masks=masks)
  for key in ("R1", "R5", "R10", "MedR", "MeanR"):
    np.testing.assert_allclose(fused["t2v_metrics"][key], want_t2v[key])
    np.testing.assert_allclose(fused["v2t_metrics"][key], want_v2t[key])
