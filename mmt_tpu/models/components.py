"""Projection / gating / pooling building blocks.

Parity targets:
* GatedEmbeddingUnit / ContextGating / ReduceDim / GatedLinearUnit —
  /root/reference/model/model.py:683-786
* NetVLAD — /root/reference/model/net_vlad.py:32-101
* LSTM pooler — /root/reference/model/lstm.py:19-71
* TxtEmbeddings — /root/reference/model/txt_embeddings.py:26-61

BatchNorm note: torch BatchNorm1d(momentum=0.1) == flax BatchNorm
(momentum=0.9) up to torch's unbiased-variance running stats; at eval both
are frozen affines, so converted checkpoints evaluate identically.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def l2_normalize(x, axis=-1, eps=1e-12):
  """F.normalize(p=2) semantics: x / max(||x||, eps).

  Implemented as sqrt(max(sum(x^2), eps^2)) so the gradient at x == 0 is
  finite (torch defines the norm subgradient at 0 as 0; jnp.linalg.norm
  would propagate NaN — zero vectors really occur for missing
  modalities whose pooled features are all-zero).
  """
  sq = jnp.sum(x * x, axis=axis, keepdims=True)
  norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
  return x / norm


def safe_norm(x, axis=-1, eps=1e-12):
  """||x|| with a finite gradient at 0 (clamped below by eps)."""
  sq = jnp.sum(x * x, axis=axis)
  return jnp.sqrt(jnp.maximum(sq, eps * eps))


def l1_normalize(x, axis=-1, eps=1e-12):
  """F.normalize(p=1) semantics."""
  norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
  return x / jnp.maximum(norm, eps)


class TorchBatchNorm(nn.Module):
  """BatchNorm over the last axis with torch BatchNorm1d defaults."""
  features: int
  use_running_average: Optional[bool] = None

  @nn.compact
  def __call__(self, x, use_running_average: Optional[bool] = None):
    use_ra = nn.merge_param("use_running_average",
                            self.use_running_average, use_running_average)
    return nn.BatchNorm(use_running_average=use_ra,
                        momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name="bn")(x)


class ContextGating(nn.Module):
  """x * sigmoid(BN(Wx + b))  (model/model.py:736-750; GLU of cat(x, x1))."""
  dimension: int
  add_batch_norm: bool = True

  @nn.compact
  def __call__(self, x, *, train: bool = False):
    x1 = nn.Dense(self.dimension, name="fc")(x)
    if self.add_batch_norm:
      x1 = TorchBatchNorm(self.dimension, name="batch_norm")(
          x1, use_running_average=not train)
    return x * jax.nn.sigmoid(x1)


class GatedEmbeddingUnit(nn.Module):
  """Linear -> ContextGating -> optional L2 norm (model/model.py:683-702)."""
  output_dimension: int
  use_bn: bool
  normalize: bool = True

  @nn.compact
  def __call__(self, x, *, train: bool = False):
    x = nn.Dense(self.output_dimension, name="fc")(x)
    x = ContextGating(self.output_dimension, add_batch_norm=self.use_bn,
                      name="cg")(x, train=train)
    if self.normalize:
      x = l2_normalize(x)
    return x


class MimicCEGatedEmbeddingUnit(nn.Module):
  """ContextGating + L2 norm without the input Dense (model/model.py:705-714)."""
  input_dimension: int
  use_bn: bool

  @nn.compact
  def __call__(self, x, *, train: bool = False):
    x = ContextGating(self.input_dimension, add_batch_norm=self.use_bn,
                      name="cg")(x, train=train)
    return l2_normalize(x)


class ReduceDim(nn.Module):
  """Linear + L2 norm (model/model.py:717-726)."""
  output_dimension: int

  @nn.compact
  def __call__(self, x):
    x = nn.Dense(self.output_dimension, name="fc")(x)
    return l2_normalize(x)


class GatedLinearUnit(nn.Module):
  """glu(cat(x, mask)) (model/model.py:729-733; defined-for-completeness
  in the reference as well)."""

  @nn.compact
  def __call__(self, x, mask):
    return x * jax.nn.sigmoid(mask)


class ContextGatingReasoning(nn.Module):
  """x * sigmoid(BN(mask) + BN2(Wx)) (model/model.py:765-786)."""
  dimension: int
  add_batch_norm: bool = True

  @nn.compact
  def __call__(self, x, mask, *, train: bool = False):
    x2 = nn.Dense(self.dimension, name="fc")(x)
    x1 = mask
    if self.add_batch_norm:
      x1 = TorchBatchNorm(self.dimension, name="batch_norm")(
          x1, use_running_average=not train)
      x2 = TorchBatchNorm(self.dimension, name="batch_norm2")(
          x2, use_running_average=not train)
    t = x1 + x2
    return x * jax.nn.sigmoid(t)


class GatedEmbeddingUnitReasoning(nn.Module):
  """ContextGatingReasoning + L2 norm (model/model.py:753-762)."""
  output_dimension: int

  @nn.compact
  def __call__(self, x, mask, *, train: bool = False):
    x = ContextGatingReasoning(self.output_dimension, name="cg")(
        x, mask, train=train)
    return l2_normalize(x)


class NetVLAD(nn.Module):
  """NetVLAD aggregation (model/net_vlad.py:32-101).

  x: [B, N, D] -> [B, D*K]; soft-assignment matmul + BN + softmax, residual
  aggregation against cluster centers, intra-cluster L2 norm, global L2.
  """
  cluster_size: int
  feature_size: int
  add_batch_norm: bool = True

  @nn.compact
  def __call__(self, x, *, train: bool = False):
    b, n, d = x.shape
    assert d == self.feature_size
    init_sc = 1.0 / (self.feature_size ** 0.5)
    clusters = self.param(
        "clusters", nn.initializers.normal(init_sc),
        (self.feature_size, self.cluster_size))
    clusters2 = self.param(
        "clusters2", nn.initializers.normal(init_sc),
        (1, self.feature_size, self.cluster_size))

    flat = x.reshape(-1, d)
    assignment = flat @ clusters                       # [BN, K]
    if self.add_batch_norm:
      assignment = TorchBatchNorm(self.cluster_size, name="batch_norm")(
          assignment, use_running_average=not train)
    assignment = jax.nn.softmax(assignment, axis=1)
    assignment = assignment.reshape(b, n, self.cluster_size)
    a_sum = jnp.sum(assignment, axis=1, keepdims=True)  # [B, 1, K]
    a = a_sum * clusters2                               # [B, D, K]
    vlad = jnp.einsum("bkn,bnd->bkd", assignment.transpose(0, 2, 1),
                      x).transpose(0, 2, 1)             # [B, D, K]
    vlad = vlad - a
    vlad = l2_normalize(vlad, axis=1)                   # intra norm over D
    vlad = vlad.reshape(-1, self.cluster_size * self.feature_size)
    return l2_normalize(vlad)

  @property
  def out_dim(self):
    return self.cluster_size * self.feature_size


class LSTMPooler(nn.Module):
  """Single-direction LSTM over padded sequences; fc(last valid hidden).

  model/lstm.py:19-71 semantics (packed sequences == mask-held state).
  """
  hidden_dim: int
  output_dim: int
  num_layers: int = 1

  @nn.compact
  def __call__(self, x, lengths):
    hidden = x
    final_h = None
    for layer in range(self.num_layers):
      # nn.RNN's seq_lengths handling freezes the carry at padded steps —
      # the packed-sequence behavior of the reference (model/lstm.py:52-66).
      rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim),
                   return_carry=True, name=f"lstm_{layer}")
      (final_c, final_h), hidden = rnn(hidden, seq_lengths=lengths)
    return nn.Dense(self.output_dim, name="fc")(final_h)


class TxtEmbeddings(nn.Module):
  """Standalone word-embedding table with frozen-at-zero PAD row."""
  vocab_size: int
  emb_dim: int

  @nn.compact
  def __call__(self, input_ids):
    table = self.param("word_embeddings", nn.initializers.normal(0.02),
                       (self.vocab_size, self.emb_dim))
    # padding_idx=0 semantics: row 0 pinned to zero.
    table = table.at[0].set(0.0)
    return jnp.take(table, input_ids, axis=0)
