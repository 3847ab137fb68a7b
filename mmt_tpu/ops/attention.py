"""Multi-head attention: fused XLA path + Pallas TPU kernel.

The reference leaves attention to cuDNN via torch matmuls
(/root/reference/model/bert.py:108-172).  Here the default path is a pair
of einsums with an fp32 softmax (XLA fuses bias+softmax+scale into the
matmuls on TPU); a Pallas flash-style kernel is available for the
deterministic (eval / no-dropout) path and is selected with
``use_pallas(True)`` or the MMT_TPU_PALLAS_ATTENTION env var.

Sequences in this workload are short (<= ~256 tokens) and statically
padded, so the kernel keeps whole (seq, head_dim) tiles in VMEM per
(batch, head) grid cell — no KV blocking needed — but still computes the
numerically-stable streaming softmax so longer configs stay correct.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_USE_PALLAS = bool(int(os.environ.get("MMT_TPU_PALLAS_ATTENTION", "0")))


def use_pallas(enable: bool) -> None:
  global _USE_PALLAS
  _USE_PALLAS = enable


def _split_heads(x, num_heads):
  b, s, d = x.shape
  return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
  b, h, s, dh = x.shape
  return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def multi_head_attention(q, k, v, *, num_heads, attn_bias,
                         dropout_rate=0.0, deterministic=True,
                         dropout_rng_fn=None):
  """q/k/v: [B, S, D] post-projection. attn_bias: [B, 1, 1, S] additive.

  Returns [B, S, D].
  """
  b, s, d = q.shape
  head_dim = d // num_heads
  use_kernel = (_USE_PALLAS and (deterministic or dropout_rate == 0.0)
                and jax.default_backend() == "tpu")
  if use_kernel:
    return _pallas_attention(q, k, v, attn_bias, num_heads)

  qh = _split_heads(q, num_heads)
  kh = _split_heads(k, num_heads)
  vh = _split_heads(v, num_heads)
  scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                      preferred_element_type=jnp.float32)
  scores = scores / jnp.sqrt(jnp.float32(head_dim))
  scores = scores + attn_bias.astype(jnp.float32)
  probs = jax.nn.softmax(scores, axis=-1)
  if not deterministic and dropout_rate > 0.0:
    rng = dropout_rng_fn()
    keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
  probs = probs.astype(vh.dtype)
  ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                   preferred_element_type=jnp.float32)
  return _merge_heads(ctx).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
  # Blocks (leading grid dim squeezed by [0]): q/k/v [S, Dh]; bias [1, S]
  # broadcasting over query rows; out [S, Dh].
  q = q_ref[0].astype(jnp.float32)
  k = k_ref[0].astype(jnp.float32)
  v = v_ref[0].astype(jnp.float32)
  scores = jax.lax.dot_general(
      q, k, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32) * scale
  scores = scores + bias_ref[0].astype(jnp.float32)  # [S, S] + [1, S]
  m = jnp.max(scores, axis=-1, keepdims=True)
  p = jnp.exp(scores - m)
  denom = jnp.sum(p, axis=-1, keepdims=True)
  ctx = jnp.dot(p, v, preferred_element_type=jnp.float32)
  out_ref[0] = (ctx / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4,))
def _pallas_attention(q, k, v, attn_bias, num_heads):
  b, s, d = q.shape
  head_dim = d // num_heads
  qh = _split_heads(q, num_heads).reshape(b * num_heads, s, head_dim)
  kh = _split_heads(k, num_heads).reshape(b * num_heads, s, head_dim)
  vh = _split_heads(v, num_heads).reshape(b * num_heads, s, head_dim)
  # attn_bias is [B, 1, 1, S] -> [B*H, 1, S]
  bias = jnp.broadcast_to(attn_bias.reshape(b, 1, 1, s),
                          (b, num_heads, 1, s)).reshape(b * num_heads, 1, s)

  grid = (b * num_heads,)
  out = pl.pallas_call(
      functools.partial(_attention_kernel, scale=1.0 / (head_dim ** 0.5)),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, s, head_dim), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, s, head_dim), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, s, head_dim), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, s, head_dim), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b * num_heads, s, head_dim), q.dtype),
  )(qh, kh, vh, bias)
  return _merge_heads(out.reshape(b, num_heads, s, head_dim)).astype(q.dtype)
