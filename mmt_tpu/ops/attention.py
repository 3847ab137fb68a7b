"""Multi-head attention: fused XLA path.

The reference leaves attention to cuDNN via torch matmuls
(/root/reference/model/bert.py:108-172).  Here attention is a pair of
einsums with an fp32 softmax; XLA fuses bias+softmax+scale into the
matmuls on TPU.

A Pallas flash-style kernel (whole-sequence VMEM tiles, then a batched
TBH-per-cell rewrite) was built and benchmarked against this path on a
v5e at the flagship eval shapes (batch 50, video seq 218/4 heads/dh 128,
text seq 30/12 heads/dh 64) and DELETED: XLA's attention chain accounts
for only ~8 ms of the 161 ms 1k x 1k eval (the hot fusions are the FFN
blocks at ~94 TFLOP/s, measured from the profile), while the kernel cost
~31 ms — sequence padding to the 128-lane tile wastes 4x on the text
tower (30 -> 128), and splitting attention out of XLA's layer fusions
adds HBM round trips for q/k/v/ctx.  At these short, statically-padded
sequence lengths there is no score-matrix HBM traffic for a flash kernel
to save (see docs/PERF.md for the full measurement table).  Revisit only
if a config raises sequence length to >= 1k, where the [S, S] tensors
stop fitting in the fusion's VMEM working set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
  qh = _split_heads(q, num_heads)
  kh = _split_heads(k, num_heads)
  vh = _split_heads(v, num_heads)
  ctx = attention_bhsd(qh, kh, vh, attn_bias=attn_bias,
                       dropout_rate=dropout_rate,
                       deterministic=deterministic,
                       dropout_rng_fn=dropout_rng_fn)
  return _merge_heads(ctx).astype(q.dtype)


def attention_bhsd(qh, kh, vh, *, attn_bias, dropout_rate=0.0,
                   deterministic=True, dropout_rng_fn=None):
  """Head-split attention core: q/k/v [B, H, S, dh] -> ctx [B, H, S, dh].

  Callers that project straight into the head-split layout (the
  projection einsum emits [B, H, S, dh] — bert.py TransformerLayer)
  skip the reshape+transpose copies the [B, S, D] entry pays: the
  profile showed those layout copies costing ~17% of eval device time
  (docs/PERF.md round 3).
  """
  head_dim = qh.shape[-1]
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
  return jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                    preferred_element_type=jnp.float32)
