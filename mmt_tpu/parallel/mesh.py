"""Device mesh construction and sharding specs.

The reference's only parallelism is single-process DataParallel
(base/base_trainer.py:49-50); here the equivalent is a 1-D ``data`` mesh:
batch arrays sharded on axis 0, parameters replicated.  The global-batch
negative semantics (the similarity matrix over the full batch,
trainer/trainer.py:185-199) fall out of GSPMD: the fused similarity
contraction consumes the full batch, so XLA inserts all-gathers over ICI
and differentiates through them.

Multi-host scale-out needs only ``jax.distributed.initialize`` (see
``maybe_initialize_distributed``) — the mesh then spans all processes'
devices with no further code changes; shardings keep collectives on ICI
within a slice and DCN across slices by construction of the device order.

A ``model`` axis hook is provided for tensor-parallel layouts
(SURVEY.md §2.2 marks TP/PP as not required for this model family — the
axis exists so larger towers can shard their FFN/attention heads without
restructuring).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed():
  """Multi-host: initialize the JAX distributed runtime if configured.

  On the CPU backend cross-process collectives need an explicit transport;
  default to gloo (override with MMT_TPU_CPU_COLLECTIVES) — this is also
  how the 2-process smoke test runs without TPU hardware
  (tests/test_parallel.py).  Idempotent: safe to call from both the CLI
  entry and library code.
  """
  global _DISTRIBUTED_INITIALIZED
  if _DISTRIBUTED_INITIALIZED:
    return
  if os.environ.get("MMT_TPU_COORDINATOR"):
    # Check the resolved config value, not just the env var: workers may
    # select the platform via jax.config.update("jax_platforms", "cpu")
    # (tests/distributed_worker.py does), and backends must not be
    # touched before jax.distributed.initialize, so jax.default_backend()
    # is off limits here.
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in (platforms or ""):
      jax.config.update(
          "jax_cpu_collectives_implementation",
          os.environ.get("MMT_TPU_CPU_COLLECTIVES", "gloo"))
    jax.distributed.initialize(
        coordinator_address=os.environ["MMT_TPU_COORDINATOR"],
        num_processes=int(os.environ.get("MMT_TPU_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("MMT_TPU_PROCESS_ID", "0")))
  # Only mark done AFTER a successful initialize: a raised init (e.g.
  # coordinator not up yet) must stay retryable, not become a silent
  # single-process no-op that diverges from its peers.
  _DISTRIBUTED_INITIALIZED = True


def data_mesh(devices=None, model_parallel: int = 1) -> Optional[Mesh]:
  """1-D data mesh (optionally 2-D with a model axis)."""
  devices = devices if devices is not None else jax.devices()
  n = len(devices)
  if n <= 1:
    return None
  if n % model_parallel:
    raise ValueError(
        f"model_parallel={model_parallel} does not divide the "
        f"{n} visible devices")
  dev_array = np.asarray(devices).reshape(n // model_parallel,
                                          model_parallel)
  return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh):
  """Batch sharding: leading axis over 'data' (jit broadcasts this prefix
  spec over every leaf of the batch pytree)."""
  return NamedSharding(mesh, P("data"))


def model_axis_size(mesh: Optional[Mesh]) -> int:
  if mesh is None:
    return 1
  return int(mesh.shape.get("model", 1))


def param_shardings(mesh: Mesh, params, num_heads=None):
  """Megatron-style tensor-parallel shardings for the transformer params.

  The reference has no tensor parallelism (SURVEY.md §2.2 — the ~133M
  model fits one chip); this is the TPU-native scale-up path the 'model'
  mesh axis exists for.  Per transformer layer:

  * ``ffn_inter``  — column-parallel: kernel [D, I] shards I, bias
    shards, the GELU runs on the shard;
  * ``ffn_out``    — row-parallel: kernel [I, D] shards I, XLA inserts
    the psum over 'model' after the contraction; bias replicated;
  * ``query/key/value`` — column-parallel over the head-output dim, i.e.
    head-parallel: the [B,S,D]→[B,H,S,dh] head split downstream keeps
    the shard on H (heads-per-chip = H / model_parallel);
  * ``attn_out``   — row-parallel, closing the attention block with one
    psum.

  Everything else (embeddings, LayerNorms, gated units, MoE heads) is
  replicated — they are a small fraction of bytes and sit on the psum'd
  activations.  A dim that does not divide the 'model' axis stays
  replicated (GSPMD would otherwise pad-and-mask, costing more than it
  saves at these widths).

  ``num_heads``, when given, maps top-level tower names ('txt_bert',
  'vid_bert') to their attention head counts: q/k/v/attn_out shard only
  when the head count ALSO divides the axis, because the attention
  apply reshapes the flat [D, D] kernels head-major ([D, H, dh],
  models/bert.py) and a shard boundary inside a head would make GSPMD
  reshard through the reshape every layer.  Without head info the check
  falls back to dim divisibility alone.

  These are *placement hints*: correctness never depends on them (GSPMD
  reshards as needed); they decide where the FLOPs and bytes land.
  """
  import jax.tree_util as jtu

  mp = model_axis_size(mesh)
  col = NamedSharding(mesh, P(None, "model"))   # shard output features
  row = NamedSharding(mesh, P("model", None))   # shard input features
  vec = NamedSharding(mesh, P("model"))
  rep = NamedSharding(mesh, P())

  def heads_ok(tower):
    if num_heads is None or tower not in num_heads:
      return True
    return num_heads[tower] % mp == 0

  def spec(path, leaf):
    if mp <= 1 or leaf.ndim == 0:
      return rep
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    mod = names[-2] if len(names) >= 2 else ""
    kind = names[-1]
    attn = mod in ("query", "key", "value", "attn_out")
    if attn and not heads_ok(names[0]):
      return rep
    if mod in ("ffn_inter", "query", "key", "value"):
      if kind == "kernel" and leaf.ndim == 2 and leaf.shape[1] % mp == 0:
        return col
      if kind == "bias" and leaf.ndim == 1 and leaf.shape[0] % mp == 0:
        return vec
    if mod in ("ffn_out", "attn_out"):
      if kind == "kernel" and leaf.ndim == 2 and leaf.shape[0] % mp == 0:
        return row
    return rep

  return jtu.tree_map_with_path(spec, params)


def shard_params(mesh: Optional[Mesh], params, num_heads=None):
  """Place params per ``param_shardings``.

  Single-process only, like tensor parallelism itself (the Trainer
  rejects a 'model' axis under multiprocess — per-layer psums must not
  ride DCN; checkpoint snapshots gather non-addressable shards)."""
  if mesh is None or model_axis_size(mesh) <= 1:
    return params
  specs = param_shardings(mesh, params, num_heads=num_heads)
  return jax.tree_util.tree_map(jax.device_put, params, specs)


def _global_put(x, sharding):
  """Host value -> global jax.Array on a (possibly multi-process) mesh.

  Every process must hold the SAME host value (lockstep loading); each
  contributes only its addressable shards via the callback.  Typed PRNG
  keys round-trip through their uint32 key data (np.asarray refuses
  them directly).
  """
  import jax.dtypes
  if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
    data = _global_put(jax.random.key_data(x), sharding)
    return jax.random.wrap_key_data(data)
  arr = np.asarray(x)
  return jax.make_array_from_callback(arr.shape, sharding,
                                      lambda idx: arr[idx])


def shard_batch(mesh: Optional[Mesh], batch):
  """Place a host batch onto the mesh (axis 0 over 'data').

  Multi-process: every process loads the identical GLOBAL batch (the
  loaders are deterministic in lockstep) and this scatters each process's
  own rows — the TPU equivalent of the reference's single-process
  DataParallel scatter (base/base_trainer.py:49-50) extended to hosts.
  """
  if mesh is None:
    return batch
  spec = NamedSharding(mesh, P("data"))
  if jax.process_count() > 1:
    return jax.tree_util.tree_map(
        lambda x: _global_put(x, spec) if hasattr(x, "shape") else x, batch)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, spec) if hasattr(x, "shape") else x, batch)


def replicate_tree(mesh: Optional[Mesh], tree):
  """Host pytree -> fully-replicated global arrays across all processes.

  No-op single-process (jit replicates host values itself there); under
  multi-process every jit argument must be a global array, so params /
  optimizer state / RNG keys go through here once before stepping.
  """
  if mesh is None or jax.process_count() <= 1:
    return tree
  spec = NamedSharding(mesh, P())
  return jax.tree_util.tree_map(
      lambda x: _global_put(x, spec) if hasattr(x, "shape") else x, tree)


def barrier(name: str = "mmt_tpu_barrier"):
  """Cross-process sync point (no-op single-process).

  Used where one process's filesystem writes must complete before the
  others read them (checkpoint write -> final-eval load)."""
  if jax.process_count() > 1:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def replicated(mesh: Optional[Mesh]):
  if mesh is None:
    return None
  return NamedSharding(mesh, P())
