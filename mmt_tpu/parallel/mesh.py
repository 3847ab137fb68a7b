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


def maybe_initialize_distributed():
  """Multi-host: initialize the JAX distributed runtime if configured.

  On the CPU backend cross-process collectives need an explicit transport;
  default to gloo (override with MMT_TPU_CPU_COLLECTIVES) — this is also
  how the 2-process smoke test runs without TPU hardware
  (tests/test_parallel.py).
  """
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


def data_mesh(devices=None, model_parallel: int = 1) -> Optional[Mesh]:
  """1-D data mesh (optionally 2-D with a model axis)."""
  devices = devices if devices is not None else jax.devices()
  n = len(devices)
  if n <= 1:
    return None
  assert n % model_parallel == 0
  dev_array = np.asarray(devices).reshape(n // model_parallel,
                                          model_parallel)
  return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh):
  """Batch sharding: leading axis over 'data' (jit broadcasts this prefix
  spec over every leaf of the batch pytree)."""
  return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Optional[Mesh], batch):
  """Place a host batch onto the mesh (axis 0 over 'data')."""
  if mesh is None:
    return batch
  spec = NamedSharding(mesh, P("data"))
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, spec) if hasattr(x, "shape") else x, batch)


def replicated(mesh: Optional[Mesh]):
  if mesh is None:
    return None
  return NamedSharding(mesh, P())
