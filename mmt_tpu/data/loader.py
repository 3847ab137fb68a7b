"""Batch loader: thread-pool sample assembly + prefetch ring + device put.

Replaces the reference's fork-based torch DataLoader
(data_loader/data_loaders.py:23-70) with a thread-pool pipeline (the
image has 1 CPU core; h5py/numpy release the GIL on IO and large copies)
feeding fixed-shape numpy batches, plus an optional device-prefetch stage
that keeps the next batch's host->device transfer in flight while the
current step runs (the TPU analogue of pin_memory+async copies).
"""

from __future__ import annotations

import collections
import itertools
import logging
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from mmt_tpu.data.mix import MixDataset
from mmt_tpu.registry import register

logger = logging.getLogger(__name__)


class BatchLoader:
  """Iterable over collated batches of a MixDataset."""

  def __init__(self, dataset, batch_size: int, num_workers: int = 0,
               shuffle: bool = False, drop_last: bool = False,
               prefetch_batches: int = 4, seed: Optional[int] = None):
    self.dataset = dataset
    self.batch_size = batch_size
    self.num_workers = num_workers
    self.shuffle = shuffle
    self.drop_last = drop_last
    self.prefetch_batches = prefetch_batches
    self.seed = seed

  def __len__(self):
    n = len(self.dataset)
    if self.drop_last:
      return n // self.batch_size
    return (n + self.batch_size - 1) // self.batch_size

  def _index_batches(self):
    n = len(self.dataset)
    if self.shuffle:
      # Training: random order; for the synthetic 1e7-length train sets a
      # full permutation is wasteful, so sample indices directly.
      rng = np.random.RandomState(self.seed) if self.seed is not None else np.random
      if n > 1_000_000:
        while True:
          yield rng.randint(0, n, size=self.batch_size)
      else:
        order = rng.permutation(n)
        end = n - n % self.batch_size if self.drop_last else n
        for i in range(0, end, self.batch_size):
          yield order[i:i + self.batch_size]
    else:
      end = n - n % self.batch_size if self.drop_last else n
      for i in range(0, end, self.batch_size):
        yield np.arange(i, min(i + self.batch_size, n))

  def __iter__(self) -> Iterator[dict]:
    if self.num_workers <= 0:
      for idxs in self._index_batches():
        yield self.dataset.collate_data([self.dataset[i] for i in idxs])
      return
    yield from self._threaded_iter()

  def _threaded_iter(self):
    with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
      pending = collections.deque()
      index_iter = self._index_batches()

      def assemble(idxs):
        return self.dataset.collate_data([self.dataset[i] for i in idxs])

      for idxs in itertools.islice(index_iter, self.prefetch_batches):
        pending.append(pool.submit(assemble, idxs))
      while pending:
        batch = pending.popleft().result()
        nxt = next(index_iter, None)
        if nxt is not None:
          pending.append(pool.submit(assemble, nxt))
        yield batch


def device_prefetch(iterator, size: int = 2, put=None):
  """Stage host->device transfers ahead of consumption.

  ``put`` overrides the per-batch transfer (default: plain device_put on
  every array leaf).  The mesh training path passes
  ``lambda b: mesh_lib.shard_batch(mesh, b)`` so ``size`` SHARDED batches
  stay in flight while the current step runs — device_put/
  make_array_from_callback only ENQUEUE the H2D copies, so issuing the
  next batch's scatter before the step consumes it overlaps transfer
  with compute (the TPU analogue of the reference's pin_memory + async
  copies, data_loader/data_loaders.py:54-62).
  """
  import jax

  buf = collections.deque()

  if put is None:
    def put(batch):
      return jax.tree_util.tree_map(
          lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
          batch)

  it = iter(iterator)
  try:
    for _ in range(size):
      buf.append(put(next(it)))
  except StopIteration:
    pass
  while buf:
    out = buf.popleft()
    try:
      buf.append(put(next(it)))
    except StopIteration:
      pass
    yield out


@register("data_loader", "ExpertDataLoader")
class ExpertDataLoader:
  """Config-built loader entry (data_loader/data_loaders.py:23-70 schema)."""

  def __init__(self, mix, num_workers, batch_size, raw_input_dims,
               until_epoch=float("inf"), pin_memory=False, n_pairs=1,
               training=False, tokenizer=None, loaded_data=None,
               cross_seed=0):
    self.batch_size = batch_size
    self.until_epoch = until_epoch
    self.n_pairs = n_pairs

    # Multi-process training feeds each process the IDENTICAL global
    # batch stream (mesh.shard_batch scatters each process's rows), which
    # requires bit-deterministic assembly: the per-sample transforms draw
    # from the config-seeded global numpy RNG, and thread-pool workers
    # would consume it in a nondeterministic order.
    import jax
    if num_workers and jax.process_count() > 1:
      logger.warning("multi-process run: forcing num_workers=0 so all "
                     "processes assemble identical global batches")
      num_workers = 0

    dataset = MixDataset(mix=mix, raw_input_dims=raw_input_dims,
                         training=training, tokenizer=tokenizer,
                         n_pairs=n_pairs, loaded_data=loaded_data,
                         cross_seed=cross_seed)
    loader = BatchLoader(dataset, batch_size=batch_size,
                         num_workers=num_workers, shuffle=training,
                         drop_last=training)
    self.dataloaders = {"loader": loader, "dataset": dataset}

  def __getitem__(self, key):
    return self.dataloaders[key]
