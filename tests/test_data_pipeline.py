"""End-to-end input pipeline tests on the synthetic fixture corpus."""

import numpy as np
import pytest

from mmt_tpu import tokenization
from mmt_tpu.data import synthetic
from mmt_tpu.data.datasets import ExpertDataset
from mmt_tpu.data.loader import BatchLoader, ExpertDataLoader
from mmt_tpu.data.mix import MixDataset
from mmt_tpu.data.sample import choose_or_pad_features, crop_or_pad_tokens

EXPERTS = {"rgb": 64, "s3d": 32}
RAW_DIMS = {"rgb": {"dim": 64, "idx": 5}, "s3d": {"dim": 1, "idx": 32}}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
  root = tmp_path_factory.mktemp("corpus")
  data_dir = synthetic.generate(root, num_videos=12, num_test=4,
                                experts=EXPERTS, captions_per_video=3)
  tok = tokenization.WordPieceTokenizer(root / "vocab.txt")
  return data_dir, tok


def raw_dims():
  return {m: {"dim": d, "idx": i + 1} for i, (m, d) in enumerate(EXPERTS.items())}


def test_choose_or_pad_shapes(rng):
  f = rng.randn(20, 8)
  t = np.arange(20.0)
  out, out_t, ind = choose_or_pad_features(f, t, 6, training=False)
  assert out.shape == (6, 8) and ind.sum() == 6
  # eval determinism: same pick every call
  out2, out_t2, _ = choose_or_pad_features(f, t, 6, training=False)
  np.testing.assert_array_equal(out, out2)
  np.testing.assert_array_equal(out_t, out_t2)
  # temporal order preserved
  assert np.all(np.diff(out_t) >= 0)
  # padding path
  out, out_t, ind = choose_or_pad_features(f[:3], t[:3], 6, training=False)
  assert ind.sum() == 3 and np.all(out[3:] == 0) and np.all(out_t[3:] == 1)


def test_crop_or_pad_tokens():
  out = crop_or_pad_tokens([5, 6, 7], 6)
  assert out.shape == (6, 2)
  np.testing.assert_array_equal(out[:, 0], [5, 6, 7, 0, 0, 0])
  np.testing.assert_array_equal(out[:, 1], [1, 1, 1, 0, 0, 0])


def test_dataset_splits(corpus):
  data_dir, tok = corpus
  train = ExpertDataset("MSRVTT", "jsfusion", "trainval", str(data_dir),
                        raw_dims(), training=True, tokenizer=tok,
                        max_text_words=12, max_expert_tokens=4)
  test = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir),
                       raw_dims(), training=False, tokenizer=tok,
                       max_text_words=12, max_expert_tokens=4,
                       captions_per_video=1)
  assert train.num_train == 8
  assert test.num_train == 4
  assert len(test) == 4
  assert len(train) >= int(1e6)  # trainer-decided epoch length


def test_sample_schema(corpus, legacy_assembly):
  data_dir, tok = corpus
  ds = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir), raw_dims(),
                     training=False, tokenizer=tok, max_text_words=12,
                     max_expert_tokens=4, captions_per_video=2)
  s = ds[0]
  assert s["text_tensors"]["token_ids"].shape == (1, 2, 12, 2)
  assert s["text_tensors"]["query_masks"].shape == (1, 2)
  for m, d in EXPERTS.items():
    assert s["vid_tensors"]["features"][m].shape == (1, 4, d)
    assert s["vid_tensors"]["features_t"][m].shape == (1, 4)
    assert s["vid_tensors"]["features_ind"][m].shape == (1, 4)
    assert s["vid_tensors"]["features_avgpool"][m].shape == (1, d)
    assert s["vid_tensors"]["features_maxpool"][m].shape == (1, d)
  # jsfusion restriction: test videos expose exactly one caption
  assert s["text_tensors"]["query_masks"][0, 0] == 1
  assert s["text_tensors"]["query_masks"][0, 1] == 0


def test_eval_determinism(corpus, legacy_assembly):
  """Eval samples are bit-identical across epochs
  (base/base_dataset.py:101-104 seeded subsampling)."""
  data_dir, tok = corpus
  ds = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir), raw_dims(),
                     training=False, tokenizer=tok, max_text_words=12,
                     max_expert_tokens=3, captions_per_video=1)
  a, b = ds[1], ds[1]
  np.testing.assert_array_equal(a["text_tensors"]["token_ids"],
                                b["text_tensors"]["token_ids"])
  for m in EXPERTS:
    np.testing.assert_array_equal(a["vid_tensors"]["features"][m],
                                  b["vid_tensors"]["features"][m])


def test_batch_loader(corpus):
  data_dir, tok = corpus
  loader = ExpertDataLoader(
      mix=[{"dataset_name": "MSRVTT", "cut_name": "jsfusion",
            "split_name": "test", "data_dir": str(data_dir),
            "captions_per_video": 1, "max_text_words": 12,
            "max_expert_tokens": 4}],
      num_workers=2, batch_size=3, raw_input_dims=raw_dims(),
      tokenizer=tok, training=False)
  batches = list(loader["loader"])
  assert len(batches) == 2  # 4 videos, batch 3, no drop_last at eval
  b0 = batches[0]
  assert b0["token_ids"].shape == (3, 1, 12, 2)
  assert b0["token_ids"].dtype == np.int32
  assert b0["features"]["rgb"].dtype == np.float32
  assert len(b0["paths"]) == 3
  assert b0["sources"][0] == "MSRVTT_jsfusion_test"


def test_train_loader_drops_and_shuffles(corpus):
  data_dir, tok = corpus
  loader = ExpertDataLoader(
      mix=[{"dataset_name": "MSRVTT", "cut_name": "jsfusion",
            "split_name": "trainval", "data_dir": str(data_dir),
            "max_text_words": 12, "max_expert_tokens": 4,
            "query_shuffling": "shufk1"}],
      num_workers=0, batch_size=4, raw_input_dims=raw_dims(),
      tokenizer=tok, training=True)
  it = iter(loader["loader"])
  b = next(it)
  assert b["token_ids"].shape == (4, 1, 12, 2)


def test_mix_dataset_weights(corpus):
  data_dir, tok = corpus
  mix = MixDataset(
      mix=[{"dataset_name": "MSRVTT", "cut_name": "jsfusion",
            "split_name": "trainval", "data_dir": str(data_dir),
            "mix_weight": 3.0, "max_text_words": 12, "max_expert_tokens": 4},
           {"dataset_name": "MSRVTT", "cut_name": "jsfusion",
            "split_name": "test", "data_dir": str(data_dir),
            "mix_weight": 1.0, "max_text_words": 12,
            "max_expert_tokens": 4}],
      raw_input_dims=raw_dims(), training=True, tokenizer=tok)
  assert mix.dataset_name == "Mix"
  np.testing.assert_allclose(mix.mix_weights, [0.75, 0.25])
  s = mix[0]
  assert s["text_tensors"]["token_ids"].shape[-2:] == (12, 2)


def test_loaded_data_shares_pkl_tables_across_loaders(tmp_path):
  """Challenge pkl tables are read from disk once and shared across
  splits via the loaded_data dict (base/base_dataset.py:283-296)."""
  from mmt_tpu.data import synthetic
  from mmt_tpu.data.datasets import ExpertDataset

  data_dir = synthetic.generate(tmp_path, num_videos=6, num_test=3,
                                experts={"i3d": 16}, captions_per_video=2,
                                cut="c")
  dims = {"i3d": {"dim": 16, "idx": 5}}
  loaded = {}
  ds1 = ExpertDataset(dataset_name="MSRVTT", cut_name="c",
                      split_name="trainval", data_dir=str(data_dir),
                      raw_input_dims=dims, training=True,
                      loaded_data=loaded)
  n_tables = len(loaded)
  assert n_tables >= 2, "expected captions + feature tables in the cache"
  ds2 = ExpertDataset(dataset_name="MSRVTT", cut_name="c",
                      split_name="val", data_dir=str(data_dir),
                      raw_input_dims=dims, training=False,
                      loaded_data=loaded)
  assert len(loaded) == n_tables, "second loader re-read tables from disk"
  assert ds1.reader._captions is ds2.reader._captions
  assert (ds1.reader._tables["i3d"]["fixed_seg"]
          is ds2.reader._tables["i3d"]["fixed_seg"])


def test_record_cache_one_read_per_video(corpus, monkeypatch):
  """Steady state reads each h5 file once: later epochs hit the RAM
  record cache (mmt_tpu/data/readers.py:RecordCache)."""
  from mmt_tpu.data import readers as readers_mod

  data_dir, tok = corpus
  ds = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir), raw_dims(),
                     training=False, tokenizer=tok, max_text_words=12,
                     max_expert_tokens=4, captions_per_video=1,
                     loaded_data={})
  import h5py
  opens = []
  orig = h5py.File
  monkeypatch.setattr(h5py, "File",
                      lambda *a, **k: opens.append(a[0]) or orig(*a, **k))
  for _ in range(3):           # three "epochs"
    for i in range(ds.num_train):
      ds[i]
  assert len(opens) == ds.num_train, (
      f"expected {ds.num_train} h5 opens, saw {len(opens)}")


def test_record_cache_budget_zero_disables(corpus, monkeypatch):
  from mmt_tpu.data import readers as readers_mod

  data_dir, tok = corpus
  ds = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir), raw_dims(),
                     training=False, tokenizer=tok, max_text_words=12,
                     max_expert_tokens=4, captions_per_video=1,
                     loaded_data={})
  ds.reader.cache = readers_mod.RecordCache(budget_bytes=0)
  import h5py
  opens = []
  orig = h5py.File
  monkeypatch.setattr(h5py, "File",
                      lambda *a, **k: opens.append(a[0]) or orig(*a, **k))
  for _ in range(2):
    ds[0]
  assert len(opens) == 2, "budget 0 must disable caching"


def test_record_cache_shared_across_loaders(corpus):
  """continuous-eval and final-eval datasets over the same corpus share
  one record cache through loaded_data."""
  data_dir, tok = corpus
  loaded = {}
  ds1 = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir),
                      raw_dims(), training=False, tokenizer=tok,
                      max_text_words=12, max_expert_tokens=4,
                      captions_per_video=1, loaded_data=loaded)
  ds2 = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir),
                      raw_dims(), training=False, tokenizer=tok,
                      max_text_words=12, max_expert_tokens=4,
                      captions_per_video=1, loaded_data=loaded)
  assert ds1.reader.cache is ds2.reader.cache
  ds1[0]
  assert ds1.reader.cache.used > 0
  # the second dataset sees ds1's cached records
  vid = ds2.vid_list[0]
  assert ds2.reader.cache.get(vid) is not None


def test_cached_samples_identical_to_uncached(corpus, legacy_assembly):
  """The record cache must not change sample contents (eval path is
  bit-deterministic, base/base_dataset.py:101-104)."""
  from mmt_tpu.data import readers as readers_mod

  data_dir, tok = corpus
  kw = dict(training=False, tokenizer=tok, max_text_words=12,
            max_expert_tokens=4, captions_per_video=1)
  ds_cached = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir),
                            raw_dims(), loaded_data={}, **kw)
  ds_cold = ExpertDataset("MSRVTT", "jsfusion", "test", str(data_dir),
                          raw_dims(), loaded_data={}, **kw)
  ds_cold.reader.cache = readers_mod.RecordCache(budget_bytes=0)
  for i in range(ds_cached.num_train):
    ds_cached[i]                       # warm the cache
  for i in range(ds_cached.num_train):
    a, b = ds_cached[i], ds_cold[i]
    np.testing.assert_array_equal(a["text_tensors"]["token_ids"],
                                  b["text_tensors"]["token_ids"])
    for m in EXPERTS:
      np.testing.assert_array_equal(a["vid_tensors"]["features"][m],
                                    b["vid_tensors"]["features"][m])
      np.testing.assert_array_equal(
          a["vid_tensors"]["features_maxpool"][m],
          b["vid_tensors"]["features_maxpool"][m])


def test_device_prefetch_with_sharding_put():
  """device_prefetch(put=...) — the mesh-path prefetch: batches come out
  in order, transformed by ``put`` (here mesh_lib.shard_batch onto the
  8-device data axis), with 2 sharded batches staged ahead."""
  import jax
  from jax.sharding import NamedSharding, PartitionSpec as P
  from mmt_tpu.data.loader import device_prefetch
  from mmt_tpu.parallel import mesh as mesh_lib

  mesh = mesh_lib.data_mesh()
  puts = []

  def put(b):
    puts.append(int(b["x"][0]))
    return mesh_lib.shard_batch(mesh, b)

  batches = [{"x": np.full((8,), i, np.float32)} for i in range(5)]
  out = []
  it = device_prefetch(iter(batches), size=2, put=put)
  first = next(it)
  # After the first yield, the staging ring holds the NEXT two batches.
  assert puts == [0, 1, 2], puts
  out.append(first)
  out.extend(it)
  assert len(out) == 5
  for i, b in enumerate(out):
    assert isinstance(b["x"], jax.Array)
    assert b["x"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=1)
    np.testing.assert_array_equal(np.asarray(b["x"]), np.full(8, i))
