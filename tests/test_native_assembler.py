"""Native batch assembler (native/assembler.cc): bit-exactness vs the
Python sample/collate path.

The TPU-world analogue of trusting torch's C++ DataLoader collate
(gabeur/mmt data_loader/data_loaders.py:23-70): the native path must be
indistinguishable from the Python reference implementation, including
the numpy RNG stream positions of training row picks (multi-process
lockstep determinism depends on them).

Skipped when native/libassembler.so is absent (`make -C native`).
"""

import pathlib

import numpy as np
import pytest

from mmt_tpu.data import native_assembler as nasm

pytestmark = pytest.mark.skipif(
    not pathlib.Path(nasm._lib_path()).exists(),
    reason="native/libassembler.so not built (make -C native)")


@pytest.fixture(autouse=True)
def _restore_auto():
  yield
  nasm.set_enabled(None)


# ---------------------------------------------------------------------------
# Unit level: each slot kind against a numpy reference.
# ---------------------------------------------------------------------------


def _py_reference(slots, T, D):
  feats = np.zeros((len(slots), T, D), np.float32)
  ts = np.ones((len(slots), T), np.float32)
  inds = np.zeros((len(slots), T), np.float32)
  for i, s in enumerate(slots):
    if s.kind == 0:
      continue
    if s.kind == 1:
      feats[i], ts[i], inds[i] = s.feat, s.t, s.ind
      continue
    rows = s.pick if s.pick is not None else np.arange(s.k)
    sel = s.feat[rows]
    feats[i, :s.k] = sel
    ts[i, :s.k] = (s.t[rows] - s.t_start) / s.t_window + 2
    inds[i, :s.k] = 1
  return feats, ts, inds


def test_feature_slot_kinds_bit_exact(rng):
  T, D = 6, 5
  block = (rng.randn(T, D).astype(np.float32),
           rng.randn(T).astype(np.float32),
           (rng.rand(T) > 0.5).astype(np.float32))
  f64_src = rng.randn(9, D)                      # h5 float64 features
  f32_src = rng.randn(4, D).astype(np.float32)   # float32 features
  t9 = np.sort(rng.rand(9) * 50)
  t4 = np.sort(rng.rand(4) * 50)
  pick = np.sort(rng.choice(9, size=T, replace=False)).astype(np.int64)
  slots = [
      nasm.FeatSlot(0, 0, None, None, None, None, 0.0, 1.0),
      nasm.FeatSlot(1, 0, *block, None, 0.0, 1.0),
      nasm.FeatSlot(2, T, f64_src, t9, None, pick, 1.5, 3.0),
      nasm.FeatSlot(2, 4, f32_src, t4, None, None, 0.0, 1.0),  # pad 2 rows
  ]
  got = nasm.assemble_features(slots, T, D)
  want = _py_reference(slots, T, D)
  for g, w in zip(got, want):
    np.testing.assert_array_equal(g, w)
    assert g.dtype == np.float32


def test_feature_slot_guards(rng):
  T, D = 4, 3
  bad_block = (np.zeros((5, D), np.float32), np.zeros(5, np.float32),
               np.zeros(5, np.float32))
  with pytest.raises(ValueError):
    nasm.assemble_features(
        [nasm.FeatSlot(1, 0, *bad_block, None, 0.0, 1.0)], T, D)
  with pytest.raises(ValueError):
    nasm.assemble_features(
        [nasm.FeatSlot(2, 9, rng.randn(9, D), np.zeros(9), None, None,
                       0.0, 1.0)], T, D)


def test_rows_bit_exact(rng):
  D = 7
  r64 = rng.randn(1, D)
  r32 = rng.randn(D).astype(np.float32)
  out = nasm.assemble_rows(
      [nasm.RowSlot(0, None), nasm.RowSlot(2, r64), nasm.RowSlot(2, r32)],
      D)
  np.testing.assert_array_equal(out[0], np.zeros(D, np.float32))
  np.testing.assert_array_equal(out[1], r64[0].astype(np.float32))
  np.testing.assert_array_equal(out[2], r32)


# ---------------------------------------------------------------------------
# Loader level: full batches, native vs Python, same RNG stream.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
  from mmt_tpu.data import synthetic
  from mmt_tpu.tokenization import create_tokenizer
  root = tmp_path_factory.mktemp("nasm")
  experts = {"rgb": 32, "s3d": 16, "vggish": 8}
  data_dir = synthetic.generate(root, num_videos=12, num_test=4,
                                experts=experts, captions_per_video=3,
                                max_feats=9)
  tok = create_tokenizer("bertftn", vocab_file=str(root / "vocab.txt"))
  return data_dir, tok, experts


def _batches(corpus, training, native, n, missing_expert=False):
  from mmt_tpu.data.loader import ExpertDataLoader
  data_dir, tok, experts = corpus
  dims = dict(experts)
  if missing_expert:
    dims["ocr"] = 11    # registry expert absent from the corpus h5s
  nasm.set_enabled(native)
  np.random.seed(7)
  mix = [{"dataset_name": "MSRVTT", "cut_name": "jsfusion",
          "data_dir": str(data_dir),
          "split_name": "trainval" if training else "test",
          "max_text_words": 10,
          # max_expert_tokens below max_feats so training draws random
          # picks (the RAW descriptor path the block memo cannot cache)
          "max_expert_tokens": 5,
          "query_shuffling": "shufk1" if training else "indiv",
          "temporal_encoding_window": 1, "mix_weight": 1.0}]
  ldr = ExpertDataLoader(mix=mix, num_workers=0, batch_size=4,
                         raw_input_dims=dims, training=training,
                         tokenizer=tok, loaded_data={})
  it = iter(ldr["loader"])
  return [next(it) for _ in range(n)], dims


@pytest.mark.parametrize("training", [False, True])
@pytest.mark.parametrize("missing_expert", [False, True])
def test_loader_native_matches_python(corpus, training, missing_expert):
  n = 1 if not training else 3
  a, dims = _batches(corpus, training, False, n, missing_expert)
  b, _ = _batches(corpus, training, True, n, missing_expert)
  for ba, bb in zip(a, b):
    np.testing.assert_array_equal(ba["token_ids"], bb["token_ids"])
    for key in ("features", "features_t", "features_ind",
                "features_avgpool", "features_maxpool"):
      for e in dims:
        np.testing.assert_array_equal(
            ba[key][e], bb[key][e], err_msg=f"{key}/{e}")
        assert bb[key][e].dtype == ba[key][e].dtype


def test_loader_native_deterministic_across_epochs(corpus):
  """Eval batches stay bit-identical across epochs on the native path
  (the reference's seeded eval subsampling, base/base_dataset.py:101-104)."""
  (a1,), dims = _batches(corpus, False, True, 1)
  (a2,), _ = _batches(corpus, False, True, 1)
  for e in dims:
    np.testing.assert_array_equal(a1["features"][e], a2["features"][e])
