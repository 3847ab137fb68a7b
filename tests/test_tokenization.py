"""WordPiece tokenizer parity vs the HuggingFace implementation."""

import os

import numpy as np
import pytest

from mmt_tpu import tokenization


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
  from mmt_tpu.data import synthetic
  return synthetic.write_vocab(tmp_path_factory.mktemp("vocab") / "vocab.txt")


@pytest.fixture(scope="module")
def ours(vocab_file):
  return tokenization.WordPieceTokenizer(vocab_file, do_lower_case=True)


@pytest.fixture(scope="module")
def theirs(vocab_file):
  transformers = pytest.importorskip("transformers")
  return transformers.BertTokenizer(str(vocab_file), do_lower_case=True)


SENTENCES = [
    "A man is cooking.",
    "Cooking!! with, punctuation?",
    "The surfer is surfing",     # exercises wordpiece: surf + ##ing / ##er
    "UPPER case AND miXed",
    "unknownword here",
    "painter painting paints",
    "  whitespace   everywhere  ",
    "café accents über",   # accent stripping
    "中文 chars",            # CJK spacing
    "don't do-that",
]


@pytest.mark.parametrize("text", SENTENCES)
def test_tokenize_matches_hf(ours, theirs, text):
  assert ours.tokenize(text) == theirs.tokenize(text)


@pytest.mark.parametrize("text", SENTENCES)
def test_ids_match_hf(ours, theirs, text):
  toks = ours.tokenize(text)
  assert (ours.convert_tokens_to_ids(toks)
          == theirs.convert_tokens_to_ids(toks))


def test_encode_truncation(ours):
  ids = ours.encode("a man is cooking a man is cooking a man", max_len=5)
  assert len(ids) == 5
  assert ids[0] == ours.vocab["[CLS]"]
  assert ids[-1] == ours.vocab["[SEP]"]


def test_roundtrip(ours):
  toks = ours.tokenize("the man is surfing")
  ids = ours.convert_tokens_to_ids(toks)
  assert ours.convert_ids_to_tokens(ids) == toks


def test_we_tokenizer(tmp_path):
  # word2vec text format with header
  path = tmp_path / "wv.txt"
  path.write_text("3 4\nman 1 0 0 0\ndog 0 1 0 0\nruns 0 0 1 0\n")
  tok = tokenization.WeTokenizer(str(path))
  assert tok.text_dim == 4
  assert tok.weights.shape == (5, 4)          # +PAD +UNK
  assert np.all(tok.weights[:2] == 0)
  assert tok.tokenize("the Man runs! fast") == ["man", "runs"]
  assert tok.tokenize("zzz") == ["[UNK]"]
  assert tok.convert_tokens_to_ids(["man", "runs"]) == [2, 4]


# ---------------------------------------------------------------------------
# Realistic-scale parity: 12k+ adversarial vocab, fuzzed sentences
# (the real 28,996-entry bert-base-cased vocab cannot enter this env;
# utils/nlp_utils.py:19-42 is the reference usage).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def large_vocab_file(tmp_path_factory):
  from mmt_tpu.data import synthetic
  return synthetic.write_large_vocab(
      tmp_path_factory.mktemp("big_vocab") / "vocab.txt")


@pytest.fixture(scope="module")
def big_ours(large_vocab_file):
  return tokenization.WordPieceTokenizer(large_vocab_file,
                                         do_lower_case=True)


@pytest.fixture(scope="module")
def big_theirs(large_vocab_file):
  transformers = pytest.importorskip("transformers")
  return transformers.BertTokenizer(str(large_vocab_file),
                                    do_lower_case=True)


def test_large_vocab_scale(big_ours):
  assert len(big_ours.vocab) > 12000


def _fuzz_vs_hf(ours, theirs, n_sentences=300):
  """Fuzzed sentences built from vocab words + adversarial noise:
  tokens AND ids must match HF exactly."""
  rng = np.random.RandomState(0)
  words = [w for w in ours.vocab
           if not w.startswith(("##", "[")) and len(w) > 1]
  noise = ["don't", "state-of-the-art", "...", "é!ü", "中文字符",
           "привет", "αλφα", "x" * 120, "CAFÉ", "über-cool",
           "a.b,c;d", "\t tabs \t", "eé́combining",
           "[CLS]", "1234", "12.5%", "''quoted''"]
  for _ in range(n_sentences):
    n = rng.randint(1, 12)
    parts = [words[rng.randint(len(words))] for _ in range(n)]
    # random corruption: casing, concat with suffix pieces, noise splice
    for i in range(len(parts)):
      r = rng.rand()
      if r < 0.2:
        parts[i] = parts[i].upper()
      elif r < 0.35:
        parts[i] = parts[i] + rng.choice(["ing", "er", "ed", "s"])
      elif r < 0.45:
        parts[i] = parts[i] + rng.choice([".", ",", "!", "?", "'s"])
    if rng.rand() < 0.5:
      parts.insert(rng.randint(len(parts) + 1),
                   noise[rng.randint(len(noise))])
    text = " ".join(parts)
    ours_toks = ours.tokenize(text)
    theirs_toks = theirs.tokenize(text)
    assert ours_toks == theirs_toks, f"tokens diverge on: {text!r}"
    assert (ours.convert_tokens_to_ids(ours_toks)
            == theirs.convert_tokens_to_ids(theirs_toks)), (
                f"ids diverge on: {text!r}")


def test_fuzzed_sentences_match_hf(big_ours, big_theirs):
  _fuzz_vs_hf(big_ours, big_theirs)


def _real_vocab_path():
  import pathlib
  cand = (os.environ.get("MMT_TPU_BERT_VOCAB")
          or pathlib.Path(__file__).parent.parent
          / "data" / "bert-base-cased-vocab.txt")
  cand = pathlib.Path(cand)
  if not cand.is_file():
    return None
  with open(cand, encoding="utf-8") as f:
    n = sum(1 for _ in f)
  return cand if n == 28996 else None


@pytest.mark.skipif(_real_vocab_path() is None,
                    reason="real bert-base-cased vocab not present "
                           "(install via scripts/parity_run.py --check)")
def test_real_bert_base_cased_vocab_matches_hf():
  """When the REAL 28,996-entry bert-base-cased vocab is installed
  (scripts/parity_run.py / docs/PARITY.md), the fuzz parity suite runs
  against it — cased, as the reference uses it
  (utils/nlp_utils.py:19-42)."""
  transformers = pytest.importorskip("transformers")
  path = _real_vocab_path()
  ours = tokenization.WordPieceTokenizer(path, do_lower_case=False)
  theirs = transformers.BertTokenizer(str(path), do_lower_case=False)
  assert ours.vocab_size == 28996
  _fuzz_vs_hf(ours, theirs)


@pytest.mark.parametrize("text", [
    "[CLS] plain prefix", "x[CLS]y", "a [SEP]b", "[unused0] word",
    "[MASK][MASK]", "[cls] lowercase is not special", "pre[PAD]post",
    "[UNK]token", "no specials at all",
])
def test_special_token_literals_match_hf(big_ours, big_theirs, text):
  """HF trie-splits special-token literals anywhere in raw text
  (case-sensitive, before lower-casing); ours must match."""
  assert big_ours.tokenize(text) == big_theirs.tokenize(text)
