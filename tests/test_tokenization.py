"""WordPiece tokenizer parity vs the HuggingFace implementation."""

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
