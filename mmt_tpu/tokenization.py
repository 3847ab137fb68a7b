"""Self-contained tokenizers (no HuggingFace / gensim dependency).

The reference uses ``transformers.BertTokenizer('bert-base-cased',
do_lower_case=True)`` (/root/reference/utils/nlp_utils.py:19-42) and a
whitespace word-embedding tokenizer (``WeTokenizer``,
/root/reference/model/txt_embeddings.py:64-113).  Both are reimplemented
here from the tokenization algorithms themselves:

* ``WordPieceTokenizer`` — BERT basic tokenization (lower-casing, accent
  stripping, punctuation splitting, CJK spacing) + greedy longest-match
  WordPiece with '##' continuation pieces, driven by a vocab.txt file.
* ``WeTokenizer`` — word2vec/GloVe text- or binary-format vocab +
  alnum-filtered whitespace tokenization with [PAD]/[UNK] rows prepended.

An optional C++ fast path (native/wordpiece.cc) is used when the shared
library has been built; results are identical to the Python path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import pathlib
import unicodedata
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

PAD_TOKEN = "[PAD]"
UNK_TOKEN = "[UNK]"
CLS_TOKEN = "[CLS]"
SEP_TOKEN = "[SEP]"
MASK_TOKEN = "[MASK]"


def load_vocab(vocab_file) -> Dict[str, int]:
  vocab: Dict[str, int] = {}
  with open(vocab_file, encoding="utf-8") as f:
    for idx, line in enumerate(f):
      token = line.rstrip("\n")
      vocab[token] = idx
  return vocab


def _is_whitespace(ch: str) -> bool:
  if ch in (" ", "\t", "\n", "\r"):
    return True
  return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
  if ch in ("\t", "\n", "\r"):
    return False
  return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
  cp = ord(ch)
  # ASCII non-alnum treated as punctuation (BERT convention).
  if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
    return True
  return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
  return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF) or
          (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F) or
          (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF) or
          (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


class BasicTokenizer:
  """Whitespace/punctuation/CJK splitting with optional lower-casing."""

  def __init__(self, do_lower_case: bool = True):
    self.do_lower_case = do_lower_case

  def tokenize(self, text: str) -> List[str]:
    text = self._clean(text)
    text = self._space_cjk(text)
    tokens: List[str] = []
    for tok in text.split():
      if self.do_lower_case:
        tok = tok.lower()
        tok = self._strip_accents(tok)
      tokens.extend(self._split_punct(tok))
    return " ".join(tokens).split()

  @staticmethod
  def _clean(text: str) -> str:
    out = []
    for ch in text:
      cp = ord(ch)
      if cp == 0 or cp == 0xFFFD or _is_control(ch):
        continue
      out.append(" " if _is_whitespace(ch) else ch)
    return "".join(out)

  @staticmethod
  def _space_cjk(text: str) -> str:
    out = []
    for ch in text:
      if _is_cjk(ord(ch)):
        out.append(f" {ch} ")
      else:
        out.append(ch)
    return "".join(out)

  @staticmethod
  def _strip_accents(text: str) -> str:
    text = unicodedata.normalize("NFD", text)
    return "".join(ch for ch in text if unicodedata.category(ch) != "Mn")

  @staticmethod
  def _split_punct(token: str) -> List[str]:
    out: List[List[str]] = []
    start_new = True
    for ch in token:
      if _is_punctuation(ch):
        out.append([ch])
        start_new = True
      else:
        if start_new:
          out.append([])
          start_new = False
        out[-1].append(ch)
    return ["".join(x) for x in out]


class WordPiece:
  """Greedy longest-match-first subword splitting."""

  def __init__(self, vocab: Dict[str, int], unk_token: str = UNK_TOKEN,
               max_input_chars_per_word: int = 100):
    self.vocab = vocab
    self.unk_token = unk_token
    self.max_input_chars_per_word = max_input_chars_per_word

  def tokenize(self, token: str) -> List[str]:
    if len(token) > self.max_input_chars_per_word:
      return [self.unk_token]
    pieces: List[str] = []
    start = 0
    n = len(token)
    while start < n:
      end = n
      cur = None
      while start < end:
        piece = token[start:end]
        if start > 0:
          piece = "##" + piece
        if piece in self.vocab:
          cur = piece
          break
        end -= 1
      if cur is None:
        return [self.unk_token]
      pieces.append(cur)
      start = end
    return pieces


SPECIAL_TOKENS = (PAD_TOKEN, UNK_TOKEN, CLS_TOKEN, SEP_TOKEN, MASK_TOKEN)


def _split_on_specials(text: str, specials: Sequence[str]):
  """Yield (chunk, is_special) splitting on special-token literals
  anywhere in the text (HF PreTrainedTokenizer trie-split semantics:
  case-sensitive, before lower-casing, mid-word matches allowed)."""
  pos = 0
  while pos < len(text):
    nxt, tok = None, None
    for s in specials:
      i = text.find(s, pos)
      if i != -1 and (nxt is None or i < nxt
                      or (i == nxt and len(s) > len(tok))):
        nxt, tok = i, s
    if nxt is None:
      yield text[pos:], False
      return
    if nxt > pos:
      yield text[pos:nxt], False
    yield tok, True
    pos = nxt + len(tok)


class WordPieceTokenizer:
  """BERT-compatible tokenizer over a vocab.txt file."""

  cls_token = CLS_TOKEN
  sep_token = SEP_TOKEN
  pad_token = PAD_TOKEN
  unk_token = UNK_TOKEN

  def __init__(self, vocab_file, do_lower_case: bool = True):
    self.vocab = load_vocab(vocab_file)
    self.inv_vocab = {v: k for k, v in self.vocab.items()}
    self.basic = BasicTokenizer(do_lower_case=do_lower_case)
    self.wordpiece = WordPiece(self.vocab)
    self.vocab_size = len(self.vocab)
    self._specials = [t for t in SPECIAL_TOKENS if t in self.vocab]
    self._native = _load_native(vocab_file, do_lower_case)

  def tokenize(self, text: str) -> List[str]:
    # Special-token literals pass through verbatim, matched anywhere in
    # the raw text (HF tokens_trie behavior).
    if any(s in text for s in self._specials):
      out: List[str] = []
      for chunk, is_special in _split_on_specials(text, self._specials):
        if is_special:
          out.append(chunk)
        else:
          out.extend(self._tokenize_chunk(chunk))
      return out
    return self._tokenize_chunk(text)

  def _tokenize_chunk(self, text: str) -> List[str]:
    # The native path implements the ASCII subset of BERT basic
    # tokenization; non-ASCII text takes the full-Unicode Python path.
    if self._native is not None and text.isascii():
      native = self._native.tokenize(text)
      if native is not None:
        return native
    out: List[str] = []
    for tok in self.basic.tokenize(text):
      out.extend(self.wordpiece.tokenize(tok))
    return out

  def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
    unk = self.vocab[self.unk_token]
    return [self.vocab.get(t, unk) for t in tokens]

  def convert_ids_to_tokens(self, ids: Sequence[int]) -> List[str]:
    return [self.inv_vocab.get(int(i), self.unk_token) for i in ids]

  def encode(self, text: str, max_len: Optional[int] = None,
             special_tokens: bool = True) -> List[int]:
    tokens = self.tokenize(text)
    if special_tokens:
      tokens = [self.cls_token] + tokens + [self.sep_token]
    if max_len is not None:
      tokens = tokens[:max_len]
      if special_tokens:
        tokens[-1] = self.sep_token
    return self.convert_tokens_to_ids(tokens)


# ---------------------------------------------------------------------------
# Optional C++ fast path
# ---------------------------------------------------------------------------

_NATIVE_LIB = None


def _native_lib_path() -> pathlib.Path:
  return pathlib.Path(__file__).resolve().parent.parent / "native" / "libwordpiece.so"


class _NativeWordPiece:
  """ctypes wrapper around native/wordpiece.cc."""

  def __init__(self, lib, vocab_file: str, do_lower_case: bool):
    self._lib = lib
    self._handle = lib.wp_create(vocab_file.encode(), int(do_lower_case))
    if not self._handle:
      raise RuntimeError("wp_create failed")

  def tokenize(self, text: str) -> Optional[List[str]]:
    buf = ctypes.create_string_buffer(4 * len(text.encode()) + 4096)
    n = self._lib.wp_tokenize(self._handle, text.encode(), buf, len(buf))
    if n < 0:
      return None  # non-ASCII or overflow: caller falls back to Python
    raw = buf.value.decode("utf-8", errors="replace")
    return raw.split("\x01") if raw else []


def _load_native(vocab_file, do_lower_case: bool):
  """Load the C++ WordPiece library if built; silently fall back otherwise."""
  global _NATIVE_LIB
  if os.environ.get("MMT_TPU_DISABLE_NATIVE"):
    return None
  path = _native_lib_path()
  if not path.exists():
    return None
  try:
    if _NATIVE_LIB is None:
      lib = ctypes.CDLL(str(path))
      lib.wp_create.restype = ctypes.c_void_p
      lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
      lib.wp_tokenize.restype = ctypes.c_int
      lib.wp_tokenize.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_char_p, ctypes.c_int]
      _NATIVE_LIB = lib
    return _NativeWordPiece(_NATIVE_LIB, str(vocab_file), do_lower_case)
  except Exception as e:  # pragma: no cover - depends on local build
    logger.warning("native wordpiece unavailable (%s); using python path", e)
    return None


# ---------------------------------------------------------------------------
# Word-embedding tokenizer (word2vec / GloVe), gensim-free
# ---------------------------------------------------------------------------


def read_word2vec(path) -> tuple[List[str], np.ndarray]:
  """Read word2vec .bin/.txt (or GloVe .txt without header)."""
  path = str(path)
  if path.endswith(".bin"):
    with open(path, "rb") as f:
      header = f.readline().split()
      n_words, dim = int(header[0]), int(header[1])
      words, vecs = [], np.empty((n_words, dim), dtype=np.float32)
      for i in range(n_words):
        chars = []
        while True:
          ch = f.read(1)
          if ch == b" ":
            break
          if ch != b"\n":
            chars.append(ch)
        words.append(b"".join(chars).decode("utf-8", errors="replace"))
        vecs[i] = np.frombuffer(f.read(4 * dim), dtype=np.float32)
    return words, vecs
  # text format; detect presence of a "<count> <dim>" header line
  with open(path, encoding="utf-8") as f:
    first = f.readline().rstrip("\n").split(" ")
    has_header = len(first) == 2 and all(p.isdigit() for p in first)
    rows: List[np.ndarray] = []
    words = []
    if not has_header:
      words.append(first[0])
      rows.append(np.asarray(first[1:], dtype=np.float32))
    for line in f:
      parts = line.rstrip("\n").split(" ")
      words.append(parts[0])
      rows.append(np.asarray(parts[1:], dtype=np.float32))
  return words, np.stack(rows)


class WeTokenizer:
  """Whitespace tokenizer over a word-embedding vocabulary.

  Parity with /root/reference/model/txt_embeddings.py:64-113: rows for
  [PAD]/[UNK] are prepended as zeros; tokenize() lower-cases, strips
  non-alnum chars, and drops OOV words (falling back to [UNK]).
  """

  cls_token = PAD_TOKEN   # unused; text path has no special tokens
  sep_token = PAD_TOKEN
  pad_token = PAD_TOKEN
  unk_token = UNK_TOKEN

  def __init__(self, we_filepath, freeze: bool = False):
    words, vecs = read_word2vec(we_filepath)
    self.text_dim = vecs.shape[1]
    self.weights = np.concatenate(
        [np.zeros((2, self.text_dim), dtype=np.float32), vecs.astype(np.float32)])
    self.words = [PAD_TOKEN, UNK_TOKEN] + list(words)
    self._index = {w: i for i, w in enumerate(self.words)}
    self.freeze = freeze
    self.vocab_size = len(self.words)

  def tokenize(self, text: str) -> List[str]:
    words = ["".join(e for e in w if e.isalnum()) for w in text.lower().split(" ")]
    words = [w for w in words if w in self._index]
    return words or [UNK_TOKEN]

  def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
    return [self._index.get(t, 1) for t in tokens]

  def convert_ids_to_tokens(self, ids: Sequence[int]) -> List[str]:
    return [self.words[int(i)] for i in ids]


def create_tokenizer(tokenizer_type: str,
                     vocab_file=None,
                     we_filepath=None):
  """Tokenizer factory (utils/nlp_utils.py:19-42 semantics).

  ``bert*`` -> WordPiece over ``vocab_file`` (defaults to the env var
  MMT_TPU_BERT_VOCAB or data/bert-base-cased-vocab.txt);
  ``wo2v*``/``grvl*`` -> WeTokenizer over word vectors.
  """
  if tokenizer_type.startswith("bert"):
    vocab_file = (vocab_file or os.environ.get("MMT_TPU_BERT_VOCAB")
                  or "data/bert-base-cased-vocab.txt")
    return WordPieceTokenizer(vocab_file, do_lower_case=True)
  if tokenizer_type.startswith(("wo2v", "grvl")):
    freeze = tokenizer_type.endswith("frz")
    we_filepath = we_filepath or os.environ.get("MMT_TPU_WORD_VECTORS")
    return WeTokenizer(we_filepath, freeze=freeze)
  return None
