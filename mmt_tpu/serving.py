"""Retrieval serving: precomputed video index + jitted query engine.

Beyond the reference's surface (it has no serving story): embed a corpus
once into an on-disk index (per-modality embeddings + MoE weights), then
answer free-text queries with one jitted text-tower forward + the fused
MoE similarity + an on-device top-k.

  index = RetrievalIndex.build(model, variables, loader)     # or .load()
  engine = RetrievalEngine(model, variables, tokenizer, index)
  hits = engine.search(["a man cooking pasta"], topk=5)
"""

from __future__ import annotations

import dataclasses
import http.server
import json
import logging
import pathlib
import threading
import time
import urllib.parse
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from mmt_tpu.data.sample import crop_or_pad_tokens, tokenize_caption
from mmt_tpu.ops import similarity as similarity_ops

logger = logging.getLogger(__name__)


def _next_pow2(n: int) -> int:
  return 1 << max(0, (int(n) - 1)).bit_length()


def _quantize_rows_int8(flat: np.ndarray):
  """Symmetric per-row int8 quantization: ``flat ~= scale[:, None] * q8``.

  One fp32 scale per row (= per video) over the weight-scaled flattened
  [N, M*D] index; all-zero rows get scale 1 so they stay exactly zero.
  """
  scale = np.abs(flat).max(axis=1) / 127.0
  scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
  q8 = np.clip(np.rint(flat / scale[:, None]), -127, 127).astype(np.int8)
  return q8, scale


def _int8_moe_similarity(text_embds, text_weights,
                         vid_q8, vid_scale, vid_weights):
  """MoE similarity against a row-quantized int8 index.

  Same math as ops/similarity.py's two-contraction fusion
  (/root/reference/model/model.py:789-837 semantics), with the index's
  weight-scaled flattened rows stored int8 + one fp32 scale per video.
  Queries are quantized the same way at request time, the big [Q, M*D] x
  [M*D, V] contraction runs int8 x int8 -> int32 on the MXU (2x bf16
  MACs/cycle on v5e, and 4x less index HBM traffic than fp32 — serving at
  large V is index-bandwidth-bound), and the result is rescaled by the
  two row scales.  The MoE denominator stays exact fp32 ([Q,M] x [M,V] —
  negligible).  Under a video-axis-sharded mesh every step here is a
  plain XLA op, so GSPMD partitions it natively (shard-local blocks, no
  index gather).
  """
  q, m, d = text_embds.shape
  tw = text_weights.astype(jnp.float32)
  tf = (text_embds.astype(jnp.float32) * tw[:, :, None]).reshape(q, m * d)
  ts = jnp.abs(tf).max(axis=1) / 127.0
  ts = jnp.where(ts == 0, 1.0, ts)
  tq8 = jnp.clip(jnp.round(tf / ts[:, None]), -127, 127).astype(jnp.int8)
  dots = jax.lax.dot_general(tq8, vid_q8, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
  numer = dots.astype(jnp.float32) * ts[:, None] * vid_scale[None, :]
  denom = jnp.einsum("qm,vm->qv", tw, vid_weights.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
  denom = jnp.where(denom == 0, similarity_ops.EPS_ZERO_GUARD, denom)
  return numer / denom


@dataclasses.dataclass
class RetrievalIndex:
  """Embedded corpus: [N, M, D] video embeddings + [N, M] MoE weights."""
  vid_embds: np.ndarray
  vid_weights: np.ndarray
  video_ids: List[str]
  paths: List[str]

  @classmethod
  def build(cls, model, variables, loader, dataset=None) -> "RetrievalIndex":
    """Embed every video served by ``loader`` (an eval BatchLoader)."""
    from mmt_tpu.train.trainer import model_batch

    # Variables are a jit ARGUMENT, never a closure: closing over the
    # params pytree bakes it into HLO constants, which the remote-compile
    # tunnel rejects at flagship scale (CLAUDE.md; trainer.py does the
    # same for its steps).
    @jax.jit
    def embed(variables, batch):
      return model.apply(variables, batch, train=False,
                         method=model.embed_video)

    embds, weights, paths = [], [], []
    for batch in loader:
      out = embed(variables, model_batch(batch))
      embds.append(np.asarray(out["vid_embds"]))
      weights.append(np.asarray(out["vid_weights"]))
      paths.extend(batch.get("paths", []))
    vid_embds = np.concatenate(embds, 0)
    vid_weights = np.concatenate(weights, 0)
    if dataset is not None and hasattr(dataset, "vid_list"):
      video_ids = list(dataset.vid_list)[:len(vid_embds)]
    else:
      video_ids = [f"video{i}" for i in range(len(vid_embds))]
    return cls(vid_embds, vid_weights, video_ids,
               paths or [""] * len(vid_embds))

  def extend(self, other: "RetrievalIndex") -> "RetrievalIndex":
    """Append another index's videos in place (incremental corpus growth).

    New content is embedded once via :meth:`build` over a loader that
    serves only the new videos, then appended here — the existing corpus
    is never re-embedded.  Geometry must match (same modality count and
    embedding width, i.e. the same model/config produced both) and ids
    must stay unique; both are validated before anything mutates.
    Engines serving this index pick the rows up via
    :meth:`RetrievalEngine.refresh`.
    """
    if other.vid_embds.shape[1:] != self.vid_embds.shape[1:]:
      raise ValueError(
          f"index geometry mismatch: existing rows are "
          f"{self.vid_embds.shape[1:]}, new rows are "
          f"{other.vid_embds.shape[1:]} (different model/config?)")
    dup = set(self.video_ids) & set(other.video_ids)
    if dup:
      raise ValueError(f"duplicate video_ids: {sorted(dup)[:5]}"
                       f"{'...' if len(dup) > 5 else ''}")
    self.vid_embds = np.concatenate([self.vid_embds, other.vid_embds], 0)
    self.vid_weights = np.concatenate(
        [self.vid_weights, other.vid_weights], 0)
    self.video_ids = list(self.video_ids) + list(other.video_ids)
    self.paths = list(self.paths) + list(other.paths)
    return self

  def remove(self, ids) -> "RetrievalIndex":
    """Drop videos by id in place.  Unknown ids raise KeyError (a typo'd
    removal silently leaving stale content in a served index is the
    failure mode this guards)."""
    drop = set(ids)
    unknown = drop - set(self.video_ids)
    if unknown:
      raise KeyError(f"video_ids not in index: {sorted(unknown)[:5]}"
                     f"{'...' if len(unknown) > 5 else ''}")
    keep = np.array([v not in drop for v in self.video_ids], bool)
    self.vid_embds = self.vid_embds[keep]
    self.vid_weights = self.vid_weights[keep]
    self.video_ids = [v for v, k in zip(self.video_ids, keep) if k]
    self.paths = [p for p, k in zip(self.paths, keep) if k]
    return self

  def save(self, path) -> None:
    # ids/paths are stored newline-joined; an embedded "\n" would split
    # into phantom entries on load and desynchronize ids from embeddings.
    for name, vals in (("video_ids", self.video_ids), ("paths", self.paths)):
      bad = next((v for v in vals if "\n" in str(v)), None)
      if bad is not None:
        raise ValueError(f"{name} entry contains a newline and would break "
                         f"the index round-trip: {bad!r}")
    blob = serialization.msgpack_serialize({
        "vid_embds": self.vid_embds,
        "vid_weights": self.vid_weights,
        "video_ids": "\n".join(self.video_ids),
        "paths": "\n".join(str(p) for p in self.paths),
    })
    pathlib.Path(path).write_bytes(blob)

  @classmethod
  def load(cls, path) -> "RetrievalIndex":
    raw = serialization.msgpack_restore(pathlib.Path(path).read_bytes())
    vid_embds = np.asarray(raw["vid_embds"])
    # "".split("\n") == [""], so an EMPTIED index (remove() can legally
    # drain it) would round-trip into one phantom "" id desynchronized
    # from the 0 embedding rows; condition the parse on the row count.
    n = len(vid_embds)
    video_ids = raw["video_ids"].split("\n") if n else []
    paths = raw["paths"].split("\n") if n else []
    if len(video_ids) != n or len(paths) != n:
      raise ValueError(
          f"corrupt index at {path}: {n} embedding rows but "
          f"{len(video_ids)} video_ids / {len(paths)} paths")
    return cls(vid_embds, np.asarray(raw["vid_weights"]), video_ids, paths)

  def __len__(self):
    return len(self.vid_embds)


class RetrievalEngine:
  """Free-text video search over a RetrievalIndex.

  With ``mesh`` (a 1-D ``data`` mesh from mmt_tpu.parallel.mesh), the
  index is sharded across chips on the video axis and GSPMD inserts the
  shard-local similarity matmuls + the cross-chip top-k merge — the
  corpus then scales with aggregate HBM instead of one chip's.  Queries
  are replicated (they're [B, 1, T, 2] int32 — tiny).

  With ``quantize="int8"`` the index is stored as per-row symmetric int8
  (+ one fp32 scale per video): 4x less index HBM than fp32 and the
  query contraction runs on the MXU's int8 path — an approximation
  (ranking-stable in practice; scores shift by O(1e-3) for normalized
  embeddings), chosen per-engine so exact and quantized engines can
  serve side by side from one RetrievalIndex.  Composes with ``mesh``.
  """

  def __init__(self, model, variables, tokenizer, index: RetrievalIndex,
               max_text_words: int = 30, mesh=None, quantize=None):
    if quantize not in (None, "int8"):
      raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
    self.model = model
    self.variables = variables
    self.tokenizer = tokenizer
    self.index = index
    self.max_text_words = max_text_words
    self.mesh = mesh
    self.quantize = quantize

    # Params live on device once; queries pass them as jit ARGUMENTS.
    # Closing over the pytree would bake ~132M params into HLO constants
    # — the exact remote-compile-tunnel failure CLAUDE.md documents (the
    # trainer threads variables the same way, trainer.py train/embed
    # steps).  Under a mesh they are explicitly replicated.
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      self._dev_variables = jax.device_put(variables,
                                           NamedSharding(mesh, P()))
    else:
      self._dev_variables = jax.device_put(variables)

    # search() and refresh() serialize on this lock, and search maps
    # top-k rows through the id/path SNAPSHOT taken when the device
    # arrays were staged — never through the live (mutable) index.  A
    # handler thread mid-search therefore always sees one consistent
    # (device arrays, ids) pair, even while another thread mutates the
    # index in place (extend/remove) and calls refresh().
    self._lock = threading.RLock()
    self._stage_index(index)

  def refresh(self, index: RetrievalIndex = None) -> None:
    """Pick up index mutations (RetrievalIndex.extend/remove, or a whole
    new index) without rebuilding the engine: re-pads, re-quantizes and
    re-stages the device-side arrays and recreates the query closure
    (it captures the real-row count).  The model never re-embeds
    existing videos and the staged params are reused as-is.  A changed
    corpus size recompiles the next query (new operand shape) — same
    cost as any new request-shape bucket (~5 s over the tunnel,
    sub-second locally)."""
    with self._lock:
      if index is not None:
        self.index = index
      self._stage_index(self.index)

  def _stage_index(self, index: RetrievalIndex) -> None:
    mesh, quantize = self.mesh, self.quantize
    model = self.model
    # Consistent-snapshot contract: these tuples are what search() maps
    # top-k indices through, frozen together with the staged device
    # arrays (the live index.video_ids list may mutate between a
    # remove() and the refresh() that re-stages).
    self._staged_ids = tuple(index.video_ids)
    self._staged_paths = tuple(index.paths)
    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    pad = (-len(index.vid_embds)) % n_shards
    embds, weights = index.vid_embds, index.vid_weights
    if pad:
      # Pad rows carry zero MoE weights -> denominator eps-guard makes
      # their sims ~0; with L1-normalized true weights every real sim
      # is > the guard floor, so pads never reach the top-k for any
      # non-degenerate index.  (The n_real mask in query_fn kills them
      # outright in any case.)
      embds = np.concatenate([embds, np.zeros((pad,) + embds.shape[1:],
                                              embds.dtype)], 0)
      weights = np.concatenate([weights,
                                np.zeros((pad, weights.shape[1]),
                                         weights.dtype)], 0)
    if quantize == "int8":
      # Store the weight-scaled flattened index rows int8 (+ fp32 row
      # scales): 4x less HBM than fp32 and the query contraction runs on
      # the MXU's int8 path (_int8_moe_similarity).  Weights stay fp32
      # for the exact MoE denominator.
      flat = (embds.astype(np.float32)
              * weights[:, :, None].astype(np.float32))
      q8, scale = _quantize_rows_int8(flat.reshape(len(embds), -1))
      host_index = (q8, scale, weights.astype(np.float32))
    else:
      host_index = (embds, weights)
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      shard = NamedSharding(mesh, P("data"))
      self._dev_index = tuple(jax.device_put(a, shard) for a in host_index)
    else:
      self._dev_index = tuple(jnp.asarray(a) for a in host_index)
    if quantize is None:
      # Kept under their historical names for tests/introspection.
      self._dev_embds, self._dev_weights = self._dev_index

    n_real = len(index)
    # XLA's einsum beats the Pallas similarity kernel at serving shapes
    # (measured on one v5e at [64, 100k]: 1.10 ms vs 1.58 ms — the
    # kernel's Q-axis tile padding wastes most of the MXU rows when Q is
    # a small query batch; the kernel only wins on large eval matrices).
    # Under a mesh the einsum partitions natively (shard-local [Q, V/n]
    # blocks; the top-k below merges across chips) so the index is never
    # gathered on either path.
    prefer_pallas = False

    def query_fn(variables, token_ids, *index_arrays, k):
      out = model.apply(variables, token_ids, train=False,
                        method=model.embed_text)
      b, c, m, d = out["text_embds"].shape
      text_embds = out["text_embds"].reshape(b * c, m, d)
      text_weights = out["text_weights"].reshape(b * c, m)
      if quantize == "int8":
        sims = _int8_moe_similarity(text_embds, text_weights, *index_arrays)
      else:
        vid_embds, vid_weights = index_arrays
        sims = similarity_ops.moe_similarity(
            text_embds, vid_embds, text_weights, vid_weights,
            merge="indep", num_caps=1, prefer_pallas=prefer_pallas)
      if sims.shape[1] != n_real:
        # Mesh-padding rows must never reach the top-k: their sims are 0
        # (eps-guarded), which would still outrank genuinely negative
        # videos.
        sims = jnp.where(jnp.arange(sims.shape[1])[None, :] < n_real,
                         sims, -jnp.inf)
      scores, idx = jax.lax.top_k(sims, k)
      return scores, idx

    # The raw (unjitted) callable is kept for the no-baked-constants
    # regression test (tests/test_serving.py).  k is a STATIC argument:
    # each distinct k compiles its own executable, so search() below
    # buckets both k and the query-batch size to powers of two — a
    # long-lived server sees O(log^2) compiles instead of one per
    # distinct (batch, topk) request shape (remote compiles cost ~5 s
    # over the tunnel).
    self._query_fn_raw = query_fn
    self._query_fn = jax.jit(query_fn, static_argnames="k")

  def encode_queries(self, texts: Sequence[str]) -> np.ndarray:
    rows = []
    for text in texts:
      ids = tokenize_caption(self.tokenizer, text.split(),
                             self.max_text_words)
      rows.append(crop_or_pad_tokens(ids, self.max_text_words))
    return np.stack(rows, 0)[:, None].astype(np.int32)   # [B, 1, T, 2]

  @property
  def num_videos(self) -> int:
    """Size of the corpus actually being served (the staged snapshot —
    the live index may differ between a mutation and refresh())."""
    return len(self._staged_ids)

  def search(self, texts: Sequence[str], topk: int = 5) -> List[List[Dict]]:
    with self._lock:
      return self._search_locked(texts, topk)

  def _search_locked(self, texts: Sequence[str], topk: int) -> List[List[Dict]]:
    n_staged = len(self._staged_ids)
    if int(topk) <= 0 or n_staged == 0:
      return [[] for _ in texts]   # "no results" probe, not "at least one"
    token_ids = self.encode_queries(texts)
    k_req = min(int(topk), n_staged)
    # Bucket the compiled shapes: batch rows pad up to the next power of
    # two (pad queries are all-zero token rows — fully masked attention
    # is uniform, not NaN — and their results are sliced away), k rounds
    # up likewise.  Entirely new request shapes then reuse executables.
    b_pad = _next_pow2(len(texts)) - len(texts)
    if b_pad:
      token_ids = np.concatenate(
          [token_ids, np.zeros((b_pad,) + token_ids.shape[1:],
                               token_ids.dtype)], 0)
    k_jit = min(_next_pow2(k_req), n_staged)
    scores, idx = self._query_fn(self._dev_variables, token_ids,
                                 *self._dev_index, k=k_jit)
    # Start BOTH device->host copies before the first blocking read:
    # sequential np.asarray reads cost one full dispatch round trip EACH
    # (measured through the HTTP server at [1 x 100k]: p50 54 ms -> 30 ms
    # over the tunnel, scripts/bench_serving.py / docs/SERVING.md) —
    # the same one-deep transfer pipelining the trainer's loss-window
    # reads use.
    for arr in (scores, idx):
      try:
        arr.copy_to_host_async()
      except AttributeError:  # non-PJRT array types (CPU tests)
        pass
    scores, idx = np.asarray(scores), np.asarray(idx)
    results = []
    for q in range(len(texts)):
      hits = []
      for rank in range(min(k_req, idx.shape[1])):
        v = int(idx[q, rank])
        hits.append({"video_id": self._staged_ids[v],
                     "path": self._staged_paths[v],
                     "score": float(scores[q, rank]),
                     "rank": rank})
      results.append(hits)
    return results


# ---------------------------------------------------------------------------
# HTTP serving.  Beyond the reference's surface (no serving story there);
# a deliberately dependency-free JSON endpoint over RetrievalEngine:
#
#   GET  /healthz                          -> {"ok": true, "videos": N}
#   GET  /search?q=<text>[&q=...][&topk=K] -> {"results": [[hit, ...], ...]}
#   POST /search  {"queries": [...], "topk": K}  (same response shape)
#
# Handler threads serialize on one lock around the jitted query: the
# TPU dispatch path is single-stream (and the tunnel serves one program
# at a time), so concurrency buys batching at the client, not here —
# send multiple q= terms / queries entries per request to batch.
# ---------------------------------------------------------------------------


class _ServerStats:
  """Per-server request counters + a bounded search-latency reservoir.

  Feeds the /statz endpoint: operational visibility (p50/p90/p99 search
  latency as measured AT the server, incl. device dispatch; error/request
  counts) without any dependency beyond the stdlib.  The reservoir keeps
  the most recent ``maxlen`` samples — long-lived servers report current
  behavior, not a lifetime average.
  """

  def __init__(self, maxlen: int = 4096):
    import collections
    self._lock = threading.Lock()
    self._lat = collections.deque(maxlen=maxlen)
    self.requests = 0
    self.errors = 0
    self.queries = 0
    self.started = time.time()

  def record(self, latency_s: float, n_queries: int) -> None:
    with self._lock:
      self._lat.append(latency_s)
      self.requests += 1
      self.queries += n_queries

  def record_error(self) -> None:
    with self._lock:
      self.errors += 1

  def snapshot(self) -> Dict:
    with self._lock:
      lat = sorted(self._lat)
      out = {"requests": self.requests, "errors": self.errors,
             "queries": self.queries,
             "uptime_s": round(time.time() - self.started, 1)}
    if lat:
      def pct(p):
        return round(1e3 * lat[min(len(lat) - 1,
                                   int(p / 100 * len(lat)))], 2)
      out["search_latency_ms"] = {
          "count": len(lat), "mean": round(1e3 * sum(lat) / len(lat), 2),
          "p50": pct(50), "p90": pct(90), "p99": pct(99),
          "max": round(1e3 * lat[-1], 2)}
    return out


class _RetrievalHandler(http.server.BaseHTTPRequestHandler):
  engine: "RetrievalEngine" = None  # type: ignore[assignment]
  lock: threading.Lock = None       # type: ignore[assignment]
  stats: _ServerStats = None        # type: ignore[assignment]
  max_queries = 256

  def _reply(self, code: int, payload: Dict) -> None:
    blob = json.dumps(payload).encode("utf-8")
    self.send_response(code)
    self.send_header("Content-Type", "application/json")
    self.send_header("Content-Length", str(len(blob)))
    self.end_headers()
    self.wfile.write(blob)

  def _search(self, queries: List[str], topk: int) -> None:
    if not queries:
      self._reply(400, {"error": "no queries given"})
      return
    if len(queries) > self.max_queries:
      self._reply(400, {"error": f"max {self.max_queries} queries/request"})
      return
    if not all(isinstance(q, str) and q.strip() for q in queries):
      self._reply(400, {"error": "queries must be non-empty strings"})
      return
    # topk <= 0 means "no results" (engine contract, search() above) —
    # the clamp only caps at the index size, it must not floor at 1.
    topk = max(0, min(int(topk), self.engine.num_videos))
    t0 = time.perf_counter()
    try:
      with self.lock:
        results = self.engine.search(queries, topk=topk)
    except Exception:
      if self.stats is not None:
        self.stats.record_error()
      raise
    if self.stats is not None:
      self.stats.record(time.perf_counter() - t0, len(queries))
    self._reply(200, {"results": results})

  def do_GET(self):  # noqa: N802 (stdlib API name)
    url = urllib.parse.urlparse(self.path)
    if url.path == "/healthz":
      self._reply(200, {"ok": True, "videos": self.engine.num_videos})
      return
    if url.path == "/statz":
      stats = self.stats.snapshot() if self.stats is not None else {}
      self._reply(200, {"videos": self.engine.num_videos, **stats})
      return
    if url.path == "/search":
      qs = urllib.parse.parse_qs(url.query)
      try:
        topk = int(qs.get("topk", ["5"])[0])
      except ValueError:
        self._reply(400, {"error": "topk must be an integer"})
        return
      self._search(qs.get("q", []), topk)
      return
    self._reply(404, {"error": f"unknown path {url.path!r}"})

  def do_POST(self):  # noqa: N802
    url = urllib.parse.urlparse(self.path)
    if url.path != "/search":
      self._reply(404, {"error": f"unknown path {url.path!r}"})
      return
    try:
      length = int(self.headers.get("Content-Length", "0"))
      body = json.loads(self.rfile.read(length) or b"{}")
      queries = body.get("queries", [])
      topk = int(body.get("topk", 5))
    except (ValueError, json.JSONDecodeError) as exc:
      self._reply(400, {"error": f"bad request body: {exc}"})
      return
    if not isinstance(queries, list):
      self._reply(400, {"error": "'queries' must be a list of strings"})
      return
    self._search(queries, topk)

  def log_message(self, fmt, *args):  # route to logging, not stderr
    logger.info("%s - %s", self.address_string(), fmt % args)


def serve_http(engine: RetrievalEngine, host: str = "127.0.0.1",
               port: int = 8080, block: bool = True):
  """Serve ``engine`` over HTTP.  ``block=False`` starts a daemon thread
  and returns the ``ThreadingHTTPServer`` (tests: call ``.shutdown()``);
  the bound port is ``server.server_address[1]`` (pass ``port=0`` for an
  ephemeral one)."""
  handler = type("BoundHandler", (_RetrievalHandler,),
                 {"engine": engine, "lock": threading.Lock(),
                  "stats": _ServerStats()})
  server = http.server.ThreadingHTTPServer((host, port), handler)
  server.stats = handler.stats  # introspection (scripts, tests)
  logger.info("serving retrieval API on http://%s:%d (index: %d videos)",
              server.server_address[0], server.server_address[1],
              len(engine.index))
  if not block:
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
  # Graceful SIGTERM (the preemption signal on managed fleets): finish
  # in-flight requests, then return.  shutdown() must run off the
  # serve_forever thread, hence the helper thread.
  import signal

  def _sigterm(signum, frame):
    logger.info("SIGTERM: shutting down retrieval API")
    threading.Thread(target=server.shutdown, daemon=True).start()

  prev = None
  try:
    prev = signal.signal(signal.SIGTERM, _sigterm)
  except ValueError:
    pass  # not on the main thread; rely on KeyboardInterrupt/.shutdown()
  try:
    server.serve_forever()
  except KeyboardInterrupt:
    pass
  finally:
    if prev is not None:
      signal.signal(signal.SIGTERM, prev)
    server.server_close()
  return server
