"""CENet: the full cross-modal architecture.

Functional rebuild of /root/reference/model/model.py:45-680 with every
config switch:

* ``txt_agg``: bert{ftn,frz[N]}{cls,mxp,mnp} | vlad | mxp | lstm
  (model/model.py:137-227, :349-409)
* ``txt_pro``: gbn | gem | lin                  (model/model.py:229-242)
* ``txt_wgh`` / ``vid_wgh``: emb | nrm | none   (model/model.py:244-310)
* ``vid_cont``: bert | coll | none              (model/model.py:109-135)
* ``vid_inp``: agg | both | all | temp          (model/model.py:420-437)
* ``pos_enc``: tint | ordr | type | none        (model/model.py:513-551)
* ``out_tok``: sep | mxp | mnp                  (model/model.py:534-540)
* missing-modality masking + L1/L2 normalizations (model/model.py:599-625)

TPU-native difference: the video token sequence is assembled with static
concatenations (one per modality segment), not the reference's per-token
python loop (model/model.py:487-567); all shapes are static per config.

The module returns per-modality embeddings + MoE weights; the similarity
matrix is a separate fused op (mmt_tpu/ops/similarity.py) so the trainer
can insert the cross-device all-gather between the two under data
parallelism (the analogue of the reference's out='embds' mode,
trainer/trainer.py:185-199).
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmt_tpu.config import BertParams, TxtAggSpec, TEXT_BERT_BASE_CASED
from mmt_tpu.models import components as C
from mmt_tpu.models.bert import FeatureBert, TextBert
from mmt_tpu.ops import similarity as similarity_ops

# Video-sequence token ids (model/model.py:486): 0=[CLS] 2=[AGG] 6=[FEA].
CLS_ID, AGG_ID, FEA_ID = 0, 2, 6


def cenet_kwargs_from_arch_args(arch_args, tokenizer):
  """CENet constructor kwargs from an experiment's ``arch.args``.

  The single place where config-surface knobs become constructor
  arguments — train.py and scripts/serve.py MUST build the model through
  this (a divergence here means serving silently loads a checkpoint into
  a differently-shaped tree; the word-embedding rows then keep their
  random init).  Handles:

  * reference-inert keys dropped (``vocab_size`` — the reference also
    only reads it for its word-embedding path);
  * ``txt_bert_init`` extracted and RETURNED (training-only knob, not a
    CENet argument);
  * ``compute_dtype`` string -> jnp dtype;
  * text vocab sizing from the tokenizer: bert towers get
    ``text_bert_geometry.vocab_size`` (when a custom geometry or
    MMT_TPU_BERT_VOCAB is in play), word-embedding paths get
    ``we_vocab_size``/``we_dim`` — mirroring the reference, where the
    HF tokenizer and pretrained tower agree by construction
    (model/model.py:161, utils/nlp_utils.py:19-42).

  Returns ``(kwargs, txt_bert_init_path_or_None)``.
  """
  import os

  kwargs = {k: v for k, v in dict(arch_args).items()
            if k not in ("vocab_size",)}
  txt_bert_init = kwargs.pop("txt_bert_init", None)
  if "compute_dtype" in kwargs:
    kwargs["compute_dtype"] = jnp.dtype(kwargs["compute_dtype"])
  if tokenizer is not None and hasattr(tokenizer, "vocab_size"):
    geom = dict(kwargs.get("text_bert_geometry") or {})
    if dict(arch_args).get("txt_agg", "bert")[:4] != "bert":
      kwargs.setdefault("we_vocab_size", tokenizer.vocab_size)
      if hasattr(tokenizer, "text_dim"):
        kwargs.setdefault("we_dim", tokenizer.text_dim)
    elif "vocab_size" in geom or os.environ.get("MMT_TPU_BERT_VOCAB"):
      geom.setdefault("vocab_size", tokenizer.vocab_size)
      kwargs["text_bert_geometry"] = geom
  return kwargs, txt_bert_init


class CENet(nn.Module):
  """Cross-modal video/text retrieval network."""
  expert_dims: Mapping[str, Mapping[str, int]]   # name -> {dim, idx} (sorted)
  vid_bert_params: Mapping[str, Any]
  txt_bert_params: Optional[Mapping[str, Any]] = None
  text_bert_geometry: Optional[Mapping[str, Any]] = None  # test override
  keep_missing_modalities: bool = True
  test_caption_mode: str = "indep"
  txt_inp: str = "bertftn"
  txt_agg: str = "bertftn"
  txt_pro: str = "gbn"
  txt_wgh: str = "emb"
  vid_inp: str = "both"
  vid_cont: str = "bert"
  vid_wgh: str = "none"
  pos_enc: str = "tint"
  out_tok: str = "mxp"
  same_dim: int = 512
  l2renorm: bool = False          # stored for config parity (unused, as in ref)
  normalize_experts: bool = True
  # Accepted-but-inert knobs from the reference CENet signature
  # (model/model.py:48-73): stored so reference configs load unmodified.
  freeze_weights: bool = False
  mimic_ce_dims: bool = False
  concat_experts: bool = False
  concat_mix_experts: bool = False
  use_experts: str = "origfeat"
  use_mask: str = "nomask"
  agg_dims: Optional[Any] = None
  we_vocab_size: int = 0          # word-embedding path (txt_agg vlad/mxp/lstm)
  we_dim: int = 768
  compute_dtype: Any = jnp.float32

  @property
  def modalities(self):
    return list(self.expert_dims.keys())

  # -- static sequence geometry -------------------------------------------
  def video_seq_len(self, max_expert_tokens: int) -> int:
    n = 1  # CLS
    for _ in self.modalities:
      if self.vid_inp in ("agg", "both", "all"):
        n += 1
      if self.vid_inp in ("temp", "both", "all"):
        n += max_expert_tokens
    return n

  def setup(self):
    mods = self.modalities
    vid_cfg = BertParams.from_dict(dict(self.vid_bert_params))
    self.txt_agg_spec = TxtAggSpec.parse(self.txt_agg)

    # --- text encoder ---
    if self.txt_agg_spec.kind == "bert":
      geom = dict(self.text_bert_geometry or {})
      base = {f: getattr(TEXT_BERT_BASE_CASED, f)
              for f in TEXT_BERT_BASE_CASED.__dataclass_fields__}
      base.update(geom)
      if self.txt_bert_params:
        base.update({k: v for k, v in self.txt_bert_params.items()
                     if k in base})
      self.txt_bert_cfg = BertParams(**base)
      self.txt_bert = TextBert(self.txt_bert_cfg, dtype=self.compute_dtype,
                               name="txt_bert")
      text_dim = self.txt_bert_cfg.hidden_size
    else:
      assert self.we_vocab_size > 0, "word-embedding path needs we_vocab_size"
      self.word_embeddings = C.TxtEmbeddings(self.we_vocab_size, self.we_dim,
                                             name="word_embeddings")
      if self.txt_agg == "vlad":
        self.text_pooling = C.NetVLAD(cluster_size=28,
                                      feature_size=self.we_dim,
                                      name="text_pooling")
        text_dim = 28 * self.we_dim
      elif self.txt_agg == "lstm":
        self.text_pooling = C.LSTMPooler(hidden_dim=512, output_dim=512,
                                         name="text_pooling")
        text_dim = 512
      else:  # mxp / mnp
        text_dim = self.we_dim
    self.text_dim = text_dim

    # Per-modality heads run as batched einsums over stacked weights
    # (TPU-first replacement for the reference's python loop,
    # model/model.py:413-418); MMT_TPU_BATCHED_HEADS=0 falls back to the
    # per-modality loop OVER THE SAME parameter holders for A/B perf
    # measurement — both paths are the same math (docs/PERF.md).
    import os as _os
    self.batched_heads = bool(int(
        _os.environ.get("MMT_TPU_BATCHED_HEADS", "1")))

    # --- per-modality text projections (checkpoint tree preserved via
    # parameter holders: text_gu_<m>/fc, text_gu_<m>/cg/...) ---
    if self.txt_pro in ("gbn", "gem"):
      self.text_gu = {m: C.GEUParams(
          self.text_dim, self.same_dim, use_bn=self.txt_pro == "gbn",
          name=f"text_gu_{m}") for m in mods}
    elif self.txt_pro == "lin":
      self.text_gu = {m: C.ReduceDimParams(
          self.text_dim, self.same_dim, name=f"text_gu_{m}") for m in mods}
    else:
      raise ValueError(f"unknown txt_pro {self.txt_pro!r}")

    # --- video projections ---
    if self.vid_inp in ("agg", "both", "all", "temp"):
      self.video_dim_reduce = {
          m: C.ReduceDimParams(int(self.expert_dims[m]["dim"]),
                               self.same_dim,
                               name=f"video_dim_reduce_{m}")
          for m in mods}

    if self.vid_cont == "bert":
      # Continuous features are *added* to the embeddings
      # (model/bert.py:95-104), so the common expert dim must equal the
      # video transformer width (512 == 512 in every published config).
      assert vid_cfg.hidden_size == self.same_dim, (
          f"vid_bert hidden_size ({vid_cfg.hidden_size}) must equal "
          f"same_dim ({self.same_dim}) for the feature-additive embeddings")
      self.vid_bert = FeatureBert(vid_cfg, dtype=self.compute_dtype,
                                  name="vid_bert")
      self.vid_cfg = vid_cfg
    elif self.vid_cont == "coll":
      self.g_reason_1 = nn.Dense(self.same_dim, name="g_reason_1")
      self.g_reason_2 = nn.Dense(self.same_dim, name="g_reason_2")
      self.f_reason_1 = nn.Dense(self.same_dim, name="f_reason_1")
      self.f_reason_2 = nn.Dense(self.same_dim, name="f_reason_2")
      self.video_gu = {m: C.GatedEmbeddingUnitReasoning(
          self.same_dim, name=f"video_gu_{m}") for m in mods}
      rate = float(dict(self.vid_bert_params).get("hidden_dropout_prob",
                                                  0.1))
      self.coll_g_dropout = nn.Dropout(rate)
      self.coll_f_dropout = nn.Dropout(rate)
    elif self.vid_cont != "none":
      raise ValueError(f"unknown vid_cont {self.vid_cont!r}")

    if self.vid_wgh == "emb" and self.vid_cont != "bert":
      # The video MoE-weight head reads the CLS embedding, which only the
      # transformer path produces (the reference would NameError here,
      # model/model.py:592).
      raise ValueError("vid_wgh='emb' requires vid_cont='bert'")

    # --- MoE weight heads (M Dense(D->1) heads -> one [D, M] matmul) ---
    if self.txt_wgh == "emb":
      self.moe_fc_txt = {m: C.DenseParams(self.text_dim, 1,
                                          name=f"moe_fc_txt_{m}")
                         for m in mods}
      p = (self.txt_bert_params or {}).get("hidden_dropout_prob", 0.1)
      self.moe_txt_dropout = nn.Dropout(float(p))
    if self.vid_wgh == "emb":
      self.moe_fc_vid = {m: C.DenseParams(self.same_dim, 1,
                                          name=f"moe_fc_vid_{m}")
                         for m in mods}
      p = dict(self.vid_bert_params).get("hidden_dropout_prob", 0.1)
      self.moe_vid_dropout = nn.Dropout(float(p))

    self.vid_dropout_rate = float(
        dict(self.vid_bert_params).get("hidden_dropout_prob", 0.1))

  # ------------------------------------------------------------------
  def __call__(self, batch: Dict[str, Any], *, train: bool = False):
    """Returns per-modality embeddings and MoE weights.

    batch (static shapes, base/base_dataset.py:876-896 schema):
      token_ids [B,K,T,2] int32, query_masks [B,K],
      features / features_t / features_ind / features_avgpool /
      features_maxpool: dicts keyed by modality.
    """
    text_out = self.embed_text(batch["token_ids"], train=train)
    vid_out = self.embed_video(batch, train=train)
    return {**text_out, **vid_out}

  # ------------------------------------------------------------------
  def embed_text(self, token_ids, *, train: bool = False):
    """Caption tower only: token_ids [B,K,T,2] ->
    {text_embds [B,K,M,D], text_weights [B,K,M]}.  Exposed separately for
    the serving path (query embedding needs no video inputs)."""
    mods = self.modalities
    b, k, t, _ = token_ids.shape
    m = len(mods)
    flat_ids = token_ids.reshape(b * k, t, 2)
    input_ids = flat_ids[:, :, 0].astype(jnp.int32)
    attn_mask = flat_ids[:, :, 1].astype(jnp.int32)

    if self.txt_agg_spec.kind == "bert":
      # [1, T] (broadcast in the embedding add): constant-per-row id
      # tensors at batch size materialize a [B*K, T, H] gather per table;
      # as batch-1 rows the embedded [1, T, H] broadcast-adds fuse into
      # the embeddings LayerNorm (profiled VMEM-write-bound, docs/PERF.md).
      pos_ids = jnp.arange(t, dtype=jnp.int32)[None, :]
      type_ids = jnp.zeros((1, t), dtype=jnp.int32)
      last = self.txt_bert(input_ids, attn_mask, type_ids, pos_ids,
                           deterministic=not train)
      if self.txt_agg_spec.post_agg == "cls":
        text = last[:, 0]
      elif self.txt_agg_spec.post_agg == "mxp":
        text = jnp.max(last[:, 1:], axis=1)
      else:  # mnp
        text = jnp.mean(last[:, 1:], axis=1)
    else:
      word_embs = self.word_embeddings(input_ids)
      if self.txt_agg == "mxp":
        neg_inf = jnp.finfo(word_embs.dtype).min
        masked = jnp.where(attn_mask[:, :, None] == 0, neg_inf, word_embs)
        text = jnp.max(masked, axis=1)
      elif self.txt_agg == "vlad":
        text = self.text_pooling(word_embs, train=train)
      elif self.txt_agg == "lstm":
        lengths = jnp.sum(attn_mask, axis=1)
        text = self.text_pooling(word_embs, lengths)
      else:
        raise ValueError(f"unknown txt_agg {self.txt_agg!r}")

    # All per-modality text heads batched over the modality axis
    # (components.py batched_* — the params stay per-modality holders).
    gu_parts = [self.text_gu[mod]() for mod in mods]
    # Heads run fp32 regardless of compute_dtype: a bf16 A/B measured
    # neutral (0.1578 vs 0.1563 s — the head einsums are bandwidth-
    # bound, docs/PERF.md), so fp32 is free numerics safety.
    if self.txt_pro in ("gbn", "gem"):
      geu = lambda parts: C.batched_gated_embedding(
          text, parts, use_bn=self.txt_pro == "gbn", train=train,
          normalize=self.normalize_experts)
    else:  # lin
      geu = lambda parts: C.batched_reduce_dim(text, parts, normalize=True)
    if self.batched_heads:
      stacked = geu(gu_parts)                              # [b*k, M, D]
    else:
      stacked = jnp.concatenate([geu([p]) for p in gu_parts], axis=1)

    if self.txt_wgh == "emb":
      e = self.moe_txt_dropout(text, deterministic=not train)
      heads = [self.moe_fc_txt[mod]() for mod in mods]
      if self.batched_heads:
        logits = C.batched_moe_logits(e, heads)
      else:
        logits = jnp.concatenate(
            [C.batched_moe_logits(e, [h]) for h in heads], -1)
      text_weights = jax.nn.softmax(logits, axis=1).reshape(b, k, m)
    elif self.txt_wgh == "none":
      text_weights = jnp.ones((b, k, m), dtype=jnp.float32)
    else:
      raise NotImplementedError(
          f"txt weighting mode {self.txt_wgh} not supported")
    text_weights = C.l1_normalize(text_weights)

    if self.normalize_experts:
      stacked = C.l2_normalize(stacked)
    text_embds = stacked.reshape(b, k, m, -1)
    return {
        "text_embds": text_embds.astype(jnp.float32),
        "text_weights": text_weights.astype(jnp.float32),
    }

  # ------------------------------------------------------------------
  def embed_video(self, batch, *, train: bool = False):
    """Video tower only: expert-feature batch ->
    {vid_embds [B,M,D], vid_weights [B,M]} (index building for serving,
    and the video half of the training forward)."""
    mods = self.modalities
    m = len(mods)
    b = batch["features_ind"][mods[0]].shape[0]
    ind = {mod: jnp.max(batch["features_ind"][mod], axis=1) for mod in mods}

    vdr = {mod: self.video_dim_reduce[mod]() for mod in mods} \
        if hasattr(self, "video_dim_reduce") else {}

    mnp_experts, maxp_experts = {}, {}
    avg = mxp = None
    if self.vid_inp in ("agg", "both", "all"):
      # Ragged expert dims: zero-padded batched einsum over all M
      # reducers at once (exact; components.py:batched_reduce_dim_ragged)
      # instead of the reference's M-matmul loop (model/model.py:413-437).
      parts = [vdr[mod] for mod in mods]
      if self.batched_heads:
        avg = C.batched_reduce_dim_ragged(
            [batch["features_avgpool"][mod] for mod in mods], parts)
        mxp = C.batched_reduce_dim_ragged(
            [batch["features_maxpool"][mod] for mod in mods], parts)
      else:
        avg = jnp.concatenate(
            [C.batched_reduce_dim_ragged([batch["features_avgpool"][mod]],
                                         [vdr[mod]]) for mod in mods], 1)
        mxp = jnp.concatenate(
            [C.batched_reduce_dim_ragged([batch["features_maxpool"][mod]],
                                         [vdr[mod]]) for mod in mods], 1)
      for i, mod in enumerate(mods):
        mnp_experts[mod] = avg[:, i]
        maxp_experts[mod] = mxp[:, i]

    temp_feats = {}
    if self.vid_inp in ("temp", "both", "all"):
      # Temporal tokens keep the per-modality matmuls: padding [B, L, D_m]
      # streams to max(D_m) costs more HBM traffic than the dispatch
      # merge saves (docs/PERF.md).
      for mod in mods:
        kern, bias = vdr[mod]
        temp_feats[mod] = C.l2_normalize(
            batch["features"][mod] @ kern + bias)

    experts: Dict[str, jnp.ndarray] = {}
    vid_embd = None

    if self.vid_cont == "bert":
      seq = self._assemble_video_sequence(batch, b, ind, avg, mxp,
                                          temp_feats)
      last = self.vid_bert(seq["features"], seq["attention_mask"],
                           seq["token_type_ids"], seq["position_ids"],
                           deterministic=not train)
      vid_embd = last[:, 0]
      for mod in mods:
        experts[mod] = last[:, seq["tok_map"][mod]]

    elif self.vid_cont == "coll":
      experts = dict(maxp_experts)
      experts = self._collaborative_gating(experts, ind, train)

    else:  # none
      experts = dict(maxp_experts)

    # ---------------- MoE weights ----------------
    if self.vid_wgh == "nrm":
      norms = jnp.stack([C.safe_norm(experts[mod], axis=-1)
                         for mod in mods], axis=-1)           # [B, M]
      vid_weights = norms / jnp.sum(norms, axis=-1, keepdims=True)
    elif self.vid_wgh == "emb":
      e = self.moe_vid_dropout(vid_embd, deterministic=not train)
      heads = [self.moe_fc_vid[mod]() for mod in mods]
      if self.batched_heads:
        logits = C.batched_moe_logits(e, heads)
      else:
        logits = jnp.concatenate(
            [C.batched_moe_logits(e, [h]) for h in heads], -1)
      vid_weights = jax.nn.softmax(logits, axis=1)
    elif self.vid_wgh == "none":
      vid_weights = jnp.ones((b, m), dtype=jnp.float32)
    else:
      raise NotImplementedError(
          f"video weighting mode {self.vid_wgh} not supported")

    if not self.keep_missing_modalities:
      available = jnp.stack([ind[mod] for mod in mods], -1).astype(jnp.float32)
      vid_weights = vid_weights * available
    vid_weights = C.l1_normalize(vid_weights)

    if self.normalize_experts:
      experts = {mod: C.l2_normalize(v) for mod, v in experts.items()}
    vid_embds = jnp.stack([experts[mod] for mod in mods], axis=1)   # [B,M,D]
    return {
        "vid_embds": vid_embds.astype(jnp.float32),
        "vid_weights": vid_weights.astype(jnp.float32),
    }

  # ------------------------------------------------------------------
  def _assemble_video_sequence(self, batch, b, ind, mnp_stack, maxp_stack,
                               temp_feats):
    """Static-shape token assembly (model/model.py:485-567 semantics).

    ``mnp_stack``/``maxp_stack`` are the pooled per-modality projections
    already stacked [B, M, D] (from the batched reducers in
    ``embed_video``) so the agg-token block is used as-is instead of
    being re-stacked from per-modality slices."""
    mods = self.modalities
    d = self.same_dim
    max_pos = self.vid_cfg.max_position_embeddings - 1

    # Token-type ids are a compile-time constant per config, and position
    # ids are too except under pos_enc='tint' (temporal-integer positions
    # read features_t).  Constant id rows are built at batch size 1 so
    # the embedded [1, S, H] rows broadcast-add into the embeddings
    # LayerNorm fusion instead of materializing [B*S, H] gathers
    # (profiled VMEM-write-bound at flagship scale, docs/PERF.md).
    #
    # Token ORDER is [CLS, agg x M, temporal x M x L] — grouped, not the
    # reference's per-modality interleave (model/model.py:485-567).  The
    # transformer is permutation-equivariant given per-token type /
    # position / mask (all carried here), so grouped order is
    # semantically identical; it turns the feature assembly from 2M+1
    # concat pieces (M of them single-row, profiled VMEM-write-bound at
    # 1.56 ms/run on the flagship eval, docs/PERF.md) into M+2
    # well-shaped pieces, and makes the per-modality aggregated-token
    # reads one contiguous slice (tokens 1..M).
    bt = b if self.pos_enc == "tint" else 1
    feats = [jnp.zeros((b, 1, d), dtype=jnp.float32)]
    types = [jnp.zeros((1, 1), dtype=jnp.int32)]
    pos = [jnp.zeros((bt, 1), dtype=jnp.int32)]
    mask = [jnp.ones((b, 1), dtype=jnp.int32)]

    tok_map = {}
    tok_id = 0
    if self.vid_inp in ("agg", "both", "all"):
      for mod in mods:
        tok_id += 1
        tok_map[mod] = tok_id
      if self.out_tok == "sep":
        agg_feat = jnp.zeros((b, len(mods), d), dtype=jnp.float32)
      elif self.out_tok == "mxp":
        agg_feat = maxp_stack
      elif self.out_tok == "mnp":
        agg_feat = mnp_stack
      else:
        raise ValueError(f"unknown out_tok {self.out_tok!r}")
      feats.append(agg_feat.astype(jnp.float32))
      types.append(jnp.asarray(
          [[int(self.expert_dims[mod]["idx"]) for mod in mods]],
          dtype=jnp.int32))
      pos.append(jnp.zeros((bt, len(mods)), dtype=jnp.int32))
      mask.append(jnp.stack(
          [ind[mod] for mod in mods], axis=1).astype(jnp.int32))
    if self.vid_inp in ("temp", "both", "all"):
      if not tok_map:
        # vid_inp='temp': aggregate over the modality's own tokens is not
        # defined in the reference either (model/model.py:586-587 would
        # KeyError); surface a clear error instead.
        raise ValueError(
            "vid_inp='temp' with vid_cont='bert' has no aggregated token "
            "to read the expert embedding from; use 'both' or 'all'")
      for mod in mods:
        f = temp_feats[mod]
        n_tok = f.shape[1]
        token_type = int(self.expert_dims[mod]["idx"])
        if self.pos_enc == "ordr":
          p = jnp.arange(1, n_tok + 1, dtype=jnp.int32)[None]
        elif self.pos_enc == "tint":
          p = jnp.clip(batch["features_t"][mod], 0, max_pos).astype(jnp.int32)
        elif self.pos_enc == "type":
          p = jnp.ones((1, n_tok), dtype=jnp.int32)
        elif self.pos_enc == "none":
          p = jnp.zeros((1, n_tok), dtype=jnp.int32)
        else:
          raise ValueError(f"unknown pos_enc {self.pos_enc!r}")
        tok_id += n_tok
        feats.append(f.astype(jnp.float32))
        types.append(jnp.full((1, n_tok), token_type, dtype=jnp.int32))
        pos.append(p)
        mask.append(batch["features_ind"][mod].astype(jnp.int32))

    return {
        "features": jnp.concatenate(feats, axis=1),
        "token_type_ids": jnp.concatenate(types, axis=1),
        "position_ids": (None if self.pos_enc == "none"
                         else jnp.concatenate(pos, axis=1)),
        "attention_mask": jnp.concatenate(mask, axis=1),
        "tok_map": tok_map,
    }

  # ------------------------------------------------------------------
  def _collaborative_gating(self, experts, ind, train):
    """Collaborative-experts reasoning path (model/model.py:445-482)."""
    mods = self.modalities
    assert len(mods) > 1, "use_ce requires multiple modalities"
    out = {}
    for modality in mods:
      temp_sum = 0.0
      avail_sum = 0.0
      for mod0, mod1 in itertools.permutations(mods, 2):
        if mod0 != modality:
          continue
        fused = jnp.concatenate([experts[mod0], experts[mod1]], axis=1)
        temp = self.g_reason_1(fused)
        temp = self.coll_g_dropout(temp, deterministic=not train)
        temp = self.g_reason_2(jax.nn.relu(temp))
        avail = (ind[mod0] * ind[mod1]).astype(temp.dtype)
        temp_sum = temp_sum + temp * avail[:, None]
        avail_sum = avail_sum + avail
      curr_mask = temp_sum / (avail_sum + 1e-11)[:, None]
      curr_mask = self.f_reason_1(curr_mask)
      curr_mask = self.coll_f_dropout(curr_mask, deterministic=not train)
      curr_mask = self.f_reason_2(jax.nn.relu(curr_mask))
      out[modality] = self.video_gu[modality](experts[modality], curr_mask,
                                              train=train)
    return out


def similarity_from_outputs(outputs, merge: str, prefer_pallas=None):
  """Full MoE similarity from CENet outputs (caption axis unrolled).

  prefer_pallas=False forces the XLA path (None follows the global
  toggle).  The Pallas kernel is safe under GSPMD-sharded callers: it
  carries a TWO-SIDED custom_partitioning rule
  (ops/similarity.py:_qv_sharded — caption rows shard like the text
  operands, video rows like the video operands; only a same-axis
  conflict, e.g. the trainer's data mesh, gathers one side).
  """
  text_embds = outputs["text_embds"]
  b, k, m, d = text_embds.shape
  return similarity_ops.moe_similarity(
      text_embds.reshape(b * k, m, d),
      outputs["vid_embds"],
      outputs["text_weights"].reshape(b * k, m),
      outputs["vid_weights"],
      merge=merge,
      num_caps=k,
      prefer_pallas=prefer_pallas,
  )
