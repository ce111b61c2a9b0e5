"""Parameter serialization: save/load of fitted models to .npz archives.

The reference relies on pickle round-trips (SURVEY §5.4); this module adds
explicit, version-tagged archives for the transform, fusion learners, and
calibrators so fitted state can move between hosts/processes without
unpickling arbitrary code. Pickle still works on every model (state is
numpy/floats by construction).
"""

from __future__ import annotations

import numpy as np

from bayesian_bm25_tpu.models.calibration import IsotonicCalibrator, PlattCalibrator
from bayesian_bm25_tpu.models.fusion_weights import (
    AttentionLogOddsWeights,
    LearnableLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
)
from bayesian_bm25_tpu.models.probability import (
    BayesianProbabilityTransform,
    TemporalBayesianTransform,
)

_FORMAT_VERSION = 1


def _meta(kind: str) -> np.ndarray:
    return np.array([kind, str(_FORMAT_VERSION)])


def save_model(path: str, model) -> None:
    """Serialize a fitted model to an .npz archive (type-tagged)."""
    if isinstance(model, TemporalBayesianTransform):
        np.savez(
            path, _meta=_meta("temporal_transform"),
            alpha=model.alpha, beta=model.beta,
            base_rate=np.nan if model.base_rate is None else model.base_rate,
            mode=np.array([model._training_mode]),
            n_updates=model._n_updates,
            grad_alpha_ema=model._grad_alpha_ema,
            grad_beta_ema=model._grad_beta_ema,
            alpha_avg=model._alpha_avg, beta_avg=model._beta_avg,
            decay_half_life=model._decay_half_life,
            timestamp=model._timestamp,
        )
    elif isinstance(model, BayesianProbabilityTransform):
        np.savez(
            path, _meta=_meta("transform"),
            alpha=model.alpha, beta=model.beta,
            base_rate=np.nan if model.base_rate is None else model.base_rate,
            mode=np.array([model._training_mode]),
            n_updates=model._n_updates,
            grad_alpha_ema=model._grad_alpha_ema,
            grad_beta_ema=model._grad_beta_ema,
            alpha_avg=model._alpha_avg, beta_avg=model._beta_avg,
        )
    elif isinstance(model, LearnableLogOddsWeights):
        np.savez(
            path, _meta=_meta("learnable_weights"),
            logits=model._logits, alpha=model._alpha,
            base_rate=np.nan if model._base_rate is None else model._base_rate,
            n_updates=model._n_updates,
            grad_logits_ema=model._grad_logits_ema,
            weights_avg=model._weights_avg,
        )
    elif isinstance(model, MultiHeadAttentionLogOddsWeights):
        heads = model.heads
        np.savez(
            path, _meta=_meta("multihead_attention"),
            n_heads=model.n_heads,
            n_signals=heads[0].n_signals,
            n_query_features=heads[0].n_query_features,
            alpha=heads[0].alpha,
            normalize=heads[0].normalize,
            W=np.stack([h._W for h in heads]),
            b=np.stack([h._b for h in heads]),
            W_avg=np.stack([h._W_avg for h in heads]),
            b_avg=np.stack([h._b_avg for h in heads]),
        )
    elif isinstance(model, AttentionLogOddsWeights):
        np.savez(
            path, _meta=_meta("attention_weights"),
            W=model._W, b=model._b, alpha=model._alpha,
            normalize=model._normalize,
            base_rate=np.nan if model._base_rate is None else model._base_rate,
            n_updates=model._n_updates,
            grad_W_ema=model._grad_W_ema, grad_b_ema=model._grad_b_ema,
            W_avg=model._W_avg, b_avg=model._b_avg,
        )
    elif isinstance(model, PlattCalibrator):
        np.savez(path, _meta=_meta("platt"), a=model.a, b=model.b)
    elif isinstance(model, IsotonicCalibrator):
        if model._x is None:
            raise ValueError("IsotonicCalibrator must be fitted before saving")
        np.savez(path, _meta=_meta("isotonic"), x=model._x, y=model._y)
    else:
        raise TypeError(f"Unsupported model type: {type(model).__name__}")


def save_scorer(path: str, scorer) -> None:
    """Serialize a fitted BayesianBM25Scorer (index + transform + config)
    to one .npz archive — a production checkpoint that avoids pickle.

    The vocabulary is stored as an id-ordered UTF-8 blob plus a byte-offset
    array (index() accepts arbitrary pre-tokenized corpora, so tokens may
    contain any byte — offsets make the encoding delimiter-free); device
    arrays round-trip through numpy. The frequency-split accelerator is
    rebuilt on load (derived state). ``corpus_tokens`` are not persisted —
    ``add_documents`` requires re-indexing from source anyway.
    """
    idx = scorer.bm25_index
    if idx is None:
        raise ValueError("scorer must be indexed before saving")
    t = scorer.transform
    terms = [None] * idx.n_terms
    for tok, tid in idx.vocab.items():
        terms[tid] = tok
    encoded = [tok.encode("utf-8") for tok in terms]
    vocab_blob = b"".join(encoded)
    # offsets[i] = start byte of token i; offsets[n_terms] = total length
    vocab_offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in encoded], out=vocab_offsets[1:])
    np.savez_compressed(
        path, _meta=_meta("scorer"),
        k1=scorer._k1, b=scorer._b, method=np.array([scorer._method]),
        score_scale=np.array([getattr(scorer, "_score_scale", "classic")]),
        delta=getattr(scorer, "_delta", 0.5),
        base_rate_method=np.array([scorer._base_rate_method]),
        term_ids=np.asarray(idx.term_ids),
        weights=np.asarray(idx.weights),
        doc_lengths=np.asarray(idx.doc_lengths),
        doc_frequencies=idx.doc_frequencies,
        idf=idx.idf,
        n_docs=idx.n_docs, n_terms=idx.n_terms, avgdl=idx.avgdl,
        max_doc_terms=idx.max_doc_terms,
        vocab_blob=np.frombuffer(vocab_blob, dtype=np.uint8),
        vocab_offsets=vocab_offsets,
        alpha=t.alpha, beta=t.beta,
        base_rate=np.nan if t.base_rate is None else t.base_rate,
        mode=np.array([t._training_mode]),
        # Tokenizer options captured at index time. retrieve_texts must
        # tokenize queries identically after a checkpoint round-trip;
        # stem is stored as a string so named stemmers round-trip too.
        tok_opts=np.array([
            str(scorer._tok_opts.get("lowercase", True)),
            str(scorer._tok_opts.get("remove_stopwords", True)),
            str(scorer._tok_opts.get("stem", True)),
        ]),
        # Kernel config: the split accelerator is rebuilt on load, so
        # storage/precision must survive or a checkpoint silently
        # changes its numeric class ("" = default/None).
        kernel_cfg=np.array([
            scorer._matmul_precision_name,
            scorer._impact_storage or "",
        ]),
        # Tombstoned doc ids (empty when nothing is deleted): the mask
        # must survive a checkpoint or deleted docs silently reappear.
        deleted_ids=(np.flatnonzero(scorer._deleted).astype(np.int64)
                     if scorer._deleted is not None
                     else np.zeros(0, np.int64)),
    )


def _decode_tok_opt(v: str):
    if v == "True":
        return True
    if v == "False":
        return False
    return v


def load_scorer(path: str, *, mesh=None, n_devices: int | None = None,
                mesh_shape: tuple[int, int] | None = None):
    """Reconstruct a scorer saved by ``save_scorer``.

    Pass ``mesh`` / ``n_devices`` / ``mesh_shape`` to load the checkpoint
    straight into a :class:`ShardedBayesianBM25Scorer` (multi-chip
    serving from a single-chip checkpoint — the archive format is
    identical). The document axis is re-padded host-side when the
    archived padding doesn't divide the mesh (pad rows use the build
    conventions: term id -1, weight 0, doc length avgdl), so any mesh
    size works with any archive.
    """
    import jax.numpy as jnp

    from bayesian_bm25_tpu.engine.index import BM25Index
    from bayesian_bm25_tpu.models.scorer import BayesianBM25Scorer

    data = np.load(path, allow_pickle=False)
    if str(data["_meta"][0]) != "scorer":
        raise ValueError("archive is not a scorer checkpoint")
    blob = bytes(np.asarray(data["vocab_blob"]))
    if "vocab_offsets" in data:
        off = np.asarray(data["vocab_offsets"])
        terms = [blob[off[i]:off[i + 1]].decode("utf-8")
                 for i in range(len(off) - 1)]
    else:  # format v1 archives: newline-joined blob
        text = blob.decode("utf-8")
        terms = text.split("\n") if text else []
    vocab = {tok: i for i, tok in enumerate(terms)}

    kernel_kw = {}
    if "kernel_cfg" in data:  # v<=3 archives predate kernel_cfg
        raw = [str(x) for x in np.asarray(data["kernel_cfg"])]
        kernel_kw = dict(matmul_precision=raw[0],
                         impact_storage=raw[1] or None)
    # v<=4 archives predate score_scale (all were classic-scaled).
    scale = (str(data["score_scale"][0]) if "score_scale" in data
             else "classic")
    kernel_kw["score_scale"] = scale
    delta = float(data["delta"]) if "delta" in data else 0.5
    kernel_kw["delta"] = delta
    if mesh is not None or n_devices is not None or mesh_shape is not None:
        from bayesian_bm25_tpu.parallel.sharded_scorer import (
            ShardedBayesianBM25Scorer)

        scorer = ShardedBayesianBM25Scorer(
            k1=float(data["k1"]), b=float(data["b"]),
            method=str(data["method"][0]),
            base_rate_method=str(data["base_rate_method"][0]),
            mesh=mesh, n_devices=n_devices, mesh_shape=mesh_shape,
            **kernel_kw,
        )
    else:
        scorer = BayesianBM25Scorer(
            k1=float(data["k1"]), b=float(data["b"]),
            method=str(data["method"][0]),
            base_rate_method=str(data["base_rate_method"][0]),
            **kernel_kw,
        )
    # Decompress each table once; keep the numpy copy as the host
    # mirror so the split-accelerator rebuild below never pulls the
    # device tables back over the link (a ~1 GB D2H on large corpora).
    term_ids = np.asarray(data["term_ids"])
    weights = np.asarray(data["weights"])
    doc_lengths = np.asarray(data["doc_lengths"])
    # Sharded meshes need the doc axis to divide the mesh; re-pad with
    # build-convention rows when the archived padding doesn't.
    pad_to = scorer._doc_pad_multiple()
    D_pad = term_ids.shape[0]
    if D_pad % pad_to:
        D_new = ((D_pad + pad_to - 1) // pad_to) * pad_to
        extra = D_new - D_pad
        term_ids = np.concatenate(
            [term_ids, np.full((extra, term_ids.shape[1]),
                               -1, term_ids.dtype)])
        weights = np.concatenate(
            [weights, np.zeros((extra, weights.shape[1]),
                               weights.dtype)])
        doc_lengths = np.concatenate(
            [doc_lengths,
             np.full(extra, max(float(data["avgdl"]), 1.0),
                     doc_lengths.dtype)])
    scorer._index = BM25Index(
        k1=float(data["k1"]), b=float(data["b"]),
        method=str(data["method"][0]), score_scale=scale, delta=delta,
        vocab=vocab,
        term_ids=jnp.asarray(term_ids),
        weights=jnp.asarray(weights),
        doc_lengths=jnp.asarray(doc_lengths),
        doc_frequencies=np.asarray(data["doc_frequencies"]),
        idf=np.asarray(data["idf"]),
        n_docs=int(data["n_docs"]), n_terms=int(data["n_terms"]),
        avgdl=float(data["avgdl"]),
        max_doc_terms=int(data["max_doc_terms"]),
        term_ids_host=term_ids, weights_host=weights,
        doc_lengths_host=doc_lengths,
    )
    scorer._maybe_build_split()
    scorer._finalize_index()  # sharded scorers re-place over their mesh
    br = float(data["base_rate"])
    scorer._transform = BayesianProbabilityTransform(
        alpha=float(data["alpha"]), beta=float(data["beta"]),
        base_rate=None if np.isnan(br) else br,
    )
    scorer._transform._training_mode = str(data["mode"][0])
    if "tok_opts" in data:  # v1/v2 archives predate tok_opts; keep defaults
        raw = [str(x) for x in np.asarray(data["tok_opts"])]
        scorer._tok_opts = dict(
            lowercase=_decode_tok_opt(raw[0]),
            remove_stopwords=_decode_tok_opt(raw[1]),
            stem=_decode_tok_opt(raw[2]),
        )
    if "deleted_ids" in data:
        ids = np.asarray(data["deleted_ids"])
        if ids.size:
            scorer.delete_documents(ids)
    return scorer


def load_model(path: str):
    """Reconstruct a model saved by ``save_model``."""
    data = np.load(path, allow_pickle=False)
    kind = str(data["_meta"][0])

    def _opt(v):
        v = float(v)
        return None if np.isnan(v) else v

    if kind in ("transform", "temporal_transform"):
        base_rate = _opt(data["base_rate"])
        if kind == "temporal_transform":
            model = TemporalBayesianTransform(
                alpha=float(data["alpha"]), beta=float(data["beta"]),
                base_rate=base_rate,
                decay_half_life=float(data["decay_half_life"]),
            )
            model._timestamp = int(data["timestamp"])
        else:
            model = BayesianProbabilityTransform(
                alpha=float(data["alpha"]), beta=float(data["beta"]),
                base_rate=base_rate,
            )
        model._training_mode = str(data["mode"][0])
        model._n_updates = int(data["n_updates"])
        model._grad_alpha_ema = float(data["grad_alpha_ema"])
        model._grad_beta_ema = float(data["grad_beta_ema"])
        model._alpha_avg = float(data["alpha_avg"])
        model._beta_avg = float(data["beta_avg"])
        return model

    if kind == "learnable_weights":
        logits = np.asarray(data["logits"])
        model = LearnableLogOddsWeights(
            n_signals=len(logits), alpha=float(data["alpha"]),
            base_rate=_opt(data["base_rate"]),
        )
        model._logits = logits
        model._n_updates = int(data["n_updates"])
        model._grad_logits_ema = np.asarray(data["grad_logits_ema"])
        model._weights_avg = np.asarray(data["weights_avg"])
        return model

    if kind == "attention_weights":
        W = np.asarray(data["W"])
        model = AttentionLogOddsWeights(
            n_signals=W.shape[0], n_query_features=W.shape[1],
            alpha=float(data["alpha"]), normalize=bool(data["normalize"]),
            base_rate=_opt(data["base_rate"]),
        )
        model._W = W
        model._b = np.asarray(data["b"])
        model._n_updates = int(data["n_updates"])
        model._grad_W_ema = np.asarray(data["grad_W_ema"])
        model._grad_b_ema = np.asarray(data["grad_b_ema"])
        model._W_avg = np.asarray(data["W_avg"])
        model._b_avg = np.asarray(data["b_avg"])
        return model

    if kind == "multihead_attention":
        model = MultiHeadAttentionLogOddsWeights(
            n_heads=int(data["n_heads"]), n_signals=int(data["n_signals"]),
            n_query_features=int(data["n_query_features"]),
            alpha=float(data["alpha"]), normalize=bool(data["normalize"]),
        )
        for i, head in enumerate(model.heads):
            head._W = np.asarray(data["W"][i])
            head._b = np.asarray(data["b"][i])
            head._W_avg = np.asarray(data["W_avg"][i])
            head._b_avg = np.asarray(data["b_avg"][i])
        return model

    if kind == "platt":
        return PlattCalibrator(a=float(data["a"]), b=float(data["b"]))

    if kind == "isotonic":
        model = IsotonicCalibrator()
        model._x = np.asarray(data["x"])
        model._y = np.asarray(data["y"])
        return model

    raise ValueError(f"Unknown model kind: {kind!r}")
