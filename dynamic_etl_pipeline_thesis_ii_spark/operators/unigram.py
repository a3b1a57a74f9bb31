"""Unigram-LM tokenizer (SentencePiece-style, Kudo 2018): the second
corpus-trained subword tokenizer beside BPE (``operators/bpe.py``),
sharing its two-phase scale shape:

- **Train** never touches the corpus twice: the ONE distributed stage
  is the (word, count) groupBy (reused from ``bpe.word_counts``), the
  driver collects only the capped word-frequency table and runs
  Viterbi-EM there — seed vocabulary of frequent substrings, E-step
  Viterbi segmentation of each word weighted by its count, M-step
  relative-frequency re-estimation, then iterative pruning of the
  lowest-mass pieces (single characters are never pruned, so every
  word stays encodable) until the target vocabulary size.
- **Apply** broadcasts the piece log-probs and segments each word by
  Viterbi inside an Arrow-batched kernel with a per-executor word
  cache — the ``apply_bpe`` contract exactly, so the token-budget /
  packing / shard operators can consume either tokenizer unchanged.

Determinism: seed selection, pruning and Viterbi ties all break on
(-score, piece) / lowest-start order, so the same corpus yields the
same pieces and the same segmentations on any cluster layout — the
property that lets shards tokenized on different clusters share one
embedding matrix (the ``bpe_vocab`` contract).

Differences from full SentencePiece, documented as accepted trades:
Viterbi-EM instead of full forward-backward EM (hard counts — the
standard simplification; same fixed points on the word-table sizes
the cap admits), word-level pieces over the ``[a-z0-9']`` splitter
(no ▁ whitespace marker — whitespace is the word boundary here), and
no subword regularization sampling (deterministic corpora in, not
augmentation out)."""

from __future__ import annotations

import math
from typing import Iterable, Optional

from pyspark.sql import DataFrame

from dynamic_etl_pipeline_thesis_ii_spark.operators.bpe import word_counts

_MAX_PIECE = 8                   # seed substring length cap


def _viterbi(word: str, logp: dict, unk_penalty: float = -20.0):
    """(pieces, total logprob) best segmentation of ``word`` under
    piece log-probs; characters absent from the table segment as
    single-char unknowns at ``unk_penalty`` (degrade, don't crash).
    Ties break toward the LONGEST last piece (equivalently: lowest
    split start), deterministically."""
    n = len(word)
    best = [(-math.inf, -1)] * (n + 1)
    best[0] = (0.0, -1)
    for end in range(1, n + 1):
        lo = max(0, end - _MAX_PIECE)
        for start in range(lo, end):
            prev = best[start][0]
            if prev == -math.inf:
                continue
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start > 1:
                    continue
                lp = unk_penalty
            cand = prev + lp
            # strict > with ascending start: on ties the SMALLEST
            # start (longest final piece) wins, deterministically
            if cand > best[end][0]:
                best[end] = (cand, start)
    pieces = []
    end = n
    while end > 0:
        start = best[end][1]
        pieces.append(word[start:end])
        end = start
    pieces.reverse()
    return pieces, best[n][0]


def train_unigram(df: DataFrame, vocab_size: int = 512,
                  text_col: str = "text", max_words: int = 50_000,
                  seed_factor: int = 8, em_iters: int = 2,
                  shrink: float = 0.75) -> list:
    """Train the unigram LM: returns ``[(piece, logprob), ...]``
    sorted by (-logprob, piece), exactly ``<= vocab_size`` entries,
    every single character of the word table included. One
    distributed shuffle (the word count); everything after runs on
    the driver's capped table."""
    wc = [(r["word"], r["count"])
          for r in word_counts(df, text_col)
          .orderBy("count", ascending=False).limit(max_words).collect()]
    wc.sort(key=lambda t: (-t[1], t[0]))      # engine-stable order
    if not wc:
        return []
    chars = sorted({ch for w, _ in wc for ch in w})
    # seed: frequent substrings scored by count*len (the standard
    # suffix-array surrogate at word-table scale)
    sub_score: dict = {}
    for w, c in wc:
        n = len(w)
        for i in range(n):
            for j in range(i + 2, min(n, i + _MAX_PIECE) + 1):
                s = w[i:j]
                sub_score[s] = sub_score.get(s, 0) + c * (j - i)
    seeds = sorted(sub_score.items(), key=lambda t: (-t[1], t[0]))
    keep = max(vocab_size * seed_factor, vocab_size) - len(chars)
    pieces = set(chars) | {s for s, _ in seeds[:max(keep, 0)]}

    def em(piece_set: set) -> dict:
        """em_iters rounds of Viterbi-EM; returns piece -> count."""
        logp = {p: math.log(1.0 / len(piece_set)) for p in piece_set}
        counts: dict = {}
        for _ in range(em_iters):
            counts = {}
            for w, c in wc:
                segs, _score = _viterbi(w, logp)
                for s in segs:
                    counts[s] = counts.get(s, 0) + c
            total = sum(counts.values()) or 1
            logp = {p: math.log(counts.get(p, 0.5) / total)
                    for p in piece_set}
        return counts

    counts = em(pieces)
    while len(pieces) > vocab_size:
        target = max(vocab_size, int(len(pieces) * shrink))
        # prune lowest-mass multi-char pieces; chars are immortal
        ranked = sorted(
            (p for p in pieces if len(p) > 1),
            key=lambda p: (counts.get(p, 0), p))
        n_drop = len(pieces) - target
        droppable = [p for p in ranked[:n_drop]]
        if not droppable:
            break
        pieces -= set(droppable)
        counts = em(pieces)
    total = sum(counts.values()) or 1
    out = [(p, math.log(max(counts.get(p, 0), 0.5) / total))
           for p in pieces]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:max(vocab_size, len(chars))]


def unigram_vocab(pieces: Iterable[tuple]) -> dict:
    """piece -> id: 0 = ``<unk>`` (chars outside the trained table),
    then one id per piece in the trainer's (-logprob, piece) order —
    same-table-in, same-ids-out on any engine (the ``bpe_vocab``
    contract)."""
    vocab = {"<unk>": 0}
    for p, _lp in pieces:
        vocab.setdefault(p, len(vocab))
    return vocab


def apply_unigram(df: DataFrame, pieces: Iterable[tuple],
                  text_col: str = "text", id_col: str = "doc_id",
                  with_tokens: bool = True,
                  ids: bool = False) -> DataFrame:
    """Segment the corpus with a trained piece table: ``(id, tokens
    array<string>, n_tokens)`` — or ``input_ids array<int>`` with
    ``ids=True`` (the ``encode_ids`` face; unknown chars -> id 0).
    Piece log-probs broadcast with the closure; per-executor word
    cache makes the per-row cost a dict lookup after warmup
    (``apply_bpe``'s exact kernel shape)."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    logp = {p: lp for p, lp in pieces}
    vocab = unigram_vocab(logp.items()) if ids else None
    fields = [StructField("id", LongType(), False)]
    if with_tokens and ids:
        fields.append(StructField("input_ids",
                                  ArrayType(IntegerType()), True))
    elif with_tokens:
        fields.append(StructField("tokens",
                                  ArrayType(StringType()), True))
    fields.append(StructField("n_tokens", LongType(), True))
    schema = StructType(fields)
    out_col = "input_ids" if ids else "tokens"

    def kernel(batches):
        import re
        cache: dict = {}
        splitter = re.compile(r"[^a-z0-9']+")
        for pdf in batches:
            toks, counts = [], []
            for text in pdf[text_col]:
                words = [w for w in splitter.split((text or "").lower())
                         if w]
                doc: list = []
                for w in words:
                    segs = cache.get(w)
                    if segs is None:
                        segs, _ = _viterbi(w, logp)
                        cache[w] = segs
                    doc.extend(segs)
                if with_tokens and ids:
                    toks.append([vocab.get(s, 0) for s in doc])
                elif with_tokens:
                    toks.append(doc)
                counts.append(len(doc))
            out = {"id": pdf[id_col]}
            if with_tokens:
                out[out_col] = toks
            out["n_tokens"] = counts
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def save_unigram(spark, pieces, path: str) -> dict:
    """Persist a :func:`train_unigram` piece table — (piece, logprob,
    rank) parquet, rank preserving the trainer's deterministic
    (-logprob, piece) order. Returns {model, n_pieces}."""
    rows = [(i, p, float(lp)) for i, (p, lp) in enumerate(pieces)]
    spark.createDataFrame(
        rows, "rank int, piece string, logprob double") \
        .coalesce(1).write.mode("overwrite").parquet(path)
    return {"model": "unigram", "n_pieces": len(rows)}


def load_unigram(spark, path: str) -> list:
    """Reload a :func:`save_unigram` store; Viterbi segmentation over
    the loaded table is bit-identical to the fresh trainer
    (pinned)."""
    return [(r["piece"], r["logprob"]) for r in
            spark.read.parquet(path).orderBy("rank").collect()]
