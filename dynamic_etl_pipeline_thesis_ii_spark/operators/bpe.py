"""Byte-pair-encoding tokenizer: corpus-trained merges + distributed
apply (the real token-counting layer under the token-budget /
packing / shard operators, which otherwise run on whitespace counts).

No reference counterpart (training-data extension, SURVEY §2.12).
Design follows the standard two-phase shape every production BPE
trainer uses (Sennrich et al. 2016; GPT-2's bpe()):

- **Train** operates on the WORD-FREQUENCY TABLE, never the corpus:
  one distributed groupBy builds (word, count), the driver collects
  only the top ``max_words`` rows (vocabulary-sized — bounded and
  capped, NOT corpus-sized; the cap is the documented accuracy/memory
  trade) and runs the classic merge loop there. At 100 TB the corpus
  scan is the only distributed stage and it is one shuffle.
- **Apply** broadcasts the merge ranks and tokenizes via an
  Arrow-batched pandas UDF with a per-executor word cache — word
  re-use makes the cache hit rate very high on natural text, so the
  per-row cost is a dict lookup, not a merge loop.

Determinism: merge ties (equal pair count) break on the
lexicographically smaller pair, so the same corpus always yields the
same merge table on any cluster layout.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"                     # end-of-word marker (Sennrich-style)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the lowercased corpus — the ONE distributed
    stage of training. Punctuation splits off so merges learn word
    shapes, not attached commas."""
    words = F.explode(F.split(F.lower(F.coalesce(F.col(text_col),
                                                 F.lit(""))),
                              r"[^a-z0-9']+"))
    return (df.select(words.alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("count")))


def _merge_loop(wc: list[tuple[str, int]],
                n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency dict (plain
    Python, driver-side) with incremental pair recount on only the
    words containing the merged pair, and best-pair selection via a
    LAZY-DELETION HEAP keyed on (-count, pair): every count mutation
    pushes a fresh entry, stale entries are discarded on pop, so each
    merge costs O(log |pairs|) amortized instead of a full dict scan
    — 32k+ merge tables stay comfortable at the 100k-word cap. The
    heap order (-count, then lexicographically smaller pair) is
    byte-identical to the original argmin rule, so merge tables are
    unchanged (pinned by the differential + tie-heavy tests)."""
    import heapq

    symseqs: list[list[str]] = [list(w) + [END] for w, _ in wc]
    freqs = [c for _, c in wc]
    # pair -> total count, and pair -> set of word indexes containing it
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, seq in enumerate(symseqs):
        for a, b in zip(seq, seq[1:]):
            pair_count[(a, b)] = pair_count.get((a, b), 0) + freqs[i]
            pair_words.setdefault((a, b), set()).add(i)
    heap = [(-c, p) for p, c in pair_count.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []

    def bump(pair: tuple[str, str], delta: int, i: int) -> None:
        """Apply a count delta for word i and push the fresh heap
        entry (the old entries go stale and are skipped on pop)."""
        c = pair_count.get(pair, 0) + delta
        if c <= 0:
            pair_count.pop(pair, None)
        else:
            pair_count[pair] = c
            heapq.heappush(heap, (-c, pair))
        ws = pair_words.get(pair)
        if delta > 0:
            pair_words.setdefault(pair, set()).add(i)
        elif ws is not None:
            ws.discard(i)
            if not ws:
                pair_words.pop(pair, None)

    for _ in range(n_merges):
        best = None
        while heap:
            negc, p = heap[0]
            if pair_count.get(p) != -negc:      # stale: count moved on
                heapq.heappop(heap)
                continue
            best = p
            break
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            seq, f = symseqs[i], freqs[i]
            # remove old pair contributions of this word
            for a, b in zip(seq, seq[1:]):
                bump((a, b), -f, i)
            # merge occurrences
            out: list[str] = []
            k = 0
            while k < len(seq):
                if (k + 1 < len(seq)
                        and (seq[k], seq[k + 1]) == best):
                    out.append(joined)
                    k += 2
                else:
                    out.append(seq[k])
                    k += 1
            symseqs[i] = out
            # re-add new pair contributions
            for a, b in zip(out, out[1:]):
                bump((a, b), f, i)
    return merges


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 200,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Only the top
    ``max_words`` most frequent words reach the driver (the standard
    capped-dictionary trade: tail words contribute negligibly to pair
    counts; raise the cap for higher fidelity)."""
    top = (word_counts(df, text_col)
           .orderBy(F.desc("count"), "word").limit(max_words).collect())
    return _merge_loop([(r["word"], r["count"]) for r in top], n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                cache: Optional[dict] = None) -> list[str]:
    """GPT-2-style greedy-by-rank BPE of one word (plain Python; used
    inside the pandas kernel and by tests)."""
    if cache is not None and word in cache:
        return cache[word]
    seq = list(word) + [END]
    while len(seq) > 1:
        pairs = [(ranks.get((a, b), 1 << 60), idx)
                 for idx, (a, b) in enumerate(zip(seq, seq[1:]))]
        rank, idx = min(pairs)
        if rank >= 1 << 60:
            break
        joined = seq[idx] + seq[idx + 1]
        # merge EVERY occurrence of that pair (same order the trainer
        # used), not just the first
        best = (seq[idx], seq[idx + 1])
        out: list[str] = []
        k = 0
        while k < len(seq):
            if k + 1 < len(seq) and (seq[k], seq[k + 1]) == best:
                out.append(joined)
                k += 2
            else:
                out.append(seq[k])
                k += 1
        seq = out
    if cache is not None:
        cache[word] = seq
    return seq


def apply_bpe(df: DataFrame, merges: Iterable[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id",
              with_tokens: bool = True) -> DataFrame:
    """Tokenize the corpus with a trained merge table: ``(id, tokens
    array<string>, n_tokens)``. The merge ranks broadcast with the
    closure; an Arrow-batched pandas UDF with a per-executor word
    cache does the work — natural-text word reuse makes this a dict
    lookup per word after warmup.

    ``with_tokens=False`` yields ``(id, n_tokens)`` only: column
    pruning cannot reach inside a mapInPandas kernel, so counting
    consumers (token budgets, packing) should skip materializing and
    Arrow-shipping every document's full subword array."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    fields = [StructField("id", LongType(), False)]
    if with_tokens:
        fields.append(StructField("tokens", ArrayType(StringType()), True))
    fields.append(StructField("n_tokens", LongType(), True))
    schema = StructType(fields)

    def kernel(batches):
        import re
        cache: dict = {}
        splitter = re.compile(r"[^a-z0-9']+")
        for pdf in batches:
            toks, counts = [], []
            for text in pdf[text_col]:
                words = [w for w in splitter.split((text or "").lower())
                         if w]
                if with_tokens:
                    doc: list[str] = []
                    for w in words:
                        doc.extend(encode_word(w, ranks, cache))
                    toks.append(doc)
                    counts.append(len(doc))
                else:
                    counts.append(sum(len(encode_word(w, ranks, cache))
                                      for w in words))
            out = {"id": pdf[id_col]}
            if with_tokens:
                out["tokens"] = toks
            out["n_tokens"] = counts
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def bpe_vocab(merges: Iterable[tuple[str, str]]) -> dict[str, int]:
    """Deterministic subword vocabulary for a trained merge table:
    id 0 = ``<unk>`` (the word splitter strips everything outside
    [a-z0-9'], so unk only fires on a vocab/merge-table mismatch —
    degrade, don't crash), ids 1.. = the base alphabet (a-z, 0-9,
    apostrophe, the END marker), then one id per merge in RANK order
    (the joined string; if two merges join to the same string the
    first rank keeps the id). Same table in, same vocab out, on any
    engine — the property that lets shards tokenized on different
    clusters share one embedding matrix."""
    import string
    vocab = {"<unk>": 0}
    for ch in (*string.ascii_lowercase, *string.digits, "'", END):
        vocab.setdefault(ch, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def encode_ids(df: DataFrame, merges: Iterable[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Tokenize straight to TRAINING-READY ids: ``(id, input_ids
    array<int>, n_tokens)`` — :func:`apply_bpe`'s subwords mapped
    through :func:`bpe_vocab` inside the same Arrow kernel (one pass,
    no intermediate string-array shuffle). Feed the output to
    ``packing.pack_sequences`` for fixed-length LM sequences."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StructField, StructType,
    )

    merges = list(merges)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    vocab = bpe_vocab(merges)
    schema = StructType([
        StructField("id", LongType(), False),
        StructField("input_ids", ArrayType(IntegerType()), True),
        StructField("n_tokens", LongType(), True)])

    def kernel(batches):
        import re
        cache: dict = {}
        splitter = re.compile(r"[^a-z0-9']+")
        for pdf in batches:
            ids_out, counts = [], []
            for text in pdf[text_col]:
                words = [w for w in splitter.split((text or "").lower())
                         if w]
                doc: list[int] = []
                for w in words:
                    doc.extend(vocab.get(t, 0)
                               for t in encode_word(w, ranks, cache))
                ids_out.append(doc)
                counts.append(len(doc))
            yield pd.DataFrame({"id": pdf[id_col], "input_ids": ids_out,
                                "n_tokens": counts})

    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def save_bpe(spark, merges, path: str) -> dict:
    """Persist a :func:`train_bpe` merge table — the tokenizer is THE
    canonical train-once artifact of a data pipeline (retraining per
    epoch would change every token id downstream): (rank, a, b)
    parquet, rank = merge priority. Returns {model, n_merges}."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    spark.createDataFrame(rows, "rank int, a string, b string") \
        .coalesce(1).write.mode("overwrite").parquet(path)
    return {"model": "bpe", "n_merges": len(rows)}


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Reload a :func:`save_bpe` store; apply/encode over the loaded
    table is bit-identical to the fresh trainer (pinned)."""
    return [(r["a"], r["b"]) for r in
            spark.read.parquet(path).orderBy("rank").collect()]


def tokenizer_stats(df: DataFrame, merges=None, pieces=None,
                    text_col: str = "text", id_col: str = "doc_id",
                    lang_col: str | None = None) -> DataFrame:
    """Fertility / compression telemetry for a trained tokenizer —
    the numbers a data team validates a tokenizer WITH before
    committing a corpus to it: ``fertility`` (subword tokens per
    word — the standard cross-lingual coverage metric; a language
    far above the corpus average is being shredded into chars and
    will train poorly at the same sequence budget) and
    ``chars_per_token`` (compression — how much text a fixed token
    budget actually buys), per ``lang_col`` stratum (one overall
    'all' row when None). Pass exactly one of ``merges`` (BPE table)
    or ``pieces`` (unigram-LM table).

    The word denominator uses the SAME ``[^a-z0-9']+`` lowercase
    splitter as the tokenizers' own kernels, so fertility is exactly
    tokens-per-input-word, not an artifact of mismatched word
    definitions. Scale shape: one count-only Arrow pass (tokens
    never ship out of the kernel) + one strata-bounded aggregate —
    no shuffle beyond the groupBy. Degenerate strata with zero words
    report null fertility rather than exploding."""
    from pyspark.sql import functions as F

    if (merges is None) == (pieces is None):
        raise ValueError(
            "pass exactly one of merges= (BPE) or pieces= (unigram)")
    if merges is not None:
        counted = apply_bpe(df, merges, text_col=text_col,
                            id_col=id_col, with_tokens=False)
    else:
        from dynamic_etl_pipeline_thesis_ii_spark.operators.unigram import (
            apply_unigram,
        )
        counted = apply_unigram(df, pieces, text_col=text_col,
                                id_col=id_col, with_tokens=False)
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.size(F.filter(
        F.split(F.lower(text), r"[^a-z0-9']+"), lambda x: x != ""))
    cols = [F.col(id_col).alias("id"), words.alias("n_words"),
            F.length(text).alias("n_chars")]
    group = (F.col(lang_col) if lang_col else F.lit("all")).alias("lang")
    base = df.select(*cols, group)
    return (base.join(counted, "id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.sum("n_words").alias("n_words"),
                 F.round(F.sum("n_tokens")
                         / F.nullif(F.sum("n_words"), F.lit(0)), 4)
                 .alias("fertility"),
                 F.round(F.sum("n_chars")
                         / F.nullif(F.sum("n_tokens"), F.lit(0)), 4)
                 .alias("chars_per_token")))
