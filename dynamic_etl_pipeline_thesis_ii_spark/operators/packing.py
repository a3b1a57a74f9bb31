"""Token-budget sequence packing: assign documents to fixed-size
training chunks (no reference counterpart — a training-data extension,
the concatenate-and-split step that turns a curated corpus into
fixed-length LM training sequences).

Semantics: documents are laid out in a deterministic stream order and
the stream is split every ``budget`` tokens; a document's chunk is the
chunk its first token lands in (``chunk = floor(start_offset /
budget)``) — the standard document-concatenation packing used by LM
data loaders, not bin-packing (which needs a sequential greedy state
that neither SQL nor a distributed engine can express without a serial
scan).

Scale design: a single global stream order would need a
single-partition window, so the stream is SHARDED — docs hash into
``n_buckets`` independent streams and each bucket packs its own chunks
``(bucket, chunk)``. The cumulative-offset window partitions by
bucket (uniform md5-derived key, no skew), which is exactly how a
1000-executor packing job runs: each bucket is an independent output
shard. Order within a bucket is (hash, id) — deterministic,
engine-portable, and reproduced bit-for-bit by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
    SQL_HASH32, SQL_NORMALIZE, hash32, normalize_text,
)
from dynamic_etl_pipeline_thesis_ii_spark.operators.text import token_count


def pack_chunks(df: DataFrame, budget: int, id_col: str = "doc_id",
                text_col: str = "text", n_buckets: int = 8,
                tokens_col: str | None = None,
                salt: str = "pack") -> DataFrame:
    """Assign each document a ``(bucket, chunk)`` packing slot.

    Output: ``(id, bucket, chunk, n_tokens, offset)`` where ``offset``
    is the document's start position in its bucket's token stream and
    ``chunk = floor(offset / budget)``.

    ``tokens_col`` uses a precomputed token count; otherwise
    whitespace tokens of ``text_col`` are counted inline (one scan
    either way).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    ident = F.col(id_col)
    # null text (or null precomputed count) packs as a zero-length doc,
    # not a NULL that would poison the cumulative offsets; empty
    # (non-null) text is ALSO zero tokens — split('', ' ') yields ['']
    # and would otherwise charge one phantom token per empty doc
    if tokens_col:
        raw = F.col(tokens_col)
    else:
        raw = F.when(F.length(normalize_text(F.col(text_col))) == 0,
                     F.lit(0)).otherwise(token_count(F.col(text_col)))
    n_tok = F.coalesce(raw.cast("long"), F.lit(0))
    h = hash32(F.concat(ident.cast("string"), F.lit(salt)))
    base = df.select(ident.alias("id"), n_tok.alias("n_tokens"),
                     (h % n_buckets).alias("bucket"), h.alias("__h"))
    w = (Window.partitionBy("bucket").orderBy("__h", "id")
         .rowsBetween(Window.unboundedPreceding, -1))
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (base.withColumn("offset", offset)
            .withColumn("chunk", (F.col("offset") / budget)
                        .cast("long"))
            .select("id", "bucket", "chunk", "n_tokens", "offset"))


def SQL_PACK_CHUNKS(budget: int, n_buckets: int = 8,
                    salt: str = "pack",
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text",
                    tokens_col: str | None = None) -> str:
    """DuckDB twin of :func:`pack_chunks` (same hash, same order, same
    offset arithmetic). ``tokens_col`` mirrors the engine's precomputed
    token-count path (``coalesce(col, 0)``, no text scan)."""
    h = SQL_HASH32.format(x=f"({id_col})::VARCHAR || '{salt}'")
    if tokens_col:
        ntok = f"coalesce({tokens_col}, 0)"
    else:
        norm = SQL_NORMALIZE.format(x=text_col)
        # empty normalized text = 0 tokens (same guard as pack_chunks)
        ntok = (f"(CASE WHEN length({norm}) = 0 THEN 0 "
                f"ELSE coalesce(len(string_split({norm}, ' ')), 0) END)")
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {ntok}::BIGINT AS n_tokens,
         {h} % {n_buckets} AS bucket, {h} AS __h
  FROM {table}
),
off AS (
  SELECT id, bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY bucket
             ORDER BY __h, id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS "offset"
  FROM base
)
SELECT id, bucket, ("offset" // {budget})::BIGINT AS chunk, n_tokens,
       "offset"
FROM off
"""


def chunk_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-chunk fill statistics: docs per chunk, token sum, and fill
    ratio vs the budget (the packing-efficiency metric a data loader
    cares about). One hash aggregate over the packed frame."""
    return (packed.groupBy("bucket", "chunk")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("tokens"))
            .withColumn("fill", F.round(F.col("tokens") / budget, 6)))


def pack_sequences(tok: DataFrame, seq_len: int, id_col: str = "id",
                   ids_col: str = "input_ids", n_buckets: int = 8,
                   salt: str = "pack", eos_id: int | None = None) -> DataFrame:
    """Concatenate-and-split to FIXED-LENGTH token-id sequences — the
    final tokenize→pack step that turns a curated corpus into the
    ``input_ids`` rows an LM data loader consumes (documents cross
    sequence boundaries; the trailing partial sequence per bucket is
    dropped, the standard trade). Output: ``(bucket, seq_idx,
    input_ids, doc_starts)`` with ``len(input_ids) == seq_len`` for
    EVERY row; ``doc_starts`` holds the in-sequence offsets where a
    NEW document begins (empty when the whole sequence is one doc's
    interior) — exactly what block-diagonal attention masking needs
    to stop cross-document attention in packed training.

    ``eos_id`` (e.g. a reserved id past the vocab) appends a
    separator token after every non-empty document before packing —
    the usual document delimiter convention; token budget then counts
    docs + separators.

    The stream order is exactly :func:`pack_chunks`'s contract — docs
    hash into ``n_buckets`` independent streams on
    ``hash32(id || salt)``, ordered (hash, id) within a bucket — so a
    doc's ``pack_chunks`` chunk assignment and its tokens' actual
    sequence placement agree.

    Execution shape: ONE shuffle. ``repartitionByRange(bucket)``
    (range partitioning never splits a bucket across partitions, and
    — unlike hash partitioning, whose murmur3 collisions leave ~1/e
    of the partitions empty — spreads n_buckets distinct values
    ~1:1 over n_buckets partitions) +
    ``sortWithinPartitions(bucket, hash, id)``, then an Arrow kernel
    walks each bucket's stream with a seq_len accumulator and a carry
    across batches — per-task memory is one sequence, not one bucket.
    This is how the job runs at 100 TB: each bucket is an independent
    packing stream; add buckets to add parallelism."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StructField, StructType,
    )

    h = hash32(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    base = (tok.select(F.col(id_col).alias("id"),
                       F.coalesce(F.col(ids_col),
                                  F.array().cast("array<int>"))
                       .alias("ids"),
                       (h % n_buckets).alias("bucket"), h.alias("__h"))
            .repartitionByRange(n_buckets, "bucket")
            .sortWithinPartitions("bucket", "__h", "id"))
    schema = StructType([
        StructField("bucket", LongType(), False),
        StructField("seq_idx", LongType(), False),
        StructField("input_ids", ArrayType(IntegerType()), False),
        StructField("doc_starts", ArrayType(IntegerType()), False)])

    def kernel(batches):
        # carry = leftover ids; starts = stream offsets (relative to
        # the carry's first element) where a new doc begins
        cur_bucket, carry, starts, seq_idx = None, [], [], 0
        out = {"bucket": [], "seq_idx": [], "input_ids": [],
               "doc_starts": []}

        def flush_rows():
            if not out["bucket"]:
                return None
            df_out = pd.DataFrame(out)
            for k in out:
                out[k] = []
            return df_out

        for pdf in batches:
            for b, ids in zip(pdf["bucket"], pdf["ids"]):
                if b != cur_bucket:
                    # bucket boundary: the trailing partial drops
                    cur_bucket, carry, starts, seq_idx = b, [], [], 0
                if len(ids):
                    # every non-empty doc's first token is a boundary
                    # (offset relative to the carry's first element)
                    starts.append(len(carry))
                    carry.extend(int(x) for x in ids)
                    if eos_id is not None:
                        carry.append(int(eos_id))
                while len(carry) >= seq_len:
                    seq_starts = [s for s in starts if s < seq_len]
                    out["bucket"].append(int(cur_bucket))
                    out["seq_idx"].append(seq_idx)
                    out["input_ids"].append(carry[:seq_len])
                    out["doc_starts"].append(seq_starts)
                    carry = carry[seq_len:]
                    starts = [s - seq_len for s in starts
                              if s >= seq_len]
                    seq_idx += 1
            df_out = flush_rows()
            if df_out is not None:
                yield df_out

    return base.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# truncation-free bin packing (PK3): first-fit-decreasing document
# packing — the "Fewer Truncations Improve Language Modeling" (Ding et
# al. 2024) alternative to concatenate-and-split. pack_chunks lets a
# document straddle a chunk boundary (it gets truncated or attended
# across sequences); FFD packs each document WHOLE into a bin of
# ``budget`` tokens, trading a little padding for zero truncations.
# ---------------------------------------------------------------------------

def bin_pack_documents(df: DataFrame, budget: int,
                       id_col: str = "doc_id",
                       text_col: str = "text", n_buckets: int = 8,
                       tokens_col: str | None = None,
                       salt: str = "pack") -> DataFrame:
    """Assign each document a ``(bucket, bin)`` slot such that NO
    document is split and no bin exceeds ``budget`` tokens —
    first-fit-decreasing, the classic 11/9·OPT-bounded heuristic
    (docs sort by (n_tokens desc, id) within their bucket and each
    takes the first bin with room). A document LARGER than the
    budget gets a bin of its own with ``oversize = true`` — the
    caller decides truncate-vs-reject; silently splitting it would
    defeat the operator's whole point. Output: ``(id, bucket, bin,
    n_tokens, oversize)``.

    Scale shape — the :func:`pack_sequences` discipline exactly: docs
    hash into ``n_buckets`` independent packing streams,
    ``repartitionByRange(bucket)`` + ``sortWithinPartitions(bucket,
    n_tokens desc, id)`` is the ONE shuffle, and an Arrow kernel
    walks each bucket keeping only open-bin capacities in memory
    (bins are append-only under FFD — with sizes descending, a
    first-fit scan touches each bin until one fits; per-bucket work
    is O(docs·open_bins) with open_bins bounded by bucket tokens /
    budget). Buckets = parallelism; determinism comes from the
    (hash, size, id) order, never from partition layout."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    ident = F.col(id_col)
    if tokens_col:
        raw = F.col(tokens_col)
    else:
        raw = F.when(F.length(normalize_text(F.col(text_col))) == 0,
                     F.lit(0)).otherwise(token_count(F.col(text_col)))
    n_tok = F.coalesce(raw.cast("long"), F.lit(0))
    h = hash32(F.concat(ident.cast("string"), F.lit(salt)))
    base = (df.select(ident.cast("string").alias("id"),
                      n_tok.alias("n_tokens"),
                      (h % n_buckets).alias("bucket"))
            .repartitionByRange(n_buckets, "bucket")
            .sortWithinPartitions("bucket", F.col("n_tokens").desc(),
                                  "id"))
    schema = StructType([
        StructField("id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("bin", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("oversize", BooleanType(), False)])

    def kernel(batches):
        cur_bucket, caps = None, []       # caps[i] = remaining room
        out = {"id": [], "bucket": [], "bin": [], "n_tokens": [],
               "oversize": []}

        def emit(i, b, binno, n, over):
            out["id"].append(i)
            out["bucket"].append(b)
            out["bin"].append(binno)
            out["n_tokens"].append(n)
            out["oversize"].append(over)

        for pdf in batches:
            for i, b, n in zip(pdf["id"], pdf["bucket"],
                               pdf["n_tokens"]):
                if b != cur_bucket:
                    cur_bucket, caps = b, []
                n = int(n)
                if n > budget:
                    caps.append(0)        # oversize: a full own bin
                    emit(i, int(b), len(caps) - 1, n, True)
                    continue
                for j, c in enumerate(caps):
                    if c >= n:
                        caps[j] = c - n
                        emit(i, int(b), j, n, False)
                        break
                else:
                    caps.append(budget - n)
                    emit(i, int(b), len(caps) - 1, n, False)
            if len(out["id"]) >= 8192:
                yield pd.DataFrame(out)
                out = {k: [] for k in out}
        if out["id"]:
            yield pd.DataFrame(out)

    return base.mapInPandas(kernel, schema=schema)


def bin_pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing-efficiency report over :func:`bin_pack_documents`
    output: per-bucket bins used, the ceil(tokens/budget) lower
    bound, and the padding (waste) fraction — the number the FFD
    trade is judged by. One groupBy."""
    per_bucket = (packed.groupBy("bucket").agg(
        (F.max("bin") + 1).alias("bins_used"),
        F.sum("n_tokens").alias("tokens"),
        F.sum(F.when(F.col("oversize"), F.lit(0))
              .otherwise(F.col("n_tokens"))).alias("tokens_regular"),
        F.sum(F.when(F.col("oversize"), 1).otherwise(0))
        .alias("oversize_docs")))
    # oversize docs take exactly one bin each regardless of size, so
    # the achievable floor is ceil(regular tokens / budget) + one bin
    # per oversize doc — a raw ceil(tokens/budget) would demand bins
    # the packing is FORBIDDEN to merge
    lower = (F.ceil(F.col("tokens_regular") / F.lit(budget))
             + F.col("oversize_docs"))
    regular_bins = F.col("bins_used") - F.col("oversize_docs")
    waste = F.when(regular_bins > 0, F.round(
        F.lit(1.0) - F.col("tokens_regular")
        / (regular_bins * F.lit(budget)), 6)).otherwise(F.lit(0.0))
    return per_bucket.select(
        "bucket", "bins_used", lower.cast("long").alias("lower_bound"),
        "tokens", "oversize_docs", waste.alias("waste_frac"))
