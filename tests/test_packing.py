"""Token-budget sequence packing: offset/chunk arithmetic, bucket
sharding (no single-partition window), determinism under
repartitioning, and fill statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dynamic_etl_pipeline_thesis_ii_spark.operators import packing as PK

DOC_SCHEMA = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])


@pytest.fixture()
def docs(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(5 + (i % 7))))
            for i in range(40)]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_offsets_are_exclusive_cumsums(spark, docs):
    packed = PK.pack_chunks(docs, budget=20, n_buckets=4).collect()
    by_bucket = {}
    for r in sorted(packed, key=lambda r: (r["bucket"], r["offset"])):
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        run = 0
        for r in rows:
            assert r["offset"] == run
            assert r["chunk"] == run // 20
            run += r["n_tokens"]


def test_every_doc_packed_once(spark, docs):
    packed = PK.pack_chunks(docs, budget=20, n_buckets=4)
    assert packed.count() == 40
    assert packed.select("id").distinct().count() == 40


def test_deterministic_under_repartition(spark, docs):
    a = sorted(map(tuple, PK.pack_chunks(docs, budget=20, n_buckets=4)
                   .collect()))
    b = sorted(map(tuple, PK.pack_chunks(docs.repartition(13), budget=20,
                                         n_buckets=4).collect()))
    assert a == b


def test_tokens_col_shortcut_matches_inline_count(spark, docs):
    pre = docs.withColumn("n", F.size(F.split(
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")))
    a = sorted(map(tuple, PK.pack_chunks(docs, budget=20, n_buckets=4)
                   .collect()))
    b = sorted(map(tuple, PK.pack_chunks(pre, budget=20, n_buckets=4,
                                         tokens_col="n").collect()))
    assert a == b


def test_chunk_stats_fill(spark, docs):
    packed = PK.pack_chunks(docs, budget=20, n_buckets=4)
    stats = PK.chunk_stats(packed, budget=20)
    rows = stats.collect()
    assert sum(r["n_docs"] for r in rows) == 40
    for r in rows:
        assert abs(r["fill"] - r["tokens"] / 20) < 1e-9


def test_no_single_partition_window(spark, docs):
    plan = PK.pack_chunks(docs, budget=20, n_buckets=4)._jdf \
        .queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        PK.pack_chunks(docs, budget=0)
    with pytest.raises(ValueError):
        PK.pack_chunks(docs, budget=10, n_buckets=0)


def test_empty_input(spark):
    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert PK.pack_chunks(empty, budget=10).count() == 0


def test_null_text_packs_as_zero_tokens(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, None), (3, "d e")],
                               DOC_SCHEMA)
    rows = {r["id"]: r for r in PK.pack_chunks(df, budget=4,
                                               n_buckets=1).collect()}
    assert rows[2]["n_tokens"] == 0
    total = sum(r["n_tokens"] for r in rows.values())
    assert max(r["offset"] + r["n_tokens"] for r in rows.values()) == total


def test_empty_text_packs_as_zero_tokens(spark):
    """Empty (non-null) text is 0 tokens, same as null — split('', ' ')
    yields [''] and previously charged one phantom token per empty doc,
    inflating offsets and chunk fill stats."""
    df = spark.createDataFrame([(1, "a b c"), (2, ""), (3, "   "),
                                (4, "d e")], DOC_SCHEMA)
    rows = {r["id"]: r for r in PK.pack_chunks(df, budget=4,
                                               n_buckets=1).collect()}
    assert rows[2]["n_tokens"] == 0
    assert rows[3]["n_tokens"] == 0     # whitespace-only normalizes to ''
    total = sum(r["n_tokens"] for r in rows.values())
    assert total == 5
    assert max(r["offset"] + r["n_tokens"] for r in rows.values()) == total


def test_chunk_documents_overlap_semantics(spark):
    """T13: chunk i covers tokens [i*stride, i*stride+size); overlap
    regions repeat verbatim, the tail chunk is short, stride==size is
    disjoint, empty/null docs vanish."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        chunk_documents,
    )
    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "only three words"), (3, ""), (4, None)],
        "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, size=4, stride=3).collect():
        got.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_tokens"]))
    for v in got.values():
        v.sort()
    # doc 1: starts 0,3,6 -> 3 chunks; start 9 would be tokens[9:10],
    # fully contained in chunk 2 (tokens[6:10]) -> dropped
    assert got[1] == [(0, "w0 w1 w2 w3", 4), (1, "w3 w4 w5 w6", 4),
                      (2, "w6 w7 w8 w9", 4)]
    assert got[2] == [(0, "only three words", 3)]
    assert 3 not in got and 4 not in got

    # stride == size: disjoint cover, concatenation rebuilds the doc
    disjoint = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(df.filter("doc_id = 1"),
                                 size=5, stride=5).collect())
    assert " ".join(t for _, t in disjoint) == words

    import pytest as _pytest
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=4, stride=5)
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=4, stride=0)


def test_pack_sequences_fixed_length_and_stream_order(spark):
    """Every output row is EXACTLY seq_len ids; within each bucket the
    concatenation of sequences equals the (hash, id)-ordered doc
    streams' ids with the trailing partial dropped — checked against
    a plain-python reference over the same hash/bucket exprs."""
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_thesis_ii_spark.operators import bpe as BP
    from dynamic_etl_pipeline_thesis_ii_spark.operators import packing as PK
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import hash32

    docs = spark.createDataFrame(
        [(i, ("alpha beta gamma " * (i % 5 + 1)) + f"doc{i}")
         for i in range(40)],
        "doc_id long, text string")
    merges = BP.train_bpe(docs, n_merges=25)
    tok = BP.encode_ids(docs, merges)

    seq_len, n_buckets = 16, 4
    out = PK.pack_sequences(tok, seq_len, n_buckets=n_buckets).collect()
    assert out and all(len(r["input_ids"]) == seq_len for r in out)

    # python reference over the same hash/bucket/order exprs
    h = hash32(F.concat(F.col("id").cast("string"), F.lit("pack")))
    rows = (tok.select("id", "input_ids", (h % n_buckets).alias("b"),
                       h.alias("h")).collect())
    streams: dict = {}
    for r in sorted(rows, key=lambda r: (r["b"], r["h"], r["id"])):
        streams.setdefault(r["b"], []).extend(r["input_ids"])
    want = {}
    for b, ids in streams.items():
        for s in range(len(ids) // seq_len):
            want[(b, s)] = ids[s * seq_len:(s + 1) * seq_len]
    got = {(r["bucket"], r["seq_idx"]): list(r["input_ids"]) for r in out}
    assert got == want
    # deterministic across runs
    again = {(r["bucket"], r["seq_idx"]): list(r["input_ids"])
             for r in PK.pack_sequences(tok, seq_len,
                                        n_buckets=n_buckets).collect()}
    assert again == got


def test_pack_sequences_doc_starts_and_eos(spark):
    """doc_starts marks every in-sequence offset where a new document
    begins (a reference recomputation from the same stream agrees
    exactly), and eos_id appends one separator per non-empty doc —
    boundaries then sit right after each eos."""
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_thesis_ii_spark.operators import packing as PK
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import hash32

    tok = spark.createDataFrame(
        [(i, list(range(100 * i, 100 * i + (i % 4) + 2)))
         for i in range(30)],
        "id long, input_ids array<int>")
    seq_len, nb, eos = 8, 2, 31999
    out = PK.pack_sequences(tok, seq_len, n_buckets=nb,
                            eos_id=eos).collect()
    assert out and all(len(r["input_ids"]) == seq_len for r in out)

    # python reference: same stream order, one eos after each doc,
    # doc boundaries at each doc's first token
    h = hash32(F.concat(F.col("id").cast("string"), F.lit("pack")))
    rows = tok.select("id", "input_ids", (h % nb).alias("b"),
                      h.alias("h")).collect()
    streams, bounds = {}, {}
    for r in sorted(rows, key=lambda r: (r["b"], r["h"], r["id"])):
        s = streams.setdefault(r["b"], [])
        if r["input_ids"]:
            bounds.setdefault(r["b"], []).append(len(s))
            s.extend(r["input_ids"])
            s.append(eos)
    want = {}
    for b, ids in streams.items():
        for k in range(len(ids) // seq_len):
            lo, hi = k * seq_len, (k + 1) * seq_len
            want[(b, k)] = (ids[lo:hi],
                            [x - lo for x in bounds[b] if lo <= x < hi])
    got = {(r["bucket"], r["seq_idx"]):
           (list(r["input_ids"]), list(r["doc_starts"])) for r in out}
    assert got == want
    # every boundary after the first token follows an eos separator
    for (b, k), (ids, starts) in got.items():
        for s in starts:
            if s > 0:
                assert ids[s - 1] == eos


def test_pack_sequences_validation_and_empty_docs(spark):
    import pytest as _pt

    from dynamic_etl_pipeline_thesis_ii_spark.operators import packing as PK

    tok = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, None), (3, [])],
        "id long, input_ids array<int>")
    with _pt.raises(ValueError):
        PK.pack_sequences(tok, 0)
    # null/empty id arrays contribute zero tokens, never poison a row
    out = PK.pack_sequences(tok, seq_len=2, n_buckets=1).collect()
    assert [r["input_ids"] for r in out] == [[1, 2]]


def _ffd_reference(rows, budget, n_buckets, salt="pack"):
    """Pure-python FFD over the same (hash, size desc, id) order."""
    import hashlib

    def h32(s):
        return int.from_bytes(
            hashlib.md5(s.encode()).digest()[:4], "big")

    by_bucket = {}
    for rid, n in rows:
        b = h32(f"{rid}{salt}") % n_buckets
        by_bucket.setdefault(b, []).append((str(rid), n))
    out = {}
    for b, docs in by_bucket.items():
        docs.sort(key=lambda x: (-x[1], x[0]))
        caps = []
        for rid, n in docs:
            if n > budget:
                caps.append(0)
                out[rid] = (b, len(caps) - 1, True)
                continue
            for j, c in enumerate(caps):
                if c >= n:
                    caps[j] = c - n
                    out[rid] = (b, j, False)
                    break
            else:
                caps.append(budget - n)
                out[rid] = (b, len(caps) - 1, False)
    return out


def test_bin_pack_matches_python_reference_and_invariants(spark):
    """FFD assignment == the pure-python reference bucket-for-bucket;
    no bin over budget; oversize docs isolated; stats are
    arithmetically consistent."""
    import random

    from dynamic_etl_pipeline_thesis_ii_spark.operators.packing import (
        bin_pack_documents,
        bin_pack_stats,
    )

    rng = random.Random(11)
    rows = [(i, rng.randint(1, 90)) for i in range(400)]
    rows += [(1000, 500), (1001, 120)]          # oversize at budget=100
    docs = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    packed = bin_pack_documents(docs, budget=100, n_buckets=4,
                                tokens_col="n").collect()
    got = {r["id"]: (r["bucket"], r["bin"], r["oversize"])
           for r in packed}
    want = _ffd_reference(rows, 100, 4)
    assert got == want
    # no bin over budget (oversize bins hold exactly one doc)
    fill = {}
    for r in packed:
        fill.setdefault((r["bucket"], r["bin"]), []).append(r)
    for (_b, _bin), docs_in in fill.items():
        if any(d["oversize"] for d in docs_in):
            assert len(docs_in) == 1
        else:
            assert sum(d["n_tokens"] for d in docs_in) <= 100
    stats = bin_pack_stats(
        bin_pack_documents(docs, budget=100, n_buckets=4,
                           tokens_col="n"), budget=100).collect()
    assert sum(r["oversize_docs"] for r in stats) == 2
    for r in stats:
        assert r["bins_used"] >= r["lower_bound"]
        assert 0.0 <= r["waste_frac"] < 1.0


def test_bin_pack_partitioning_determinism_and_edge_cases(spark):
    """Same corpus, different input partitioning -> identical
    assignment (order comes from (size, id), never layout); empty/
    null text counts as zero tokens and packs."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.packing import (
        bin_pack_documents,
    )

    docs = spark.createDataFrame(
        [(i, "word " * (i % 7)) for i in range(60)]
        + [(100, ""), (101, None)],
        "doc_id bigint, text string")
    a = sorted(map(tuple, bin_pack_documents(
        docs.repartition(1), budget=10, n_buckets=3).collect()))
    b = sorted(map(tuple, bin_pack_documents(
        docs.repartition(13), budget=10, n_buckets=3).collect()))
    assert a == b and len(a) == 62
    zero = [r for r in a if r[0] in ("100", "101")]
    assert all(r[3] == 0 and not r[4] for r in zero)


def test_bin_pack_beats_or_matches_stream_packing_on_waste(spark):
    """The FFD trade: zero truncations with bounded padding — bins
    used stays within 11/9·OPT + 1 of the lower bound on a random
    workload (the classic FFD guarantee)."""
    import math
    import random

    from dynamic_etl_pipeline_thesis_ii_spark.operators.packing import (
        bin_pack_documents,
        bin_pack_stats,
    )

    rng = random.Random(5)
    docs = spark.createDataFrame(
        [(i, rng.randint(10, 80)) for i in range(600)],
        "doc_id bigint, n bigint")
    stats = bin_pack_stats(
        bin_pack_documents(docs, budget=128, n_buckets=4,
                           tokens_col="n"), budget=128).collect()
    for r in stats:
        assert r["bins_used"] <= math.ceil(11 / 9 * r["lower_bound"]) + 1


def test_nl_bin_pack_target(spark, sf_dir, tmp_path):
    """'bin pack the corpus into bins of 64 tokens without
    truncation': routing, invariant-checked assignment at the sink,
    efficiency stats in the report."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "bin pack the corpus into bins of 64 tokens, 4 buckets")
    assert p == {"target": "bin_pack", "budget": 64, "n_buckets": 4}
    assert parse_dataops_query(
        "pack the documents without truncation")["target"] \
        == "bin_pack"
    # the default shard flow must NOT be captured
    assert parse_dataops_query(
        "curate the corpus and pack 512-token sequences")["target"] \
        == "corpus_to_shards"

    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    out = str(tmp_path / "bins")
    res = pipe.run_dataops(
        "bin pack the corpus into bins of 64 tokens, 4 buckets",
        sf_dir, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["n_buckets"] == 4 and rep["total_bins"] > 0
    back = spark.read.parquet(out)
    assert back.count() == rep["n_docs"]
    # invariant: no regular bin over budget
    from pyspark.sql import functions as F
    over = (back.filter(~F.col("oversize"))
            .groupBy("bucket", "bin")
            .agg(F.sum("n_tokens").alias("t"))
            .filter(F.col("t") > 64).count())
    assert over == 0
    for s in rep["bucket_stats"]:
        assert s["bins_used"] >= s["lower_bound"]
