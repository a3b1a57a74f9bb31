"""Incremental dedup: a new ingest batch checked against a persisted
corpus snapshot (content-hash keys for exact, LSH band table for
near-dup) — cost scales with the batch, never the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dynamic_etl_pipeline_thesis_ii_spark.operators import dedup as D

DOC_SCHEMA = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six seven"),
        (3, "totally different historical document text"),
    ], DOC_SCHEMA)


def test_incremental_exact_drops_seen_and_batch_dups(spark, corpus):
    seen = D.content_keys(corpus)
    batch = spark.createDataFrame([
        (10, "Alpha  beta GAMMA delta epsilon zeta"),   # dup of seen 1
        (11, "a genuinely new document"),
        (12, "a  genuinely NEW document"),               # dup of 11 in-batch
        (13, "another new one"),
    ], DOC_SCHEMA)
    kept = {r["doc_id"] for r in D.incremental_exact(batch, seen).collect()}
    assert kept == {11, 13}


def test_incremental_exact_empty_snapshot(spark, corpus):
    empty_seen = D.content_keys(corpus).limit(0)
    kept = {r["doc_id"]
            for r in D.incremental_exact(corpus, empty_seen).collect()}
    assert kept == {1, 2, 3}


def test_incremental_neardup_probe_finds_snapshot_neighbor(spark, corpus):
    bands = D.minhash_band_keys(corpus, k=2)
    batch = spark.createDataFrame([
        # same shingles as seen doc 1 plus a tail → shares band buckets
        (20, "alpha beta gamma delta epsilon zeta eta theta"),
        (21, "completely unrelated fresh content here"),
    ], DOC_SCHEMA)
    pairs = {(r["id_new"], r["id_seen"])
             for r in D.incremental_neardup_pairs(batch, bands,
                                                  k=2).collect()}
    assert (20, 1) in pairs
    assert all(idn != 21 for idn, _ in pairs)


def test_incremental_neardup_no_corpus_self_join(spark, corpus):
    bands = D.minhash_band_keys(corpus, k=2)
    batch = corpus.limit(1)
    plan = D.incremental_neardup_pairs(batch, bands, k=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_lsh_pairs_unchanged_by_band_key_refactor(spark, corpus):
    # minhash_lsh_pairs now builds on minhash_band_keys; the classic
    # within-corpus pair semantics must be intact
    docs = corpus.union(spark.createDataFrame(
        [(4, "alpha beta gamma delta epsilon zeta")], DOC_SCHEMA))
    pairs = {(r["id_a"], r["id_b"])
             for r in D.minhash_lsh_pairs(docs, k=2).collect()}
    assert (1, 4) in pairs


def test_snapshot_roundtrip_through_parquet(spark, corpus, tmp_path):
    """The operational loop: persist the content-key and band-table
    snapshots to parquet after an ingest run, read them back in the
    next run, and dedup the new batch against them."""
    keys_path = str(tmp_path / "seen_keys")
    bands_path = str(tmp_path / "seen_bands")
    D.content_keys(corpus).write.parquet(keys_path)
    D.minhash_band_keys(corpus, k=2).write.parquet(bands_path)

    seen = spark.read.parquet(keys_path)
    bands = spark.read.parquet(bands_path)
    batch = spark.createDataFrame([
        (30, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (31, "a wholly new document body"),
    ], DOC_SCHEMA)
    kept = {r["doc_id"] for r in D.incremental_exact(batch, seen).collect()}
    assert kept == {31}
    pairs = {(r["id_new"], r["id_seen"])
             for r in D.incremental_neardup_pairs(batch, bands,
                                                  k=2).collect()}
    assert (30, 1) in pairs


def test_null_and_empty_text_get_real_content_keys(spark, corpus):
    """Null/empty text must hash to a REAL key ('' after coalesce), not
    NULL: a NULL key never matches the snapshot anti-join, so empty docs
    would re-ingest every batch while still collapsing inside the batch
    window — the inconsistent half-dedup ADVICE flagged."""
    batch0 = spark.createDataFrame([(60, None), (61, "")], DOC_SCHEMA)
    keys = D.content_keys(batch0).collect()
    assert all(r["key"] is not None for r in keys)
    # null and empty normalize to the same content -> same key
    assert len({r["key"] for r in keys}) == 1

    # in-batch: all empty/null docs are exact dups of one another
    kept0 = {r["doc_id"]
             for r in D.incremental_exact(batch0,
                                          D.content_keys(corpus)).collect()}
    assert kept0 == {60}

    # cross-batch: once an empty doc is in the snapshot, later empty
    # docs are dropped (previously they leaked through forever)
    seen = D.content_keys(corpus).unionByName(
        D.content_keys(batch0.limit(1)))
    batch1 = spark.createDataFrame([(70, None), (71, "fresh text")],
                                   DOC_SCHEMA)
    kept1 = {r["doc_id"] for r in D.incremental_exact(batch1, seen).collect()}
    assert kept1 == {71}


def test_multi_epoch_ingest_grows_snapshot(spark, corpus, tmp_path):
    """Full operational cycle over three epochs: build the snapshot at
    T0, ingest a batch at T1 (dedup + append the survivors' keys/bands
    via append_new_keys), then ingest at T2 against the GROWN snapshot —
    T2 must see T1's documents, both exactly and via the band table."""
    from dynamic_etl_pipeline_thesis_ii_spark.sources.sinks import (
        append_new_keys,
    )
    keys_path = str(tmp_path / "keys")
    bands_path = str(tmp_path / "bands")
    append_new_keys(D.content_keys(corpus), keys_path, ["id"])
    append_new_keys(D.minhash_band_keys(corpus, k=2), bands_path, ["id"])

    # T1: one dup of corpus doc 1, one genuinely new doc
    batch1 = spark.createDataFrame([
        (40, "alpha beta gamma delta epsilon zeta"),
        (41, "brand new tee one document body here"),
    ], DOC_SCHEMA)
    kept1 = D.incremental_exact(batch1, spark.read.parquet(keys_path))
    assert {r["doc_id"] for r in kept1.collect()} == {41}
    append_new_keys(D.content_keys(kept1), keys_path, ["id"])
    append_new_keys(D.minhash_band_keys(kept1, k=2), bands_path, ["id"])

    # T2: exact dup of the T1 doc, near-dup of the T1 doc, fresh doc
    batch2 = spark.createDataFrame([
        (50, "brand new tee one document body here"),
        (51, "brand new tee one document body here with a tail"),
        (52, "entirely fresh tee two content words"),
    ], DOC_SCHEMA)
    seen2 = spark.read.parquet(keys_path)
    kept2 = {r["doc_id"]
             for r in D.incremental_exact(batch2, seen2).collect()}
    assert kept2 == {51, 52}
    pairs = {(r["id_new"], r["id_seen"])
             for r in D.incremental_neardup_pairs(
                 batch2, spark.read.parquet(bands_path), k=2).collect()}
    assert (51, 41) in pairs            # T2 sees the T1 doc
    assert (50, 41) in pairs            # the exact dup collides too
    assert all(idn != 52 for idn, _ in pairs)

    # idempotence: re-appending the same survivors adds no rows
    n_before = spark.read.parquet(keys_path).count()
    append_new_keys(D.content_keys(kept1), keys_path, ["id"])
    assert spark.read.parquet(keys_path).count() == n_before


def test_corpus_diff_statuses(spark):
    """Snapshot diff: added/removed/changed/unchanged on the shared
    content key — whitespace/case noise is NOT a change, null text
    hashes to a real key, and both directions of id drift are seen."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators import dedup as D
    old = spark.createDataFrame([
        (1, "alpha beta gamma"),
        (2, "delta epsilon"),
        (3, "zeta eta"),
        (4, None),
        (5, "same text"),
    ], "doc_id long, text string")
    new = spark.createDataFrame([
        (1, "  ALPHA   beta GAMMA "),   # normalization noise: unchanged
        (2, "delta epsilon REWRITTEN"), # changed
        (4, ""),                        # null -> '' coalesce: unchanged
        (5, "same text"),
        (6, "arrived later"),           # added
    ], "doc_id long, text string")      # 3 removed
    got = {r["doc_id"]: r["status"]
           for r in D.corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "unchanged", 5: "unchanged", 6: "added"}

    # empty sides degrade to all-added / all-removed
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert {r["status"] for r in D.corpus_diff(empty, new).collect()} \
        == {"added"}
    assert {r["status"] for r in D.corpus_diff(old, empty).collect()} \
        == {"removed"}


# ---------------------------------------------------------------------------
# Bloom-filter pre-filter (D10)
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import BloomFilter
    keys = spark.range(0, 5000).selectExpr("id * 2654435761 % 4294967296 AS key")
    bf = BloomFilter.fit(keys, "key", fpp=0.01)
    member = np.array([(i * 2654435761) % 4294967296 for i in range(5000)],
                      dtype=np.uint64)
    assert bool(bf.might_contain(member).all())  # negatives are certain
    probe = np.arange(10_000_000, 10_050_000, dtype=np.uint64)
    hits = int(bf.might_contain(probe).sum())
    # nominal 1% fpp; allow generous slack for hash variance
    assert hits < 0.03 * len(probe)


def test_bloom_sizing_floors():
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import BloomFilter
    m, k = BloomFilter.sizing(0, 0.01)
    assert m >= 64 and m % 64 == 0 and 1 <= k <= 16
    m2, _ = BloomFilter.sizing(1_000_000, 0.01)
    assert m2 / 1_000_000 == pytest.approx(9.585, rel=0.01)  # bits/key


def test_bloom_snapshot_fresh_matches_exact_path(spark):
    """The bloom pre-filter must change the PLAN, never the answer:
    bloom_snapshot_fresh == snapshot_fresh row-for-row, including
    within-batch duplicate keys and a seen-side superset."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators import dedup as D
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} body text") for i in range(200)],
        "doc_id long, text string")
    seen = D.content_keys(corpus.filter("doc_id % 3 = 0"))
    batch = spark.createDataFrame(
        [(1000 + i, f"doc number {i} body text") for i in range(150)]
        + [(2000, "brand new document"), (2001, "Brand   NEW document")],
        "doc_id long, text string")
    exact = {r["doc_id"] for r in D.snapshot_fresh(batch, seen).collect()}
    bloom = {r["doc_id"]
             for r in D.bloom_snapshot_fresh(batch, seen).collect()}
    assert bloom == exact
    # the normalized-case variant shares 2000's key and both survive
    # (snapshot_fresh dedups against the SNAPSHOT, not within-batch)
    assert {2000, 2001} <= bloom


def test_bloom_reuse_across_batches(spark):
    """A filter fitted once serves later batches (the snapshot-store
    pattern); exactness still guaranteed by the confirming anti-join."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators import dedup as D
    corpus = spark.createDataFrame(
        [(i, f"seen {i}") for i in range(50)], "doc_id long, text string")
    seen = D.content_keys(corpus)
    bf = D.BloomFilter.fit(seen.select("key"), "key", fpp=0.01)
    batch = spark.createDataFrame(
        [(100, "seen 7"), (101, "unseen A"), (102, "seen 49"),
         (103, "unseen B")], "doc_id long, text string")
    out = {r["doc_id"]
           for r in D.bloom_snapshot_fresh(batch, seen, bloom=bf).collect()}
    assert out == {101, 103}


def test_bloom_save_load_roundtrip(spark, tmp_path):
    """The filter persists as plain parquet beside the snapshot and
    loads back bit-identical: same sizing, same fill metadata, same
    membership answers on hits and misses."""
    import numpy as np
    keys = spark.range(0, 3000).selectExpr(
        "id * 2654435761 % 4294967296 AS key")
    bf = D.BloomFilter.fit(keys, "key", fpp=0.02, capacity=6000)
    path = str(tmp_path / "bloom")
    bf.save(spark, path)
    back = D.BloomFilter.load(spark, path)
    assert (back.n_bits, back.k) == (bf.n_bits, bf.k)
    assert (back.n_items, back.capacity) == (3000, 6000)
    assert back.fpp == pytest.approx(0.02)
    assert np.array_equal(back.words, bf.words)
    probe = np.arange(0, 200_000, dtype=np.uint64)
    assert np.array_equal(back.might_contain(probe),
                          bf.might_contain(probe))


def test_bloom_add_keys_is_incremental_union(spark):
    """add_keys ORs a batch's bits in place (batch-cost, never a
    rebuild): old members stay, new members join, and the result
    equals a from-scratch fit over the union at the same sizing."""
    import numpy as np
    k1 = spark.range(0, 1000).selectExpr("id AS key")
    k2 = spark.range(5000, 6000).selectExpr("id AS key")
    bf = D.BloomFilter.fit(k1, "key", fpp=0.01, capacity=4000)
    bf.add_keys(k2, "key")
    assert bf.n_items == 2000 and bf.capacity == 4000
    assert bool(bf.might_contain(
        np.arange(0, 1000, dtype=np.uint64)).all())
    assert bool(bf.might_contain(
        np.arange(5000, 6000, dtype=np.uint64)).all())
    both = D.BloomFilter.fit(k1.union(k2), "key", fpp=0.01, capacity=4000)
    assert np.array_equal(bf.words, both.words)  # same bits exactly


def test_corpus_census_merge_equals_recompute(spark):
    """merge(census(A), census(B)) == census(A ∪ B) exactly for
    disjoint A/B — the incremental-ingest contract (counts are
    integer sums, so the merge is associative and exact)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        corpus_census,
        merge_census,
    )
    rows = [(i, f"w{i} " * (i % 7 + 1), f"l{i % 3}", f"s{i % 2}")
            for i in range(60)]
    schema = "doc_id long, text string, lang string, source string"
    a = spark.createDataFrame(rows[:35], schema)
    b = spark.createDataFrame(rows[35:], schema)
    both = spark.createDataFrame(rows, schema)

    def snap(df):
        return sorted(map(tuple, df.collect()))

    assert snap(merge_census(corpus_census(a), corpus_census(b))) == \
        snap(corpus_census(both))
    # null stratum values fold into a '__null__' row, never drop
    c = spark.createDataFrame([(1, "x y", None, "s0")], schema)
    rowsc = {(r["kind"], r["stratum"]): r["n_docs"]
             for r in corpus_census(c).collect()}
    assert rowsc[("lang", "__null__")] == 1
    assert rowsc[("__total__", "__total__")] == 1


def test_census_histogram_merge_and_buckets(spark):
    """merge(hist(A), hist(B)) == hist(A ∪ B) exactly, and the
    power-of-two bucket assignment is the documented one (empty doc
    -> -1, 1 token -> 0, 2-3 -> 1, 4-7 -> 2, ...)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        census_histogram,
        merge_histogram,
    )
    rows = [(i, "w " * (i % 9), f"l{i % 3}", f"s{i % 2}")
            for i in range(80)]
    schema = "doc_id long, text string, lang string, source string"
    a = spark.createDataFrame(rows[:45], schema)
    b = spark.createDataFrame(rows[45:], schema)
    both = spark.createDataFrame(rows, schema)

    def snap(df):
        return sorted(map(tuple, df.collect()))

    assert snap(merge_histogram(census_histogram(a),
                                census_histogram(b))) == \
        snap(census_histogram(both))
    # bucket law: n_tokens 0->-1, 1->0, 2..3->1, 4..7->2
    probe = spark.createDataFrame(
        [(1, "", "en", "s"), (2, "a", "en", "s"), (3, "a b c", "en", "s"),
         (4, "a b c d e f g", "en", "s")], schema)
    got = {r["bucket"]: r["n_docs"]
           for r in census_histogram(probe).collect()
           if r["kind"] == "__total__"}
    assert got == {-1: 1, 0: 1, 1: 1, 2: 1}


def test_census_histogram_matches_duckdb(spark, sf_dir):
    """Differential: Spark census_histogram == the DuckDB GROUPING
    SETS twin over the same documents parquet (exact integer sums —
    cell-exact equality)."""
    from tests.oracle import duck_connect

    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        SQL_CENSUS_HISTOGRAM,
        census_histogram,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog

    docs = Catalog(spark, sf_dir).documents
    got = sorted(map(tuple, census_histogram(docs).collect()))
    con = duck_connect(sf_dir)
    want = sorted(map(tuple, con.execute(
        SQL_CENSUS_HISTOGRAM("documents")).fetchall()))
    assert got == want


def test_census_distinct_merge_and_tolerance(spark):
    """HLL distinct census: estimates within sketch tolerance of the
    exact distinct count, and folding epoch sketches with
    merge_distinct matches a fresh full recompute — the mergeable
    answer to 'how many distinct X per stratum' that exact sums
    cannot give (values repeat across batches)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        census_distinct,
        estimate_distinct,
        merge_distinct,
    )
    # 600 rows, values repeat across the epoch boundary on purpose
    rows = [(i, f"dom{i % 211}.example", f"l{i % 3}", f"s{i % 2}")
            for i in range(600)]
    schema = "doc_id long, value string, lang string, source string"
    a = spark.createDataFrame(rows[:400], schema)
    b = spark.createDataFrame(rows[400:], schema)
    both = spark.createDataFrame(rows, schema)

    merged = merge_distinct(census_distinct(a, "value"),
                            census_distinct(b, "value"))
    est_m = {(r["kind"], r["stratum"]): r["n_distinct"]
             for r in estimate_distinct(merged).collect()}
    est_f = {(r["kind"], r["stratum"]): r["n_distinct"]
             for r in estimate_distinct(
                 census_distinct(both, "value")).collect()}
    # merged == fresh recompute per stratum (same sketch family,
    # order-insensitive union), within 1% slack for representation
    assert est_m.keys() == est_f.keys()
    for k in est_f:
        assert abs(est_m[k] - est_f[k]) <= max(2.0, 0.01 * est_f[k]), k
    # and the total estimate is within 5% of the exact 211
    tot = est_f[("__total__", "__total__")]
    assert abs(tot - 211) <= 0.05 * 211
    # n_rows stays an exact mergeable sum
    n_rows = {(r["kind"], r["stratum"]): r["n_rows"]
              for r in merged.collect()}
    assert n_rows[("__total__", "__total__")] == 600


def test_histogram_quantiles_reads_off_stored_table(spark):
    """histogram_quantiles: per-stratum quantile estimates off the
    bounded histogram table — exact at bucket boundaries, within the
    bucket-resolution contract (factor of 2) against true
    percentiles, no corpus scan."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        census_histogram,
        histogram_quantiles,
    )
    # 100 docs per lang: l0 all 10 tokens, l1 all 100 tokens
    rows = ([(i, "w " * 10, "l0", "s") for i in range(100)]
            + [(1000 + i, "w " * 100, "l1", "s") for i in range(100)])
    schema = "doc_id long, text string, lang string, source string"
    hist = census_histogram(spark.createDataFrame(rows, schema))
    q = histogram_quantiles(hist, quantiles=(0.5, 0.99), kind="lang")
    assert set(q) == {"l0", "l1"}
    # 10 tokens -> bucket 3 ([8,16)); 100 -> bucket 6 ([64,128))
    for s, true in [("l0", 10), ("l1", 100)]:
        for est in q[s].values():
            assert true / 2 <= est <= true * 2, (s, est)
    # quantiles are monotone in q
    assert q["l0"][0.5] <= q["l0"][0.99]
    # the __total__ view mixes both lengths: p50 in the short bucket,
    # p99 in the long one
    qt = histogram_quantiles(hist, quantiles=(0.25, 0.99))["__total__"]
    assert qt[0.25] <= 16 and qt[0.99] >= 64


def test_incremental_hamming_probe_images(spark, tmp_path):
    """Hamming-space snapshot store (the image analog of the band-table
    snapshot): persist hamming_band_keys of corpus dhash fingerprints,
    probe a new batch — the near-copy of a seen image pairs, the fresh
    image doesn't, and the probe equals the full self-join's verdicts
    for cross-set pairs."""
    import numpy as np

    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        multimodal as M,
    )

    rng = np.random.default_rng(3)
    grad = np.linspace(0, 200, 32, dtype=np.uint8)

    def img(seed_shift):
        x = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
              + np.roll(grad, seed_shift)[None, :, None]) // 2)
        return x.astype(np.uint8)

    a, b = img(0), img(16)
    seen = spark.createDataFrame(
        [(1, "image", bytes(M.write_bmp(a))),
         (2, "image", bytes(M.write_bmp(b)))],
        "media_id long, kind string, payload binary")
    bands_path = str(tmp_path / "img_bands")
    D.hamming_band_keys(M.image_dhash(seen), max_hamming=6,
                        n_blocks=8).write.parquet(bands_path)

    a_noisy = a.copy()
    a_noisy[::9, ::6] = np.clip(a_noisy[::9, ::6].astype(int) + 10,
                                0, 255).astype(np.uint8)
    fresh = img(8)
    batch = spark.createDataFrame(
        [(10, "image", bytes(M.write_png(a_noisy))),
         (11, "image", bytes(M.write_bmp(fresh)))],
        "media_id long, kind string, payload binary")
    pairs = {(r["id_new"], r["id_seen"]): r["hamming"]
             for r in D.incremental_hamming_pairs(
                 M.image_dhash(batch),
                 spark.read.parquet(bands_path),
                 max_hamming=6, n_blocks=8).collect()}
    assert (10, 1) in pairs and pairs[(10, 1)] <= 6
    assert all(idn != 11 for idn, _ in pairs)


def test_incremental_hamming_prunes_and_flags_reingest(spark, tmp_path):
    """The batch probe LEFT-SEMI-prunes the snapshot to the batch's
    broadcast probe keys (cost scales with the batch), and — like the
    MinHash siblings — has no id-equality exclusion: re-ingesting a
    seen image flags against itself at hamming 0."""
    import numpy as np

    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        multimodal as M,
    )

    rng = np.random.default_rng(9)
    grad = np.linspace(0, 200, 32, dtype=np.uint8)
    a = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
          + grad[None, :, None]) // 2).astype(np.uint8)
    seen = spark.createDataFrame(
        [(1, "image", bytes(M.write_bmp(a)))],
        "media_id long, kind string, payload binary")
    seen_banded = D.hamming_band_keys(M.image_dhash(seen),
                                      max_hamming=6, n_blocks=8)

    probe = D.incremental_hamming_pairs(
        M.image_dhash(seen), seen_banded, max_hamming=6, n_blocks=8)
    got = {(r["id_new"], r["id_seen"], r["hamming"])
           for r in probe.collect()}
    assert got == {(1, 1, 0)}

    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_hamming_snapshot_store_carries_geometry(spark, tmp_path):
    """save/load_hamming_snapshot: the band geometry rides the store
    (a probe banded with the snapshot's own loaded parameters finds
    the planted near-copy; the geometry dict round-trips exactly)."""
    import numpy as np

    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        multimodal as M,
    )

    rng = np.random.default_rng(13)
    grad = np.linspace(0, 200, 32, dtype=np.uint8)
    a = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
          + grad[None, :, None]) // 2).astype(np.uint8)
    seen = spark.createDataFrame(
        [(1, "image", bytes(M.write_bmp(a)))],
        "media_id long, kind string, payload binary")
    p = str(tmp_path / "snap")
    D.save_hamming_snapshot(
        D.hamming_band_keys(M.image_dhash(seen), max_hamming=6,
                            n_blocks=8, key_blocks=3),
        p, max_hamming=6, n_blocks=8, key_blocks=3)

    banded, geom = D.load_hamming_snapshot(spark, p)
    assert geom == {"max_hamming": 6, "n_blocks": 8, "key_blocks": 3}
    noisy = a.copy()
    noisy[::9, ::6] = np.clip(noisy[::9, ::6].astype(int) + 10,
                              0, 255).astype(np.uint8)
    batch = spark.createDataFrame(
        [(10, "image", bytes(M.write_png(noisy)))],
        "media_id long, kind string, payload binary")
    pairs = D.incremental_hamming_pairs(
        M.image_dhash(batch), banded, **geom).collect()
    assert [(r["id_new"], r["id_seen"]) for r in pairs] == [(10, 1)]


def test_hamming_snapshot_layout_prunes_probes(spark, tmp_path):
    """save_hamming_snapshot writes range-partitioned + sorted on
    (band, key) — the layout the stream-static probe depends on: each
    parquet file's footer min/max covers a narrow slice of the key
    space, so a (band, key) equi-probe passes the stats filter for a
    STRICT SUBSET of the files instead of scanning all of them on
    every micro-batch."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    sims = rng.integers(-(2 ** 63), 2 ** 63, size=500, dtype=np.int64)
    fps = spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(sims)], "id long, sim long")
    p = str(tmp_path / "snap")
    # 56 files over C(8,2)=28 bands: ~2 files per band, so per-column
    # footer stats stay narrow (a file never spans more than a band
    # boundary)
    D.save_hamming_snapshot(
        D.hamming_band_keys(fps, max_hamming=6, n_blocks=8),
        p, max_hamming=6, n_blocks=8, n_files=56)

    ranges = []
    for f in sorted(glob.glob(p + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        bi, ki = names.index("band"), names.index("key")
        bmin = min(md.row_group(g).column(bi).statistics.min
                   for g in range(md.num_row_groups))
        bmax = max(md.row_group(g).column(bi).statistics.max
                   for g in range(md.num_row_groups))
        kmin = min(md.row_group(g).column(ki).statistics.min
                   for g in range(md.num_row_groups))
        kmax = max(md.row_group(g).column(ki).statistics.max
                   for g in range(md.num_row_groups))
        ranges.append((bmin, bmax, kmin, kmax))
    assert len(ranges) > 10         # genuinely partitioned, not 1 file
    # range partitioning on (band, key): a file spans at most one band
    # boundary, so its per-column band stats stay narrow
    assert all(bM - bm <= 1 for bm, bM, _, _ in ranges)
    # concrete probes pass the per-column stats filter (the filter
    # parquet pushdown evaluates) for a strict subset of the files —
    # the number the stream-static probe pays per micro-batch
    banded, _ = D.load_hamming_snapshot(spark, p)
    probes = banded.select("band", "key").distinct().limit(5).collect()
    for r in probes:
        b, k = r["band"], r["key"]
        hit = [1 for bm, bM, km, kM in ranges
               if bm <= b <= bM and km <= k <= kM]
        assert 1 <= len(hit) <= max(1, len(ranges) // 8), (b, k, hit)


def test_hamming_represent_mode_keeps_flood_probeable(spark):
    """cap_mode='represent': over-cap buckets shrink to their min-id
    member instead of vanishing, so a snapshot built under a
    duplicate flood still flags a NEW flood copy (the drop snapshot
    silently misses it); under-cap buckets are untouched."""
    import numpy as np

    rng = np.random.default_rng(61)
    s0 = int(rng.integers(-(2 ** 63), 2 ** 63, dtype=np.int64))
    s1 = int(rng.integers(-(2 ** 63), 2 ** 63, dtype=np.int64))
    rows = [(i, s0) for i in range(50)]          # flood: 50 identical
    rows.append((900, s1))                        # healthy loner
    fps = spark.createDataFrame(rows, "id long, sim long")

    rep = D.hamming_band_keys(fps, max_hamming=6, n_blocks=8,
                              max_bucket=10, cap_mode="represent")
    # every flood bucket keeps exactly ONE row (id 0); healthy rows whole
    per_bucket = rep.filter("id < 900").groupBy("band", "key").count()
    assert per_bucket.filter("count > 1").count() == 0
    assert rep.filter("id = 0").count() == 28     # all C(8,2) bands
    assert rep.filter("id = 900").count() == 28

    batch = spark.createDataFrame([(5000, s0)], "id long, sim long")
    got = {(r["id_new"], r["id_seen"], r["hamming"]) for r in
           D.incremental_hamming_pairs(batch, rep, max_hamming=6,
                                       n_blocks=8).collect()}
    assert got == {(5000, 0, 0)}                  # flags the representative

    dropped = D.hamming_band_keys(fps, max_hamming=6, n_blocks=8,
                                  max_bucket=10)
    assert D.incremental_hamming_pairs(batch, dropped, max_hamming=6,
                                       n_blocks=8).count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="cap_mode"):
        D.hamming_band_keys(fps, cap_mode="nope")


def test_minhash_represent_mode_bounds_snapshot_fanout(spark):
    """minhash_band_keys(cap_mode='represent'): a boilerplate flood
    stores ONE row per band in the snapshot (join fan-out for probes
    and the uncapped stream-static flags stays cap-bounded), yet a
    later flood copy still flags against the representative."""
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(40)]
        + [(100, "a unique seed document about alpine botany and "
                 "glacier meltwater chemistry")],
        DOC_SCHEMA)
    rep = D.minhash_band_keys(corpus, max_bucket=10,
                              cap_mode="represent")
    per_bucket = rep.filter("id < 100").groupBy("band", "slice").count()
    assert per_bucket.filter("count > 1").count() == 0
    assert rep.filter("id = 0").count() == 4      # all 4 bands survive
    assert rep.filter("id = 100").count() == 4    # healthy doc whole

    batch = spark.createDataFrame([(500, boiler)], DOC_SCHEMA)
    got = {(r["id_new"], r["id_seen"]) for r in
           D.incremental_neardup_pairs(batch, rep).collect()}
    assert got == {(500, 0)}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="cap_mode"):
        D.minhash_band_keys(corpus, cap_mode="nope")
