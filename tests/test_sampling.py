"""Deterministic sampling + PII scrub unit tests (oracle parity is
covered by test_oracle_parity; these pin the operator invariants)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import sampling as SA
from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T
from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents.select("doc_id", "lang", "source")


def test_hash_sample_bounds(spark, docs):
    n = docs.count()
    assert SA.hash_sample(docs, 0.0, "doc_id").count() == 0
    assert SA.hash_sample(docs, 1.0, "doc_id").count() == n
    mid = SA.hash_sample(docs, 0.5, "doc_id").count()
    assert 0.35 * n < mid < 0.65 * n
    with pytest.raises(ValueError, match="rate"):
        SA.hash_sample(docs, 1.5, "doc_id")


def test_hash_sample_deterministic_and_partition_invariant(spark, docs):
    a = {r["doc_id"] for r in SA.hash_sample(docs, 0.3, "doc_id").collect()}
    b = {r["doc_id"]
         for r in SA.hash_sample(docs.repartition(13), 0.3, "doc_id").collect()}
    assert a == b
    salted = {r["doc_id"]
              for r in SA.hash_sample(docs, 0.3, "doc_id", salt="x").collect()}
    assert salted != a  # independent draw


def test_hash_sample_rates_are_nested(spark, docs):
    """Same salt -> lower rate is a strict subset of a higher rate
    (threshold monotonicity), so refreshing a sample only adds rows."""
    small = {r["doc_id"] for r in SA.hash_sample(docs, 0.2, "doc_id").collect()}
    large = {r["doc_id"] for r in SA.hash_sample(docs, 0.6, "doc_id").collect()}
    assert small <= large


def test_stratified_rates_respected(spark, docs):
    out = SA.stratified_hash_sample(
        docs, "lang", {"en": 1.0, "de": 0.0}, key_col="doc_id",
        default_rate=0.5)
    kept = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in kept}
    totals = {r["lang"]: r["count"]
              for r in docs.groupBy("lang").count().collect()}
    assert by_lang["en"] == totals["en"]       # rate 1.0 keeps all
    assert "de" not in by_lang                 # rate 0.0 drops all
    for lang, n in totals.items():
        if lang not in ("en", "de") and n >= 20:
            assert 0.2 * n < by_lang.get(lang, 0) < 0.8 * n


def test_rebalance_mix_hits_target_proportions(spark, docs):
    shares = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    out = SA.rebalance_mix(docs, "source", shares, key_col="doc_id")
    got = {r["source"]: r["count"]
           for r in out.groupBy("source").count().collect()}
    assert set(got) <= set(shares)  # strata outside the target drop
    total = sum(got.values())
    assert total > 0
    for src, share in shares.items():
        # hash sampling is exact-threshold, not exact-count: allow the
        # binomial wiggle around the target share
        assert abs(got.get(src, 0) / total - share) < 0.15


def test_rebalance_mix_absent_stratum_is_skipped(spark, docs):
    """A target stratum with zero input rows must not zero out t* (and
    thus empty the whole output) — it is dropped from the min, exactly
    as the SQL oracle's ``counts JOIN shares`` drops it."""
    shares = {"src0": 0.5, "src1": 0.4, "no_such_source": 0.1}
    out = SA.rebalance_mix(docs, "source", shares, key_col="doc_id")
    got = {r["source"]: r["count"]
           for r in out.groupBy("source").count().collect()}
    assert got and "no_such_source" not in got
    # present strata keep their relative 0.5 : 0.4 mix
    total = sum(got.values())
    assert abs(got.get("src0", 0) / total - 5 / 9) < 0.15
    # all-absent targets -> empty output, not a crash
    empty = SA.rebalance_mix(docs, "source", {"nope": 1.0}, key_col="doc_id")
    assert empty.count() == 0


def test_rebalance_mix_precomputed_counts_equivalent(spark, docs):
    shares = {"src0": 0.5, "src1": 0.5}
    counts = {r["source"]: r["count"]
              for r in docs.filter(F.col("source").isin("src0", "src1"))
              .groupBy("source").count().collect()}
    a = {r["doc_id"]
         for r in SA.rebalance_mix(docs, "source", shares,
                                   key_col="doc_id").collect()}
    b = {r["doc_id"]
         for r in SA.rebalance_mix(docs, "source", shares, key_col="doc_id",
                                   counts=counts).collect()}
    assert a == b


def test_pii_scrub_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io call 555-123-4567 or 555.123.4567 "
             "host 192.168.0.1 ssn 123-45-6789 done")],
        ["id", "text"])
    cols = T.pii_scrub(F.col("text"))
    row = df.select(cols["text_scrubbed"].alias("t"),
                    cols["pii_count"].alias("n")).collect()[0]
    assert row["n"] == 5
    assert row["t"] == ("mail <EMAIL> call <PHONE> or <PHONE> "
                        "host <IPV4> ssn <SSN> done")


def test_pii_scrub_no_double_count(spark):
    """An email's digits must not be re-counted by later patterns, and
    clean text passes through untouched with count 0."""
    df = spark.createDataFrame(
        [(1, "reach 123-45-6789@corp.example.net today"),
         (2, "no pii here at all")], ["id", "text"])
    cols = T.pii_scrub(F.col("text"))
    rows = {r["id"]: r for r in
            df.select("id", cols["text_scrubbed"].alias("t"),
                      cols["pii_count"].alias("n")).collect()}
    assert rows[1]["n"] == 1 and rows[1]["t"] == "reach <EMAIL> today"
    assert rows[2]["n"] == 0 and rows[2]["t"] == "no pii here at all"


def test_bucket_matches_driver_side_md5(spark):
    """The Spark-side bucket (conv(substr(md5)) % mod) equals the plain
    md5 arithmetic the property tests and oracles use — pins the
    cross-engine hash contract."""
    import hashlib

    df = spark.createDataFrame([(k,) for k in (0, 1, 42, 99991)], ["k"])
    got = {r["k"]: r["b"] for r in df.select(
        "k", (SA._bucket(F.col("k"), "s", SA.DEFAULT_MOD)).alias("b")
    ).collect()}
    for k in (0, 1, 42, 99991):
        h = hashlib.md5(f"{k}s".encode()).hexdigest()[:8]
        assert got[k] == int(h, 16) % SA.DEFAULT_MOD


def test_pii_scrub_null_text_propagates(spark):
    """Null text stays null (scrubbed and count) in both engines —
    null-propagation is the cross-engine contract, not a silent 0."""
    df = spark.createDataFrame([(1, None), (2, "x")], "id long, text string")
    cols = T.pii_scrub(F.col("text"))
    rows = {r["id"]: r for r in
            df.select("id", cols["text_scrubbed"].alias("t"),
                      cols["pii_count"].alias("n")).collect()}
    assert rows[1]["t"] is None and rows[1]["n"] is None
    assert rows[2]["t"] == "x" and rows[2]["n"] == 0


def test_text_stats_ops_on_empty_frame(spark):
    """tfidf / vocab_oov / unigram_logprob return empty (not error) on
    an empty corpus."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        tfidf_top_terms, unigram_logprob, vocab_oov)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert tfidf_top_terms(empty).count() == 0
    assert vocab_oov(empty).count() == 0
    assert unigram_logprob(empty).count() == 0


def test_select_token_budget_value_cut(spark):
    from dynamic_etl_pipeline_thesis_ii_spark.operators import sampling as SA

    rows = [  # (id, group, score, tokens)
        (1, "en", 0.9, 50), (2, "en", 0.8, 40), (3, "en", 0.7, 30),
        (4, "en", 0.6, 100),
        (10, "de", 0.9, 60), (11, "de", 0.9, 60), (12, "de", 0.5, 10),
    ]
    df = spark.createDataFrame(rows, "id int, g string, q double, t long")

    def kept(budget, group="g"):
        return {r["id"] for r in
                SA.select_token_budget(df, budget, score_col="q",
                                       tokens_col="t",
                                       group_col=group).collect()}

    # en: cumulative 50/90/120/220 -> budget 120 keeps top 3;
    # de: the 0.9 tie clump is one value (120 tokens) -> kept whole,
    #     then 0.5 would reach 130 > 120 -> dropped
    assert kept(120) == {1, 2, 3, 10, 11}
    assert kept(130) == {1, 2, 3, 10, 11, 12}
    # budget 100: en keeps 50+40; de tie clump of 120 exceeds -> whole
    # clump dropped (value-based cut never splits ties)
    assert kept(100) == {1, 2}
    assert kept(0) == set()
    # global budget (no groups): strictly best-first across the corpus
    assert kept(170, group=None) == {1, 10, 11}  # 0.9-clump = 170 tokens


# ---------------------------------------------------------------------------
# train/valid/test split assignment
# ---------------------------------------------------------------------------

def test_split_assign_partitions_every_row_once(spark, docs):
    out = SA.split_assign(docs, {"train": 0.9, "valid": 0.05,
                                 "test": 0.05}, key_col="doc_id")
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert sum(counts.values()) == n           # total partition
    assert counts.get("train", 0) > counts.get("valid", 0)
    assert counts.get("train", 0) > 0.8 * n    # ~90% within hash noise


def test_split_assign_weights_normalize(spark, docs):
    a = SA.split_assign(docs, {"train": 0.9, "test": 0.1}, "doc_id")
    b = SA.split_assign(docs, {"train": 9.0, "test": 1.0}, "doc_id")
    assert ({(r["doc_id"], r["split"]) for r in a.collect()}
            == {(r["doc_id"], r["split"]) for r in b.collect()})


def test_split_assign_stable_under_subset_and_salted(spark, docs):
    """A row's split depends only on (key, salt): filtering the corpus
    never moves surviving rows between splits (append/re-run safety),
    while a different salt draws an independent partition."""
    full = {r["doc_id"]: r["split"] for r in
            SA.split_assign(docs, {"train": 0.8, "test": 0.2},
                            "doc_id").collect()}
    sub = {r["doc_id"]: r["split"] for r in
           SA.split_assign(docs.filter(F.col("doc_id") % 3 == 0),
                           {"train": 0.8, "test": 0.2},
                           "doc_id").collect()}
    assert all(full[k] == v for k, v in sub.items())
    other = {r["doc_id"]: r["split"] for r in
             SA.split_assign(docs, {"train": 0.8, "test": 0.2},
                             "doc_id", salt="epoch2").collect()}
    assert any(full[k] != other[k] for k in full)


def test_split_assign_single_and_invalid(spark, docs):
    only = SA.split_assign(docs.limit(5), {"train": 1.0}, "doc_id")
    assert {r["split"] for r in only.collect()} == {"train"}
    with pytest.raises(ValueError, match="weights"):
        SA.split_assign(docs, {"a": 0.0, "b": 0.0}, "doc_id")
    with pytest.raises(ValueError, match="weights"):
        SA.split_assign(docs, {"a": -1.0, "b": 2.0}, "doc_id")


def test_temperature_mix_endpoints_and_flattening(spark, docs):
    """alpha=1 keeps the natural mix untouched (rate 1 everywhere);
    alpha=0 targets uniform — every stratum lands within hash noise
    of the smallest stratum's count; alpha=0.5 sits between: the
    smallest stratum keeps everything, larger strata keep a
    monotonically SHRINKING fraction as alpha drops."""
    base = Catalog(spark, "/root/testdata/sf0.01").documents \
        .select("doc_id", "lang")
    counts = {r["lang"]: r["n"] for r in
              base.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_min = min(counts.values())
    biggest = max(counts, key=counts.get)

    full = SA.temperature_mix(base, "lang", alpha=1.0, key_col="doc_id")
    assert full.count() == sum(counts.values())

    uni = {r["lang"]: r["n"] for r in
           SA.temperature_mix(base, "lang", alpha=0.0, key_col="doc_id")
           .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for g, n in uni.items():
        assert abs(n - n_min * 1.0) <= max(6, 0.35 * n_min), (g, n, n_min)

    kept = {}
    for alpha in (0.0, 0.5, 1.0):
        out = SA.temperature_mix(base, "lang", alpha=alpha,
                                 key_col="doc_id")
        kept[alpha] = out.filter(F.col("lang") == biggest).count()
        # the smallest stratum always keeps everything (rate 1)
        smallest = min(counts, key=counts.get)
        assert out.filter(F.col("lang") == smallest).count() \
            == counts[smallest]
    assert kept[0.0] <= kept[0.5] <= kept[1.0]
    assert kept[1.0] == counts[biggest]

    with pytest.raises(ValueError, match="alpha"):
        SA.temperature_mix(base, "lang", alpha=1.5, key_col="doc_id")


def test_temperature_mix_alpha_nesting(spark):
    """Lower alpha keeps a SUBSET of what higher alpha keeps (for a
    fixed salt): per-stratum rates are monotone in alpha and the hash
    thresholds are nested, so tightening the temperature never swaps
    rows — it only removes them. This is the property that makes
    alpha a safe tuning knob on a live pipeline (re-runs at a new
    alpha reuse every surviving row's downstream artifacts)."""
    base = Catalog(spark, "/root/testdata/sf0.01").documents \
        .select("doc_id", "lang")
    kept = {a: {r["doc_id"] for r in SA.temperature_mix(
        base, "lang", alpha=a, key_col="doc_id").collect()}
        for a in (0.0, 0.25, 0.5, 0.75, 1.0)}
    alphas = sorted(kept)
    for lo, hi in zip(alphas, alphas[1:]):
        assert kept[lo] <= kept[hi], (lo, hi)


def test_temperature_mix_null_strata_and_determinism(spark):
    rows = [(1, "en"), (2, "en"), (3, "en"), (4, "fr"), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = SA.temperature_mix(df, "lang", alpha=0.5, key_col="doc_id")
    got = sorted(r["doc_id"] for r in out.collect())
    assert 5 not in got                    # null stratum drops
    assert 4 in got                        # smallest stratum kept whole
    assert got == sorted(r["doc_id"] for r in SA.temperature_mix(
        df, "lang", alpha=0.5, key_col="doc_id").collect())


# ---------------------------------------------------------------------------
# DSIR importance resampling (SM7)
# ---------------------------------------------------------------------------

def _dsir_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_identical_target_gives_zero_weights(spark):
    """target == raw -> every bucket's log-ratio cancels exactly, so
    every document weighs exactly 0 (integer zero, not epsilon)."""
    df = _dsir_frame(spark, [(1, "alpha beta gamma"),
                             (2, "delta epsilon zeta eta")])
    tbl = SA.dsir_logratio_table(df, df)
    w = {r["id"]: r["weight_micro"]
         for r in SA.dsir_weights(df, tbl).collect()}
    assert w == {1: 0, 2: 0}


def test_dsir_separates_target_and_raw_vocabulary(spark):
    """Docs made of target-exclusive vocabulary must weigh positive,
    raw-exclusive ones negative, and the verdict must be stable under
    repartitioning (weights are exact integer sums)."""
    target_rows = [(i, "science physics theorem proof lemma")
                   for i in range(5)]
    noise_rows = [(100 + i, "spam casino winner click here now")
                  for i in range(5)]
    raw = _dsir_frame(spark, target_rows + noise_rows)
    target = _dsir_frame(spark, target_rows)
    tbl = SA.dsir_logratio_table(raw, target)
    w = {r["id"]: r["weight_micro"]
         for r in SA.dsir_weights(raw, tbl).collect()}
    assert all(w[i] > 0 for i in range(5))
    assert all(w[100 + i] < 0 for i in range(5))
    w2 = {r["id"]: r["weight_micro"]
          for r in SA.dsir_weights(raw.repartition(7), tbl).collect()}
    assert w2 == w


def test_dsir_gram_counts_and_empty_docs(spark):
    """n_grams = unigrams + bigrams = 2*len - 1 for len >= 1; empty /
    NULL texts produce no row (no grams to score)."""
    df = _dsir_frame(spark, [(1, "a b c"), (2, "solo"), (3, ""),
                             (4, None)])
    tbl = SA.dsir_logratio_table(df, df)
    out = {r["id"]: r["n_grams"]
           for r in SA.dsir_weights(df, tbl).collect()}
    assert out == {1: 5, 2: 1}


def test_dsir_shared_grams_parity(spark):
    """The shared-grams convention (ONE persisted dsir_gram_buckets
    explode feeding both the flag-path fit and the scoring pass) must
    produce bit-identical tables and weights to the per-call explodes
    — it is a plan-sharing face, never a semantic one."""
    rows = ([(i, "science physics theorem proof") for i in range(4)]
            + [(100 + i, "spam casino winner click") for i in range(4)])
    raw = _dsir_frame(spark, rows).withColumn(
        "__t", F.col("doc_id") < 50)
    tbl0 = SA.dsir_logratio_table(raw, target_flag="__t")
    w0 = {r["id"]: (r["n_grams"], r["weight_micro"])
          for r in SA.dsir_weights(raw, tbl0).collect()}
    grams = SA.dsir_gram_buckets(raw, carry=("__t",)).persist()
    try:
        tbl1 = SA.dsir_logratio_table(raw, target_flag="__t",
                                      grams=grams)
        assert sorted(map(tuple, tbl0.collect())) \
            == sorted(map(tuple, tbl1.collect()))
        w1 = {r["id"]: (r["n_grams"], r["weight_micro"])
              for r in SA.dsir_weights(raw, tbl1, grams=grams).collect()}
        assert w1 == w0
    finally:
        grams.unpersist()


def test_dsir_flag_path_equals_two_frame_path(spark):
    """The one-scan target_flag convention must produce the IDENTICAL
    log-ratio table (hence weights) as the two-DataFrame convention
    when the target is a subset of the pool."""
    rows = [(i, f"tok{i % 7} common words here number {i % 3}")
            for i in range(40)]
    raw = _dsir_frame(spark, rows)
    two = SA.dsir_logratio_table(raw, raw.filter("doc_id % 4 = 0"))
    one = SA.dsir_logratio_table(
        raw.selectExpr("doc_id", "text", "doc_id % 4 = 0 AS is_t"),
        target_flag="is_t")
    t2 = {r["bucket"]: r["logratio_micro"] for r in two.collect()}
    t1 = {r["bucket"]: r["logratio_micro"] for r in one.collect()}
    assert t1 == t2
    with pytest.raises(ValueError, match="exactly one"):
        SA.dsir_logratio_table(raw)
    with pytest.raises(ValueError, match="exactly one"):
        SA.dsir_logratio_table(raw, raw, target_flag="is_t")


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (SM8)
# ---------------------------------------------------------------------------

def _wdf(spark, weights):
    return spark.createDataFrame(
        [(i, None if w is None else float(w))
         for i, w in enumerate(weights)], "id long, w double")


def test_weighted_topk_basic_contract(spark):
    df = _wdf(spark, [1.0, 2.0, 3.0, None, 0.0, -1.0])
    out = SA.weighted_hash_topk(df, "w", k=10, key_col="id")
    # null/zero/negative weights can never win; k >= n returns the rest
    assert {r["id"] for r in out.collect()} == {0, 1, 2}
    assert SA.weighted_hash_topk(df, "w", 2, "id").count() == 2
    with pytest.raises(ValueError, match="k must be"):
        SA.weighted_hash_topk(df, "w", 0, "id")


def test_weighted_topk_deterministic_and_partition_invariant(spark):
    df = _wdf(spark, [float(1 + (i * 7) % 5) for i in range(100)])
    a = {r["id"] for r in SA.weighted_hash_topk(df, "w", 10, "id").collect()}
    b = {r["id"] for r in SA.weighted_hash_topk(
        df.repartition(13), "w", 10, "id").collect()}
    assert a == b and len(a) == 10
    c = {r["id"] for r in SA.weighted_hash_topk(
        df, "w", 10, "id", salt="other").collect()}
    assert c != a  # independent draw


def test_weighted_topk_inclusion_follows_weights(spark):
    """Across independent salts, the 10x-heavier item must be included
    in a k=1 draw far more often — and roughly in weight proportion
    (E-S with k=1 reduces to P(i) = w_i / sum w)."""
    df = _wdf(spark, [10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
    wins = 0
    trials = 120
    for t in range(trials):
        row = SA.weighted_hash_topk(df, "w", 1, "id",
                                    salt=f"s{t}").collect()[0]
        wins += row["id"] == 0
    # expectation 10/19 ~ 0.53; binomial sd ~ 0.046 -> generous band
    assert 0.35 < wins / trials < 0.72


def test_weighted_topk_grouped(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), 1.0 + i % 4) for i in range(60)],
        "id long, g string, w double")
    out = SA.weighted_hash_topk(df, "w", 5, "id", group_col="g")
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}


def test_leakage_safe_split_components_never_straddle(spark):
    """Every member of a near-dup component gets the SAME split; docs
    in no pair are singleton components keyed by their own id (so they
    assign exactly like plain split_assign); assignments are
    deterministic and salt-indexed."""
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(200)],
                                 "doc_id long, text string")
    # two multi-doc clusters + a chain, rest singletons
    pairs = spark.createDataFrame(
        [(1, 7), (7, 13), (2, 8), (50, 51), (51, 52), (52, 53)],
        "id_a long, id_b long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = SA.leakage_safe_split(docs, w, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 200                       # no row inflation
    for cluster in ({1, 7, 13}, {2, 8}, {50, 51, 52, 53}):
        comps = {by_id[i]["component"] for i in cluster}
        splits = {by_id[i]["split"] for i in cluster}
        assert comps == {min(cluster)} and len(splits) == 1
    # singletons: component == own id, assignment == plain split_assign
    plain = {r["doc_id"]: r["split"] for r in SA.split_assign(
        docs, w, key_col="doc_id").collect()}
    for i in set(range(200)) - {1, 7, 13, 2, 8, 50, 51, 52, 53}:
        assert by_id[i]["component"] == i
        assert by_id[i]["split"] == plain[i]
    # deterministic re-run; independent draw under another salt
    again = {r["doc_id"]: r["split"] for r in
             SA.leakage_safe_split(docs, w, pairs).collect()}
    assert again == {i: r["split"] for i, r in by_id.items()}
    other = {r["doc_id"]: r["split"] for r in
             SA.leakage_safe_split(docs, w, pairs, salt="s2").collect()}
    assert other != again


# ---------------------------------------------------------------------------
# UniMax epoch-capped language allocation (SM10)
# ---------------------------------------------------------------------------

def _naive_unimax(toks: dict, budget: int, max_epochs: int) -> dict:
    """Line-faithful smallest-first sequential allocation from the
    UniMax paper (Chung et al. 2023, Algorithm 1): walk languages in
    ascending epoch-capped size, grant min(cap, remaining/langs_left)."""
    order = sorted(toks.items(), key=lambda kv: (kv[1] * max_epochs,
                                                 str(kv[0])))
    rem, out = float(budget), {}
    for i, (g, n) in enumerate(order):
        alloc = min(float(n * max_epochs), rem / (len(order) - i))
        out[g] = alloc / n
        rem -= alloc
    return out


def test_unimax_closed_form_matches_sequential(spark):
    """The windowed waterfill closed form == the paper's sequential
    loop, across saturation regimes (tiny budget / mixed / everything
    saturated) and adversarial size patterns (ties, dominant head,
    singletons)."""
    cases = [
        ({"a": 10, "b": 10, "c": 10}, 5, 2),         # nothing saturates
        ({"a": 10, "b": 10, "c": 10}, 60, 2),        # all saturate
        ({"a": 5, "b": 50, "c": 500}, 200, 2),       # mixed
        ({"a": 5, "b": 5, "c": 500, "d": 499}, 600, 3),  # tie + near-tie
        ({"a": 1}, 7, 4),                            # single language
        ({"a": 3, "b": 7, "c": 1000000}, 1000, 1),   # dominant head
    ]
    for toks, budget, epochs in cases:
        rows = [(f"{g}{i}", g, "w " * n) for g, n in toks.items()
                for i, n in [(0, n)]]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        got = {r["lang"]: r["epochs"]
               for r in SA.unimax_allocation(df, budget, epochs,
                                             token_counts=toks).collect()}
        want = {g: round(e, 6) for g, e in
                _naive_unimax(toks, budget, epochs).items()}
        assert got == pytest.approx(want, abs=1e-6), (toks, budget, epochs)
        # the allocation exhausts min(budget, total capped supply)
        # (checked on the UNROUNDED sequential allocation — the
        # operator's 6-dp display rounding would drift the sum)
        raw = _naive_unimax(toks, budget, epochs)
        total = sum(raw[g] * n for g, n in toks.items())
        assert total == pytest.approx(
            min(budget, sum(n * epochs for n in toks.values())), rel=1e-9)


def test_unimax_fixture_invariants(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    out = SA.unimax_allocation(docs, 50_000, 2)
    rows = out.collect()
    assert rows and len(rows) == docs.filter(F.col("lang").isNotNull()).count()
    for r in rows:
        assert 0.0 <= r["epochs"] <= 2.0
        assert r["n_copies"] in (int(r["epochs"]), int(r["epochs"]) + 1)
    # per-language: epochs constant within a language; the fractional
    # draw keeps ~frac of docs at floor+1
    import collections
    by_lang = collections.defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, rs in by_lang.items():
        assert len({r["epochs"] for r in rs}) == 1
        frac = rs[0]["epochs"] - int(rs[0]["epochs"])
        extra = sum(1 for r in rs if r["n_copies"] == int(r["epochs"]) + 1)
        if frac == 0.0:
            assert extra == 0
        elif len(rs) >= 50:
            assert abs(extra / len(rs) - frac) < 0.2
    # ample budget -> every language pinned at the epoch cap
    full = SA.unimax_allocation(docs, 10**12, 3)
    assert {r["epochs"] for r in full.collect()} == {3.0}
    assert {r["n_copies"] for r in full.collect()} == {3}


def test_unimax_determinism_and_validation(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    a = sorted((r["doc_id"], r["n_copies"])
               for r in SA.unimax_allocation(docs, 50_000, 2).collect())
    b = sorted((r["doc_id"], r["n_copies"])
               for r in SA.unimax_allocation(
                   docs.repartition(13), 50_000, 2).collect())
    assert a == b  # partition-invariant
    with pytest.raises(ValueError, match="budget"):
        SA.unimax_allocation(docs, -1, 2)
    with pytest.raises(ValueError, match="max_epochs"):
        SA.unimax_allocation(docs, 100, 0)
    with pytest.raises(ValueError, match="max_epochs"):
        SA.unimax_allocation(docs, 100, 2.5)
    # all-null strata -> empty frame with the contract schema
    empty = SA.unimax_allocation(
        spark.createDataFrame([("x", None, "t")],
                              "doc_id string, lang string, text string"),
        100, 2)
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "lang", "epochs", "n_copies"]


# ---------------------------------------------------------------------------
# deterministic global training order (SM11)
# ---------------------------------------------------------------------------

def test_shuffle_order_is_a_permutation(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents.select("doc_id")
    n = docs.count()
    out = SA.shuffle_order(docs, epoch=0).collect()
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(n))               # 0-based, gap-free
    # epochs are independent permutations of the same id set
    e1 = {r["doc_id"]: r["rank"]
          for r in SA.shuffle_order(docs, epoch=1).collect()}
    e0 = {r["doc_id"]: r["rank"] for r in out}
    assert set(e0) == set(e1)
    assert any(e0[k] != e1[k] for k in e0)
    # salts draw independent orders too
    s2 = {r["doc_id"]: r["rank"]
          for r in SA.shuffle_order(docs, salt="other").collect()}
    assert any(e0[k] != s2[k] for k in e0)


def test_shuffle_order_two_phase_equals_global_window(spark):
    """The offsets + intra-bucket assembly == one global row_number
    over (h, key) — pinned directly on a frame small enough for the
    single-window formulation."""
    from pyspark.sql import Window

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"]: r["rank"]
           for r in SA.shuffle_order(df, n_buckets=7).collect()}
    h = SA._bucket(F.col("doc_id"), "shufflee0", SA.DEFAULT_MOD)
    w = Window.orderBy(h.asc(), F.col("doc_id").asc())
    want = {r["doc_id"]: r["rank"]
            for r in df.select("doc_id",
                               (F.row_number().over(w) - 1)
                               .alias("rank")).collect()}
    assert got == want


def test_shuffle_order_partition_invariance_and_validation(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents.select("doc_id")
    a = sorted((r["doc_id"], r["rank"])
               for r in SA.shuffle_order(docs).collect())
    b = sorted((r["doc_id"], r["rank"])
               for r in SA.shuffle_order(docs.repartition(13)).collect())
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError, match="n_buckets"):
        SA.shuffle_order(docs, n_buckets=0)
    with _pt.raises(ValueError, match="epoch"):
        SA.shuffle_order(docs, epoch=-1)
