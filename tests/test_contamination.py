"""Benchmark decontamination: n-gram overlap detection between a corpus
and a held-out benchmark set (the GPT-3-style 13-gram check, here with
configurable k). Pairs must be exact and deterministic; the benchmark
side must broadcast (a 100 TB corpus never shuffles for this check)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dynamic_etl_pipeline_thesis_ii_spark.operators import dedup as D

DOC_SCHEMA = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])


@pytest.fixture()
def corpora(spark):
    bench = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "pack my box with five dozen liquor jugs right now"),
    ], DOC_SCHEMA)
    corpus = spark.createDataFrame([
        # contains bench-1's opening 5-grams verbatim
        (10, "prefix words the quick brown fox jumps over the lazy dog tonight suffix"),
        # clean doc, no 5-gram overlap
        (11, "completely unrelated sentence about distributed query engines"),
        # contains a bench-2 span
        (12, "pack my box with five dozen liquor jugs right now thanks"),
    ], DOC_SCHEMA)
    return corpus, bench


def test_contamination_pairs_exact(spark, corpora):
    corpus, bench = corpora
    pairs = {(r["id_a"], r["id_b"]): r["overlap"]
             for r in D.contamination_pairs(corpus, bench, k=5,
                                            min_overlap=1).collect()}
    assert set(pairs) == {(10, 1), (12, 2)}
    # bench-1 has 6 distinct 5-grams, all present in doc 10
    assert pairs[(10, 1)] == 6
    # bench-2 has 6 distinct 5-grams, all present in doc 12
    assert pairs[(12, 2)] == 6


def test_contamination_min_overlap_floor(spark, corpora):
    corpus, bench = corpora
    out = D.contamination_pairs(corpus, bench, k=5, min_overlap=7)
    assert out.count() == 0


def test_decontaminate_removes_flagged(spark, corpora):
    corpus, bench = corpora
    kept = {r["doc_id"]
            for r in D.decontaminate(corpus, bench, k=5).collect()}
    assert kept == {11}


def test_bench_stop_shingle_cap(spark):
    # a shingle present in >max_bench_df benchmark docs is boilerplate
    # and must not generate pairs
    bench = spark.createDataFrame(
        [(i, "shared legal disclaimer boilerplate text here") for i in range(5)],
        DOC_SCHEMA)
    corpus = spark.createDataFrame(
        [(100, "shared legal disclaimer boilerplate text here too")], DOC_SCHEMA)
    assert D.contamination_pairs(corpus, bench, k=5,
                                 max_bench_df=4).count() == 0
    assert D.contamination_pairs(corpus, bench, k=5,
                                 max_bench_df=5).count() == 5


def test_benchmark_side_broadcasts(spark, corpora):
    corpus, bench = corpora
    plan = D.contamination_pairs(corpus, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# document normalization (strip_html / fold_unicode / normalize_doc)
# ---------------------------------------------------------------------------

def _norm_one(spark, s):
    from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T
    from pyspark.sql import functions as F
    return spark.createDataFrame([(s,)], "t string") \
        .select(T.normalize_doc(F.col("t")).alias("n")).first()["n"]


def test_normalize_doc_strips_markup(spark):
    got = _norm_one(spark, '<p class="x">Hello &amp; “world”</p>'
                           '<script>var a = "<b>";</script> bye…')
    assert got == 'Hello & "world" bye.'


def test_normalize_doc_style_block_and_entities(spark):
    got = _norm_one(spark, '<style>p { color: red; }</style>'
                           'a &lt;tag&gt; stays&nbsp;text – ok')
    # decoded entities must NOT become live tags (decode after strip)
    assert got == "a <tag> stays text - ok"


def test_normalize_doc_idempotent_on_clean_text(spark):
    clean = "plain text with no markup - already clean."
    assert _norm_one(spark, clean) == clean


def test_normalize_doc_collapses_whitespace(spark):
    assert _norm_one(spark, "  a\t\tb\n\nc  ") == "a b c"


def test_script_ratios_multiscript(spark):
    from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T
    from pyspark.sql import functions as F
    rows = [("latin only text",), ("Привет мир",), ("日本語のテキスト",),
            ("مرحبا بالعالم",), ("",)]
    df = spark.createDataFrame(rows, "t string")
    r = T.script_ratios(F.col("t"))
    out = df.select("t", *[v.alias(k) for k, v in r.items()]).collect()
    by = {row["t"]: row for row in out}
    assert by["latin only text"]["latin_ratio"] > 0.8
    assert by["Привет мир"]["cyrillic_ratio"] > 0.8
    assert by["日本語のテキスト"]["cjk_ratio"] > 0.9
    assert by["مرحبا بالعالم"]["arabic_ratio"] > 0.8
    empty = by[""]
    assert all(empty[k] == 0.0 for k in
               ("latin_ratio", "cyrillic_ratio", "cjk_ratio", "arabic_ratio"))


def test_gopher_rules_flags(spark):
    """Each Gopher rule trips on its designed failure mode and the
    gate is the conjunction."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T
    from pyspark.sql import functions as F

    good = ("the quick brown fox jumps over the lazy dog and runs away "
            "to have fun with friends near that old barn every morning "
            "before anyone wakes and the day begins with light falling "
            "over quiet fields where nothing much ever seems to happen "
            "but small things keep moving along just fine somehow too")
    short = "the dog and that cat have fun with toys"          # <50 words
    hashy = "the " + "# " * 40 + ("and that to have with be of word " * 8)
    bullets = "\n".join("- item one of the list that we have" for _ in range(10))
    numeric = ("the 111 222 333 444 555 666 777 888 999 000 " * 9
               + "and that have with be of")
    rows = [(1, good), (2, short), (3, hashy), (4, bullets), (5, numeric)]
    df = spark.createDataFrame(rows, "doc_id int, t string")
    r = T.gopher_rules(F.col("t"))
    out = {row["doc_id"]: row for row in
           df.select("doc_id", *[v.alias(k) for k, v in r.items()]).collect()}

    assert out[1]["gopher_pass"] is True
    assert out[2]["g_word_count"] is False and out[2]["gopher_pass"] is False
    assert out[3]["g_symbol_ratio"] is False
    assert out[4]["g_bullet_lines"] is False
    assert out[5]["g_alpha_words"] is False


def test_lm_quality_buckets_value_based_cuts(spark):
    """Buckets cut at cumulative doc fractions per group; docs sharing
    a score share a bucket."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T

    rows = ([(i, "en", -2.0 - i) for i in range(9)]         # distinct scores
            + [(100, "de", -1.0), (101, "de", -1.0), (102, "de", -5.0)])
    df = spark.createDataFrame(rows, "id int, lang string, mean_logprob double")
    out = {r["id"]: r["lm_bucket"] for r in
           T.lm_quality_buckets(df, group_col="lang").collect()}
    # en: 9 docs, thirds by rank (higher score = better = head)
    assert [out[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)
    # de: the tied pair covers 2/3 of docs -> both 'middle'; last 'tail'
    assert out[100] == out[101] == "middle" and out[102] == "tail"


def test_dup_line_fractions(spark):
    from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T

    rows = [(1, "alpha\nbeta\ngamma"),              # no dup lines
            (2, "nav bar\nbody text here\nnav bar"),  # 1 of 3 repeats
            (3, "x\nx\nx\nx")]                      # 3 of 4 repeat
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in T.repetition_features(df).collect()}
    assert out[1]["dup_line_fraction"] == 0.0
    assert abs(out[2]["dup_line_fraction"] - 1 / 3) < 1e-6
    # doc 2: 7 of 28 line-chars are the repeated 'nav bar'
    assert abs(out[2]["dup_line_char_fraction"] - 7 / 28) < 1e-6
    assert out[3]["dup_line_fraction"] == 0.75
    assert out[3]["dup_line_char_fraction"] == 0.75


def test_lm_buckets_monotone_and_exhaustive(spark):
    """Invariant sweep on a seeded random score table: buckets
    partition every group, and scores are strictly ordered ACROSS
    buckets (ties always share a bucket by construction)."""
    import random

    from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T

    rng = random.Random(7)
    rows = [(i, rng.choice(["en", "de", "fr"]),
             round(rng.uniform(-8.0, -2.0), 2))   # 2dp -> plenty of ties
            for i in range(600)]
    df = spark.createDataFrame(rows, "id int, lang string, mean_logprob double")
    out = T.lm_quality_buckets(df, group_col="lang").collect()
    assert len(out) == 600
    by = {}
    for r in out:
        by.setdefault((r["lang"], r["lm_bucket"]), []).append(r["mean_logprob"])
    for lang in ("en", "de", "fr"):
        head = by.get((lang, "head"), [])
        mid = by.get((lang, "middle"), [])
        tail = by.get((lang, "tail"), [])
        assert head and mid and tail
        assert min(head) > max(mid) and min(mid) > max(tail)
