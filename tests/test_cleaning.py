"""Cleaning engine behavior tests (parity with reference
transform/tests/test_data_cleaning.py cases: relationship validations,
imputation strategies, column deletion, edge cases)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.cleaning import (
    clean_dataframe,
    match_column_rule,
    DEFAULT_CONFIG,
)

TS = datetime.datetime(2024, 1, 2)


def _bars(spark, rows):
    cols = ["ticker", "ts", "open", "high", "low", "close", "volume", "vwap"]
    return spark.createDataFrame([dict(zip(cols, r)) for r in rows],
                                 "ticker string, ts timestamp, open double, high double,"
                                 " low double, close double, volume double, vwap double")


def test_rule_specificity():
    assert match_column_rule("ticker", DEFAULT_CONFIG)["pattern"] == "^ticker$"
    assert match_column_rule("close", DEFAULT_CONFIG)["validations"] == ["positive"]
    assert match_column_rule("anything_else", DEFAULT_CONFIG)["pattern"] == ".*"
    assert match_column_rule("balance_sheet_totalAssets", DEFAULT_CONFIG)["dtype"] == "auto"


def test_high_low_violation_drops_row(spark):
    df = _bars(spark, [
        ("A", TS, 10.0, 12.0, 9.0, 11.0, 100.0, 10.5),   # valid
        ("A", TS, 10.0, 9.5, 9.0, 11.0, 100.0, 9.2),     # high < close → drop
    ])
    out, _ = clean_dataframe(df)
    assert out.count() == 1


def test_vwap_out_of_range_set_null(spark):
    df = _bars(spark, [
        ("A", TS, 10.0, 12.0, 9.0, 11.0, 100.0, 20.0),   # vwap > high → null
        ("A", TS, 10.0, 12.0, 9.0, 11.0, 100.0, 10.0),   # in range → kept
    ])
    out, _ = clean_dataframe(df)
    vals = [r["vwap"] for r in out.orderBy("vwap").collect()]
    assert vals == [None, 10.0] or vals == [10.0, None]


def test_positive_validation_drops_negative_close(spark):
    df = _bars(spark, [
        ("A", TS, 10.0, 12.0, 9.0, -1.0, 100.0, 10.0),
        ("A", TS, 10.0, 12.0, 9.0, 11.0, 100.0, 10.0),
    ])
    out, _ = clean_dataframe(df)
    assert out.count() == 1


def test_future_date_dropped(spark):
    df = _bars(spark, [
        ("A", datetime.datetime(2124, 1, 1), 10.0, 12.0, 9.0, 11.0, 100.0, 10.0),
        ("A", TS, 10.0, 12.0, 9.0, 11.0, 100.0, 10.0),
    ])
    out, _ = clean_dataframe(df)
    assert out.count() == 1


def test_all_null_column_deleted(spark):
    df = spark.createDataFrame(
        [("A", TS, 1.0, None), ("A", TS, 2.0, None)],
        "ticker string, ts timestamp, close double, extra double")
    out, report = clean_dataframe(df)
    assert "extra" not in out.columns
    assert [d["column"] for d in report["clean"]["null_handling"]["columns_deleted"]] == ["extra"]


def test_deletion_disabled_keeps_column(spark):
    df = spark.createDataFrame(
        [("A", TS), (None, TS)], "ticker string, ts timestamp")
    out, _ = clean_dataframe(df, global_threshold_override=0.1)
    # ticker rule forbids deletion → constant-imputed instead
    assert "ticker" in out.columns
    assert {r["ticker"] for r in out.collect()} == {"A", "UNKNOWN"}


def test_normal_imputation_fills_all_nulls(spark):
    rows = [("A", TS, float(i), None if i % 3 == 0 else float(100 + i)) for i in range(30)]
    df = spark.createDataFrame(rows, "ticker string, ts timestamp, close double, vwap double")
    config = {**DEFAULT_CONFIG, "relationship_validations": []}
    out, report = clean_dataframe(df, config, seed=7)
    got = out.select("vwap").collect()
    assert all(r["vwap"] is not None for r in got)
    assert report["clean"]["null_handling"]["columns_imputed"]["vwap"]["method"] == "normal_distribution"
    # imputed values should sit near the observed mean (~115)
    imputed = [r["vwap"] for r in got if not (100 <= r["vwap"] <= 130)]
    assert len(imputed) < 10


def test_zero_std_imputes_mean(spark):
    df = spark.createDataFrame(
        [("A", TS, 5.0), ("A", TS, 5.0), ("A", TS, None)],
        "ticker string, ts timestamp, vwap double")
    config = {**DEFAULT_CONFIG, "relationship_validations": []}
    out, _ = clean_dataframe(df, config)
    assert sorted(r["vwap"] for r in out.collect()) == [5.0, 5.0, 5.0]


def test_epoch_imputation_for_timestamp(spark):
    df = spark.createDataFrame(
        [("A", TS, 1.0), ("A", None, 2.0)],
        "ticker string, ts timestamp, close double")
    out, _ = clean_dataframe(df)
    got = sorted(r["ts"] for r in out.collect())
    assert got[0] == datetime.datetime(1970, 1, 1)


def test_int_rule_rounds_to_long(spark):
    df = spark.createDataFrame(
        [("A", TS, 10.6), ("A", TS, 10.2)],
        "ticker string, ts timestamp, volume double")
    out, _ = clean_dataframe(df)
    assert dict(out.dtypes)["volume"] == "bigint"
    assert sorted(r["volume"] for r in out.collect()) == [10, 11]


def test_empty_dataframe(spark):
    df = spark.createDataFrame([], "ticker string, ts timestamp, close double")
    out, _ = clean_dataframe(df)
    assert out.count() == 0


def test_string_coercion_of_mixed(spark):
    df = spark.createDataFrame([("A", TS, "12.5"), ("A", TS, "bad")],
                               "ticker string, ts timestamp, close string")
    out, _ = clean_dataframe(df)
    # float rule coerces; 'bad' → null → normal-imputed from single value 12.5
    vals = sorted(r["close"] for r in out.collect())
    assert vals[0] == 12.5 and len(vals) == 2


def test_imputed_columns_draw_independent_noise(spark):
    """Per-column seeds: two columns imputed on the same rows must not
    receive identical z-draws (perfectly correlated fills)."""
    import datetime
    rows = [("A", TS + datetime.timedelta(seconds=i),
             None if i % 2 == 0 else 10.0 + (i % 7),
             None if i % 2 == 0 else 20.0 + 3.0 * (i % 5))
            for i in range(40)]
    df = spark.createDataFrame(rows, "ticker string, ts timestamp, a double, b double")
    config = {
        "version": 1,
        "global_settings": {"default_null_threshold": 0.9,
                            "default_allow_column_deletion": False,
                            "default_imputation_strategy": "auto",
                            "remove_duplicates": False},
        "column_rules": [
            {"pattern": "^[ab]$", "dtype": "float",
             "imputation_strategy": "normal_distribution"},
            {"pattern": ".*", "dtype": "auto", "imputation_strategy": "none"},
        ],
        "relationship_validations": [],
    }
    out, _ = clean_dataframe(df, config, seed=42)
    import statistics
    obs_a = [10.0 + (i % 7) for i in range(40) if i % 2 == 1]
    obs_b = [20.0 + 3.0 * (i % 5) for i in range(40) if i % 2 == 1]
    ma, sa = statistics.mean(obs_a), statistics.stdev(obs_a)
    mb, sb = statistics.mean(obs_b), statistics.stdev(obs_b)
    imputed_ts = {TS + datetime.timedelta(seconds=i) for i in range(40) if i % 2 == 0}
    zs = [(((r["a"] - ma) / sa), ((r["b"] - mb) / sb))
          for r in out.collect() if r["ts"] in imputed_ts]
    assert len(zs) == 20
    # with a shared seed every pair would be elementwise identical
    assert any(abs(za - zb) > 1e-9 for za, zb in zs)


def test_deterministic_imputation_partition_invariant(spark):
    """impute_key_col mode: the imputed value is a pure function of the
    row key — identical across repartitionings and runs, decorrelated
    across columns, and approximately N(mean, std)."""
    n = 400
    rows = [(i, None if i % 4 == 0 else 50.0 + (i % 11),
             None if i % 4 == 0 else 9.0 + 0.5 * (i % 13))
            for i in range(n)]
    df = spark.createDataFrame(rows, "k long, a double, b double")
    config = {
        "version": 1,
        "global_settings": {"default_null_threshold": 0.9,
                            "default_allow_column_deletion": False,
                            "default_imputation_strategy": "auto",
                            "remove_duplicates": False},
        "column_rules": [
            {"pattern": "^[ab]$", "dtype": "float",
             "imputation_strategy": "normal_distribution"},
            {"pattern": ".*", "dtype": "auto", "imputation_strategy": "none"},
        ],
        "relationship_validations": [],
    }
    out1, _ = clean_dataframe(df, config, seed=42, impute_key_col="k")
    out2, _ = clean_dataframe(df.repartition(17), config, seed=42,
                              impute_key_col="k")
    got1 = {r["k"]: (r["a"], r["b"]) for r in out1.collect()}
    got2 = {r["k"]: (r["a"], r["b"]) for r in out2.collect()}
    assert got1 == got2  # exact, not approximate
    # different seed -> different draws
    out3, _ = clean_dataframe(df, config, seed=7, impute_key_col="k")
    got3 = {r["k"]: (r["a"], r["b"]) for r in out3.collect()}
    assert got1 != got3
    # columns decorrelated + distribution sane
    import statistics
    obs_a = [50.0 + (i % 11) for i in range(n) if i % 4 != 0]
    ma, sa = statistics.mean(obs_a), statistics.stdev(obs_a)
    imp_a = [got1[i][0] for i in range(n) if i % 4 == 0]
    za = [(v - ma) / sa for v in imp_a]
    assert abs(statistics.mean(za)) < 0.35          # ~N(0,1) mean
    assert 0.6 < statistics.stdev(za) < 1.4         # ~N(0,1) spread
    obs_b = [9.0 + 0.5 * (i % 13) for i in range(n) if i % 4 != 0]
    mb, sb = statistics.mean(obs_b), statistics.stdev(obs_b)
    zb = [(got1[i][1] - mb) / sb for i in range(n) if i % 4 == 0]
    assert any(abs(x - y) > 1e-9 for x, y in zip(za, zb))


def test_remove_boilerplate_lines_semantics(spark):
    """Corpus-level line dedup: a line repeated beyond the cap drops
    from EVERY carrier, short/blank lines are structure (never
    boilerplate), order is preserved, all-boilerplate docs survive
    with empty text, null text behaves as empty."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        remove_boilerplate_lines,
    )
    footer = "subscribe to the newsletter"
    docs = spark.createDataFrame(
        [(1, f"unique alpha\n\n{footer}\nunique beta"),
         (2, f"{footer}\nunique gamma"),
         (3, f"other text\n{footer}"),
         (4, footer),              # all-boilerplate doc
         (5, None)],
        "doc_id long, text string")
    out = {r["id"]: r for r in
           remove_boilerplate_lines(docs, max_line_df=2).collect()}
    assert out[1]["text_out"] == "unique alpha\n\nunique beta"  # blank kept
    assert out[1]["n_removed"] == 1
    assert out[2]["text_out"] == "unique gamma"
    assert out[3]["text_out"] == "other text"
    assert out[4]["text_out"] == "" and out[4]["n_removed"] == 1
    assert out[5]["text_out"] == "" and out[5]["n_removed"] == 0
    # below the cap nothing is removed
    loose = {r["id"]: r["n_removed"] for r in
             remove_boilerplate_lines(docs, max_line_df=10).collect()}
    assert all(v == 0 for v in loose.values())


def test_bigram_logprob_separates_prose_from_salad(spark):
    """Repeated transitions score higher than shuffled ones: documents
    built from one repeating phrase must beat word-salad documents
    drawing from the same vocabulary; docs with < 2 tokens emit no
    row."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        bigram_logprob,
    )
    phrase = "the quick brown fox jumps over the lazy dog"
    words = phrase.split()
    salad = " ".join(words[::-1] + words[1::2] + words[0::3])
    docs = spark.createDataFrame(
        [(1, " ".join([phrase] * 4)),
         (2, " ".join([phrase] * 4)),
         (3, salad),
         (4, "single"), (5, "")],
        "doc_id long, text string")
    out = {r["id"]: r for r in bigram_logprob(docs).collect()}
    assert set(out) == {1, 2, 3}          # 4 and 5 have no bigrams
    assert out[1]["mean_bigram_logprob"] == out[2]["mean_bigram_logprob"]
    assert out[1]["mean_bigram_logprob"] > out[3]["mean_bigram_logprob"]
    assert out[1]["n_bigrams"] == 4 * len(words) - 1


def test_remove_repeated_spans_semantics(spark):
    """Token-level exact-substring dedup: a k-gram shared beyond the
    cap drops every covered token in every carrier, unique text
    survives, short docs (< k tokens) pass through, boundary tokens
    around the span are kept."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        remove_repeated_spans,
    )
    phrase = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(1, f"start {phrase} end"),
         (2, f"{phrase} trailing words here"),
         (3, f"leading words {phrase}"),
         (4, "a wholly unrelated document body"),
         (5, "tiny doc")],
        "doc_id long, text string")
    out = {r["id"]: r for r in
           remove_repeated_spans(docs, k=5, max_span_df=2).collect()}
    assert out[1]["text_out"] == "start end" and out[1]["n_removed"] == 5
    assert out[2]["text_out"] == "trailing words here"
    assert out[3]["text_out"] == "leading words"
    assert out[4]["n_removed"] == 0
    assert out[5]["text_out"] == "tiny doc"     # < k tokens: untouched
    # a cap above the span frequency removes nothing
    loose = {r["id"]: r["n_removed"] for r in
             remove_repeated_spans(docs, k=5, max_span_df=5).collect()}
    assert all(v == 0 for v in loose.values())
