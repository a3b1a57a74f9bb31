"""MinHash LSH parameter advisor (``dedup.minhash_band_plan``) and
band-table geometry inference (``dedup.band_table_geometry``): the
threshold knob users think in, turned into banding geometry — and
probes that reuse a tuned snapshot's geometry without a sidecar."""

from __future__ import annotations

import pytest

from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
    band_table_geometry,
    minhash_band_plan,
    minhash_band_keys,
)


def _p(s, b, r):
    return 1.0 - (1.0 - s ** r) ** b


def test_band_plan_curve_and_threshold():
    plan = minhash_band_plan(0.8, max_hashes=64)
    b, r = plan["bands"], plan["rows_per_band"]
    assert plan["n_hashes"] == b * r <= 64
    # the inflection estimate tracks the requested threshold
    assert abs(plan["est_threshold"] - 0.8) < 0.15
    # curve values are exactly the S-curve formula
    for s, want in plan["curve"].items():
        assert want == round(_p(s, b, r), 4)
    # the curve does what a threshold curve must: low collision well
    # below the threshold, high collision well above
    assert plan["curve"][0.5] < 0.1
    assert plan["curve"][0.9] > 0.8


def test_band_plan_threshold_monotonicity():
    """A higher threshold needs a sharper, later S-curve — more rows
    per band (or at least not fewer)."""
    lo = minhash_band_plan(0.5, max_hashes=32)
    hi = minhash_band_plan(0.9, max_hashes=32)
    assert hi["rows_per_band"] >= lo["rows_per_band"]
    assert hi["est_threshold"] > lo["est_threshold"]


def test_band_plan_budget_and_weights():
    """A bigger signature budget never increases total error; an
    fn-heavy weighting shifts the curve earlier (recall-protective:
    lower est_threshold)."""
    small = minhash_band_plan(0.7, max_hashes=16)
    big = minhash_band_plan(0.7, max_hashes=128)
    assert (big["fp_area"] + big["fn_area"]
            <= small["fp_area"] + small["fn_area"] + 1e-9)
    fp_heavy = minhash_band_plan(0.7, max_hashes=32, fp_weight=5.0)
    fn_heavy = minhash_band_plan(0.7, max_hashes=32, fn_weight=5.0)
    assert fn_heavy["est_threshold"] <= fp_heavy["est_threshold"]


def test_band_plan_rejections():
    with pytest.raises(ValueError, match="threshold"):
        minhash_band_plan(0.0)
    with pytest.raises(ValueError, match="threshold"):
        minhash_band_plan(1.0)
    with pytest.raises(ValueError, match="max_hashes"):
        minhash_band_plan(0.5, max_hashes=1)


def test_band_table_geometry_inference(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "eta theta iota kappa lambda mu")],
        ["doc_id", "text"])
    tuned = minhash_band_keys(docs, n_hashes=24, bands=8)
    assert band_table_geometry(tuned) == (8, 24)
    default = minhash_band_keys(docs)
    assert band_table_geometry(default) == (4, 16)
    empty = default.filter("band < 0")
    assert band_table_geometry(empty) == (4, 16)   # defaults


def test_tuned_snapshot_lifecycle(spark, sf_dir, tmp_path):
    """'build a near-dup band snapshot of the corpus at similarity
    0.9' -> advisor geometry in the store; the probe infers it from
    the snapshot's rows and still flags a near-copy; the epoch-grow
    append stays homogeneous with the tuned geometry."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )
    from pyspark.sql import functions as F

    p = parse_dataops_query(
        "build a near-dup band snapshot of the corpus at "
        "similarity 0.9")
    assert p == {"target": "band_snapshot", "threshold": 0.9}
    assert parse_dataops_query(
        "build a near-dup band snapshot of the corpus")["threshold"] \
        is None

    corpus_src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "a unique seed document about alpine botany and "
             "glacier meltwater chemistry"),
         (2, "submarine cable repair logistics in the north "
             "atlantic")],
        ["doc_id", "text"]).write.parquet(
        corpus_src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    snap = str(tmp_path / "snap")
    res = pipe.run_dataops(
        "build a near-dup band snapshot of the corpus at "
        "similarity 0.9", corpus_src, snap)
    assert res["status"] == "complete"
    bp = res["reports"]["band_plan"]
    assert bp["threshold"] == 0.9
    stored = spark.read.parquet(snap)
    assert band_table_geometry(stored) == (bp["bands"],
                                           bp["n_hashes"])
    assert res["reports"]["band_rows"] == 2 * bp["bands"]

    # probe with NO explicit geometry: inferred from the snapshot.
    # The batch doc is an EXACT copy (J=1): the tuned 0.9 curve
    # rightly gives a ~0.9-Jaccard copy only partial collision odds,
    # while J=1 collides in every band deterministically.
    batch_src = str(tmp_path / "batch")
    spark.createDataFrame(
        [(10, "a unique seed document about alpine botany and "
              "glacier meltwater chemistry")],
        ["doc_id", "text"]).write.parquet(
        batch_src + "/documents.parquet")
    res2 = pipe.run_dataops(
        f"flag near-duplicate documents against the band snapshot "
        f"at {snap} and update the snapshot",
        batch_src, str(tmp_path / "flags"))
    assert res2["status"] == "complete"
    got = {(r["id_new"], r["id_seen"]) for r in
           spark.read.parquet(str(tmp_path / "flags")).collect()}
    assert got == {(10, 1)}
    # the near-dup was flagged, so nothing fresh appends — but the
    # grown store must stay geometry-homogeneous either way
    grown = spark.read.parquet(snap)
    assert band_table_geometry(grown) == (bp["bands"], bp["n_hashes"])
    assert grown.select(F.size("slice")).distinct().count() == 1
