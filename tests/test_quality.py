"""Trained quality classifier: weak-label bootstrap, separation on
held-out docs, null handling and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import quality as Q

_CLEAN = ("the quick brown fox jumps over the lazy dog and then runs "
          "through the quiet field while the sun sets slowly over the "
          "hills and the birds return to their nests for the evening "
          "because the day is finally done and everyone can rest now "
          "meanwhile the river keeps flowing past the old stone bridge "
          "where children played during the long warm summer afternoons")
_SALAD = "xq zzv kplm qrw 0x1f 0x2e ### ... ... ... ktj wvv 9913 zzqp"


def _corpus(spark, n=40, offset=0):
    rows = []
    for i in range(n):
        rows.append((offset + 2 * i, f"{_CLEAN} extra topic {i}"))
        rows.append((offset + 2 * i + 1, f"{_SALAD} {i} " * 3))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_weak_labels_and_classifier_separation(spark):
    train = Q.weak_labels_from_gopher(_corpus(spark, n=40))
    # the gopher bootstrap labels clean prose 1.0, salad 0.0
    labels = {r["doc_id"] % 2: r["label"] for r in train.collect()}
    assert labels == {0: 1.0, 1: 0.0}

    model = Q.train_quality_classifier(train, n_features=1 << 12)
    held_out = _corpus(spark, n=10, offset=10_000)
    scored = {r["id"]: r["quality_prob"]
              for r in Q.score_quality(held_out, model).collect()}
    clean = [v for k, v in scored.items() if k % 2 == 0]
    salad = [v for k, v in scored.items() if k % 2 == 1]
    assert min(clean) > max(salad)     # full separation on held-out
    assert all(0.0 <= v <= 1.0 for v in scored.values())


def test_score_quality_null_and_empty_text(spark):
    train = Q.weak_labels_from_gopher(_corpus(spark, n=20))
    model = Q.train_quality_classifier(train, n_features=1 << 12)
    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id long, text string")
    got = Q.score_quality(df, model).collect()
    assert len(got) == 2               # nulls score, never crash
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in got)


def _graded(spark, n, offset=0, seed=7, words_per=100):
    """Docs at a RANDOM clean/salad word mix — unlike the bimodal
    _corpus, the decision boundary runs through the middle of this
    set, so ranking quality (AUC) is informative, not trivially 1."""
    import random
    rng = random.Random(seed + offset)
    cw, sw = _CLEAN.split(), _SALAD.split()
    rows = []
    for i in range(n):
        r = rng.random()
        words = [rng.choice(cw) if rng.random() < r else rng.choice(sw)
                 for _ in range(words_per)]
        rows.append((offset + i, " ".join(words)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _auc(pairs):
    import bisect
    pos = sorted(p for p, lab in pairs if lab == 1.0)
    neg = sorted(p for p, lab in pairs if lab == 0.0)
    wins = ties = 0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo
        ties += hi - lo
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_quality_auc_floor_on_graded_heldout(spark):
    """Held-out AUC floor vs the gopher weak labels on a GRADED mix:
    a silent feature regression (tokenizer pattern, ngram wiring,
    hashing width) degrades ranking quality long before it breaks
    shape or the bimodal separation test — this pins the quality bar,
    not just the plumbing."""
    train = Q.weak_labels_from_gopher(_graded(spark, n=600))
    # guard: the graded construction must produce BOTH classes, or the
    # assertion below is vacuous
    classes = {r["label"] for r in train.select("label").distinct().collect()}
    assert classes == {0.0, 1.0}, classes
    model = Q.train_quality_classifier(train, n_features=1 << 14,
                                       max_iter=40)

    held = _graded(spark, n=100, offset=10_000)
    labels = {r["doc_id"]: r["label"]
              for r in Q.weak_labels_from_gopher(held).collect()}
    assert {0.0, 1.0} == set(labels.values())
    scored = Q.score_quality(held, model).collect()
    auc = _auc([(r["quality_prob"], labels[r["id"]]) for r in scored])
    assert auc >= 0.9, f"held-out AUC {auc:.3f} below floor"


def test_weak_labels_null_text_trains(spark):
    """A null-text doc must get label 0.0 (not NULL, which crashes
    LogisticRegression.fit) and training must succeed."""
    base = _corpus(spark, n=20)
    nulls = spark.createDataFrame([(9_999, None)],
                                  "doc_id long, text string")
    train = Q.weak_labels_from_gopher(base.unionByName(nulls))
    assert train.filter("doc_id = 9999").first()["label"] == 0.0
    model = Q.train_quality_classifier(train, n_features=1 << 12)
    assert Q.score_quality(base.limit(2), model).count() == 2


def test_code_features_discriminate_code_from_prose(spark):
    """code_features: a real code snippet scores far above plain
    prose; each signal moves in the documented direction; null-ish
    and empty docs don't crash (0 scores)."""
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        code_features,
    )
    code = ("def hamming(a, b):\n"
            "    return bin(a ^ b).count('1')\n"
            "class Index:\n"
            "    def __init__(self, k=4):\n"
            "        self.k = int(k);\n")
    prose = ("The quiet harbor town woke slowly, fishermen hauling "
             "their nets while gulls wheeled overhead and the morning "
             "light spread across the water.")
    df = spark.createDataFrame(
        [(1, code), (2, prose), (3, "")], ["doc_id", "text"])
    feats = code_features(F.col("text"))
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in feats.items()]).collect()}
    assert rows[1]["code_score"] > 0.5 > rows[2]["code_score"]
    assert rows[1]["symbol_density"] > rows[2]["symbol_density"]
    assert rows[1]["indent_ratio"] > rows[2]["indent_ratio"]
    assert rows[1]["code_kw_hits"] >= 3 and rows[2]["code_kw_hits"] == 0
    assert rows[3]["code_score"] == 0.0


def test_nl_classifier_lifecycle(spark, sf_dir, tmp_path):
    """'train a quality classifier ... and save it' then 'score the
    corpus with the classifier at /path': Spark-ML-native round
    trip, scores in [0,1] for every doc, rejections actionable."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import (
        Catalog,
    )

    assert parse_dataops_query(
        "train a quality classifier on the corpus and save it") \
        == {"target": "classifier_train"}
    p = parse_dataops_query("score the corpus with the classifier at /m")
    assert p == {"target": "classifier_score", "model_path": "/m"}

    # the sf fixture corpus is all-gopher-fail (degenerate labels):
    # the train target must REJECT it with an actionable reason
    pipe0 = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    r0 = pipe0.run_dataops(
        "train a quality classifier on the corpus and save it",
        sf_dir, str(tmp_path / "never"))
    assert r0["status"] == "rejected" and "degenerate" in r0["reason"]

    # mixed-label corpus: natural prose passes gopher, junk fails
    good = ("the quick brown fox jumps over the lazy dog and then "
            "it runs to the river where many animals drink water "
            "in the morning because they are thirsty. ") * 8
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, good + f"extra sentence number {i} closes it out.")
         for i in range(30)]
        + [(100 + i, f"x@@ ## $$$ {i} !!") for i in range(30)],
        "doc_id bigint, text string").write.parquet(
        src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, src))
    model_dir = str(tmp_path / "model")
    res = pipe.run_dataops(
        "train a quality classifier on the corpus and save it",
        src, model_dir)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert 0.0 < rep["positive_rate"] < 1.0
    assert rep["train_accuracy"] >= 0.9     # separable by design
    out = str(tmp_path / "scores")
    res2 = pipe.run_dataops(
        f"score the corpus with the classifier at {model_dir}",
        src, out)
    assert res2["status"] == "complete"
    back = spark.read.parquet(out)
    n = 60
    assert back.count() == n == res2["reports"]["rows"]
    from pyspark.sql import functions as F
    bad = back.filter((F.col("quality_prob") < 0)
                      | (F.col("quality_prob") > 1)).count()
    assert bad == 0
    # rejections
    r1 = pipe.run_dataops("score the corpus with the classifier",
                          src, str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "model path" in r1["reason"]
    r2 = pipe.run_dataops(
        f"score the corpus with the classifier at {tmp_path}/nope",
        src, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" and "no classifier" in r2["reason"]
