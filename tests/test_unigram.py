"""Unigram-LM tokenizer (TK3): Viterbi-EM training, segmentation
semantics, determinism under repartitioning, and the encode-ids
contract shared with BPE."""

from __future__ import annotations

from dynamic_etl_pipeline_thesis_ii_spark.operators.unigram import (
    _viterbi,
    apply_unigram,
    train_unigram,
    unigram_vocab,
)

CORPUS = [
    "spark streaming spark batch sparkly streaming",
    "the streaming pipeline sparked a streaming spark job",
    "batch spark batch spark streaming streamer",
    "sparking streams stream the batch sparks",
] * 4


def _docs(spark, texts=None):
    texts = CORPUS if texts is None else texts
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


def test_training_learns_frequent_substrings(spark):
    pieces = train_unigram(_docs(spark), vocab_size=48)
    table = dict(pieces)
    assert len(pieces) <= 48
    # every character survives (words always encodable)
    assert {"s", "p", "a", "r", "k"} <= set(table)
    # the dominant substrings earn whole pieces
    assert any(p in table for p in ("spark", "stream"))
    # probabilities are a (sub-)distribution in log space
    assert all(lp < 0 for _, lp in pieces)


def test_segmentation_round_trip_and_compression(spark):
    docs = _docs(spark)
    pieces = train_unigram(docs, vocab_size=48)
    got = {r["id"]: (r["tokens"], r["n_tokens"])
           for r in apply_unigram(docs, pieces).collect()}
    rows = {i: t for i, t in enumerate(CORPUS)}
    import re
    for i, (toks, n) in got.items():
        words = [w for w in re.split(r"[^a-z0-9']+", rows[i].lower())
                 if w]
        # concatenation of the pieces reconstructs the words exactly
        assert "".join(toks) == "".join(words)
        assert n == len(toks)
        # learned pieces compress well below character count
        assert n < sum(len(w) for w in words) * 0.6


def test_determinism_under_partitioning(spark):
    docs = _docs(spark)
    p1 = train_unigram(docs, vocab_size=40)
    p2 = train_unigram(docs.repartition(7), vocab_size=40)
    assert p1 == p2
    seg1 = {r["id"]: r["tokens"]
            for r in apply_unigram(docs, p1).collect()}
    seg2 = {r["id"]: r["tokens"]
            for r in apply_unigram(docs.repartition(5), p2).collect()}
    assert seg1 == seg2


def test_encode_ids_contract(spark):
    docs = _docs(spark)
    pieces = train_unigram(docs, vocab_size=40)
    vocab = unigram_vocab(pieces)
    assert vocab["<unk>"] == 0
    assert len(vocab) == len(pieces) + 1
    ids = {r["id"]: r["input_ids"]
           for r in apply_unigram(docs, pieces, ids=True).collect()}
    toks = {r["id"]: r["tokens"]
            for r in apply_unigram(docs, pieces).collect()}
    inv = {v: k for k, v in vocab.items()}
    for i, seq in ids.items():
        assert all(0 <= t < len(vocab) for t in seq)
        assert [inv[t] for t in seq] == toks[i]   # ids <-> pieces
    # out-of-alphabet chars -> unk id, never a crash
    weird = _docs(spark, ["spark éé batch"])
    out = apply_unigram(weird, pieces, ids=True).collect()[0]
    assert out["n_tokens"] > 0


def test_degenerate_inputs(spark):
    empty = _docs(spark, []).filter("doc_id < 0")
    assert train_unigram(empty, vocab_size=16) == []
    docs = _docs(spark, ["", None, "a"])
    pieces = train_unigram(docs, vocab_size=16)
    got = {r["id"]: r["n_tokens"]
           for r in apply_unigram(docs, pieces).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_viterbi_tie_and_unknowns():
    logp = {"ab": -1.0, "a": -1.0, "b": -1.0, "c": -1.0}
    # "ab" as one piece (-1) beats a+b (-2)
    assert _viterbi("ab", logp)[0] == ["ab"]
    # unknown char segments at the penalty, never raises
    segs, score = _viterbi("axb", logp)
    assert segs == ["a", "x", "b"] and score < -20


def test_nl_tokenize_pack_unigram_arm(spark, sf_dir, tmp_path):
    """'tokenize the corpus with a unigram model and pack N-token
    sequences' swaps the trainer behind the tokenize_pack target:
    routing, completed run, and trainer-ready packed output."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "tokenize the corpus with a unigram model, 128 merges, "
        "and pack 64-token sequences")
    assert p["target"] == "tokenize_pack" and p["model"] == "unigram"
    assert p["n_merges"] == 128 and p["seq_len"] == 64
    assert parse_dataops_query(
        "tokenize the corpus, sentencepiece style")["model"] == "unigram"
    assert parse_dataops_query(
        "tokenize the corpus and pack 512-token sequences")["model"] \
        == "bpe"

    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    out = str(tmp_path / "packed")
    res = pipe.run_dataops(
        "tokenize the corpus with a unigram model, 96 merges, "
        "and pack 64-token sequences", sf_dir, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["vocab_size"] <= 97 and rep["vocab_size"] > 30
    assert rep["n_sequences"] > 0
    back = spark.read.parquet(out)
    import pyspark.sql.functions as F
    assert back.select(F.size("input_ids")).distinct().collect() \
        [0][0] == 64
    hi = back.select(F.max(F.array_max("input_ids"))).first()[0]
    assert hi < rep["vocab_size"] + 1          # ids inside vocab (+eos)
