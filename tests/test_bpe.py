"""BPE trainer/apply: differential against a naive from-scratch
reference implementation, classic-corpus sanity, apply parity and
distributed-apply plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import bpe as B


# -- naive reference: recount all pairs from scratch every iteration ----

def ref_train(wc: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    seqs = {w: [*w, B.END] for w in wc}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, seq in seqs.items():
            for pair in zip(seq, seq[1:]):
                counts[pair] = counts.get(pair, 0) + wc[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, seq in seqs.items():
            out, k = [], 0
            while k < len(seq):
                if k + 1 < len(seq) and (seq[k], seq[k + 1]) == best:
                    out.append(seq[k] + seq[k + 1])
                    k += 2
                else:
                    out.append(seq[k])
                    k += 1
            seqs[w] = out
    return merges


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sequential application of the merge list in training order."""
    seq = [*word, B.END]
    for a, b in merges:
        out, k = [], 0
        while k < len(seq):
            if k + 1 < len(seq) and seq[k] == a and seq[k + 1] == b:
                out.append(a + b)
                k += 2
            else:
                out.append(seq[k])
                k += 1
        seq = out
    return seq


def test_merge_loop_matches_naive_reference():
    """The incremental-recount trainer == the from-scratch reference
    over seeded random word tables (ties included)."""
    import random
    rng = random.Random(17)
    for trial in range(25):
        n_words = rng.randint(2, 30)
        wc = {}
        for _ in range(n_words):
            w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
            wc[w] = rng.randint(1, 9)
        n = rng.randint(1, 40)
        got = B._merge_loop(sorted(wc.items()), n)
        want = ref_train(wc, n)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_merge_loop_tie_heavy_differential():
    """Tie-DENSE tables: tiny alphabets and near-uniform counts make
    every round carry several max-count pairs, so any drift in the
    incremental pair recount or the (-count, pair) tie-break surfaces
    as a divergent merge list vs the from-scratch reference. (The
    seeded test above hits ties occasionally; this one hits them
    every round — the risky path under the capped word table.)"""
    import random
    rng = random.Random(91)
    for trial in range(50):
        alpha = "ab" if trial % 2 else "abc"
        wc = {}
        for _ in range(rng.randint(2, 40)):
            w = "".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 6)))
            wc[w] = 1 if trial % 3 else rng.randint(1, 2)
        n = rng.randint(1, 60)
        got = B._merge_loop(sorted(wc.items()), n)
        want = ref_train(wc, n)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_encode_word_matches_sequential_reference():
    """Greedy-by-rank encode == sequential merge application (the
    rank-consistency property of BPE merge tables)."""
    import random
    rng = random.Random(23)
    for trial in range(25):
        wc = {}
        for _ in range(rng.randint(3, 25)):
            w = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
            wc[w] = rng.randint(1, 9)
        merges = ref_train(wc, rng.randint(1, 30))
        ranks = {m: i for i, m in enumerate(merges)}
        cache: dict = {}
        for _ in range(30):
            w = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 9)))
            assert B.encode_word(w, ranks, cache) == ref_encode(w, merges)


def test_train_bpe_classic_corpus(spark):
    """Sennrich's canonical example: 'es' (from newest/widest class)
    style high-frequency pairs surface first; training is
    deterministic across runs."""
    rows = [(0, "low low low low low"),
            (1, "lower lower"),
            (2, "newest newest newest newest newest newest"),
            (3, "widest widest widest")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = B.train_bpe(df, n_merges=10)
    assert merges == B.train_bpe(df, n_merges=10)   # deterministic
    assert merges[:2] == [("e", "s"), ("es", "t")]  # 9 est occurrences
    assert ("est", B.END) in merges[:3]


def test_apply_bpe_distributed(spark):
    rows = [(0, "low lower"), (1, "newest"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = B.train_bpe(
        spark.createDataFrame([(0, "low low lower newest newest")],
                              ["doc_id", "text"]), n_merges=8)
    out = {r["id"]: (r["tokens"], r["n_tokens"])
           for r in B.apply_bpe(df, merges).collect()}
    ranks = {m: i for i, m in enumerate(merges)}
    want0 = B.encode_word("low", ranks) + B.encode_word("lower", ranks)
    assert out[0] == (want0, len(want0))
    assert out[1][0] == B.encode_word("newest", ranks)
    assert out[2] == ([], 0) and out[3] == ([], 0)
    # tokens reassemble the normalized words exactly
    joined = "".join(out[0][0]).replace(B.END, " ").strip()
    assert joined == "low lower"


def test_word_counts_normalization(spark):
    df = spark.createDataFrame([(0, "The the, THE! cat's 9lives")],
                               ["doc_id", "text"])
    got = {r["word"]: r["count"]
           for r in B.word_counts(df).collect()}
    assert got == {"the": 3, "cat's": 1, "9lives": 1}


def test_apply_bpe_count_only_matches_full(spark):
    """with_tokens=False yields identical n_tokens without shipping
    the token arrays (the counting consumers' fast path)."""
    rows = [(0, "low lower newest"), (1, None), (2, "widest low")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = B.train_bpe(df, n_merges=6)
    full = {r["id"]: r["n_tokens"]
            for r in B.apply_bpe(df, merges).collect()}
    slim_df = B.apply_bpe(df, merges, with_tokens=False)
    assert slim_df.columns == ["id", "n_tokens"]
    slim = {r["id"]: r["n_tokens"] for r in slim_df.collect()}
    assert slim == full


def test_bpe_vocab_and_encode_ids_round_trip(spark):
    """bpe_vocab is deterministic (base alphabet + merges in rank
    order, duplicate joins keep the first id) and encode_ids maps
    apply_bpe's subwords through it exactly — decode(ids) == tokens."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators import bpe as BP

    docs = spark.createDataFrame(
        [(i, "the theme thesis " * 3 + f"tail{i}") for i in range(20)],
        "doc_id long, text string")
    merges = BP.train_bpe(docs, n_merges=30)
    vocab = BP.bpe_vocab(merges)
    assert vocab["<unk>"] == 0
    assert vocab == BP.bpe_vocab(merges)          # deterministic
    assert len(set(vocab.values())) == len(vocab)  # ids unique
    inv = {v: k for k, v in vocab.items()}

    toks = {r["id"]: r["tokens"]
            for r in BP.apply_bpe(docs, merges).collect()}
    ids = {r["id"]: (r["input_ids"], r["n_tokens"])
           for r in BP.encode_ids(docs, merges).collect()}
    assert set(toks) == set(ids)
    for d, tokens in toks.items():
        seq, n = ids[d]
        assert n == len(tokens) == len(seq)
        assert [inv[i] for i in seq] == tokens     # exact round trip
        assert 0 not in seq                        # nothing fell to unk


def test_tokenizer_store_roundtrip_and_nl_lifecycle(spark, sf_dir,
                                                    tmp_path):
    """save/load round-trips both tokenizers bit-identically, and the
    NL train->reuse chain encodes exactly like the in-run trainer;
    unreadable/wrong stores reject."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.bpe import (
        encode_ids,
        load_bpe,
        save_bpe,
        train_bpe,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.operators.unigram import (
        load_unigram,
        save_unigram,
        train_unigram,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import (
        Catalog,
    )

    docs = Catalog(spark, sf_dir).documents
    merges = train_bpe(docs, n_merges=60)
    store = str(tmp_path / "tok")
    rep = save_bpe(spark, merges, store)
    assert rep == {"model": "bpe", "n_merges": len(merges)}
    assert load_bpe(spark, store) == merges
    pieces = train_unigram(docs, vocab_size=80)
    ustore = str(tmp_path / "utok")
    save_unigram(spark, pieces, ustore)
    assert load_unigram(spark, ustore) == \
        [(p, float(lp)) for p, lp in pieces]

    # NL: train-and-save, then tokenize-with-the-artifact
    assert parse_dataops_query(
        "train a bpe tokenizer on the corpus, 60 merges, and save "
        "it") == {"target": "tokenizer_train", "n_merges": 60,
                  "model": "bpe"}
    assert parse_dataops_query(
        "train a unigram tokenizer, vocab 80")["model"] == "unigram"
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    nlstore = str(tmp_path / "nltok")
    res = pipe.run_dataops(
        "train a bpe tokenizer on the corpus, 60 merges, and save it",
        sf_dir, nlstore)
    assert res["status"] == "complete"
    assert res["reports"]["n_merges"] == len(merges)
    assert load_bpe(spark, nlstore) == merges   # same corpus, same table

    p = parse_dataops_query(
        f"tokenize the corpus with the tokenizer at {nlstore} and "
        f"pack 32-token sequences, 4 shards")
    assert p["tokenizer_path"] == nlstore and p["seq_len"] == 32
    out = str(tmp_path / "packed")
    res2 = pipe.run_dataops(
        f"tokenize the corpus with the tokenizer at {nlstore} and "
        f"pack 32-token sequences, 4 shards", sf_dir, out)
    assert res2["status"] == "complete"
    # reuse == retrain: identical packed sequences
    out2 = str(tmp_path / "packed_fresh")
    res3 = pipe.run_dataops(
        "tokenize the corpus and pack 32-token sequences, 60 merges, "
        "4 shards", sf_dir, out2)
    assert res3["status"] == "complete"
    key = lambda r: (r["bucket"], r["seq_idx"], tuple(r["input_ids"]))
    assert sorted(map(key, spark.read.parquet(out).collect())) == \
        sorted(map(key, spark.read.parquet(out2).collect()))
    # rejections: unreadable store; non-tokenizer parquet
    r1 = pipe.run_dataops(
        f"tokenize the corpus with the tokenizer at {tmp_path}/nope "
        f"and pack 32-token sequences", sf_dir, str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "no tokenizer" in r1["reason"]
    docs.limit(1).write.parquet(str(tmp_path / "nottok"))
    r2 = pipe.run_dataops(
        f"tokenize the corpus with the tokenizer at {tmp_path}/nottok "
        f"and pack 32-token sequences", sf_dir, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" \
        and "not a tokenizer store" in r2["reason"]


def test_tokenizer_stats_math_and_strata(spark):
    """fertility = tokens/words with the kernels' own word splitter;
    per-lang strata; zero-word strata report null, not a crash."""
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_thesis_ii_spark.operators.bpe import (
        apply_bpe,
        tokenizer_stats,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox", "en"),
         (2, "the the the quick", "en"),
         (3, "unwords 12345 mix'd", "xx"),
         (4, "!!! ???", "zz")],                  # zero words
        "doc_id bigint, text string, lang string")
    merges = train_bpe(docs, n_merges=10)
    stats = {r["lang"]: r for r in
             tokenizer_stats(docs, merges=merges,
                             lang_col="lang").collect()}
    counted = {r["id"]: r["n_tokens"] for r in
               apply_bpe(docs, merges, with_tokens=False).collect()}
    # en: 4 + 4 words; tokens from the same kernel the stats use
    assert stats["en"]["n_words"] == 8
    assert stats["en"]["n_tokens"] == counted[1] + counted[2]
    assert stats["en"]["fertility"] == round(
        stats["en"]["n_tokens"] / 8, 4)
    assert stats["en"]["fertility"] >= 1.0       # >= one token/word
    assert stats["xx"]["n_docs"] == 1 and stats["xx"]["n_words"] == 3
    assert stats["zz"]["n_words"] == 0
    assert stats["zz"]["fertility"] is None      # null, not a crash
    # overall row when no strata column is given
    allrow = tokenizer_stats(docs, merges=merges).collect()
    assert len(allrow) == 1 and allrow[0]["lang"] == "all"
    # exactly one of merges/pieces
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exactly one"):
        tokenizer_stats(docs)


def test_nl_tokenizer_stats_lifecycle(spark, sf_dir, tmp_path):
    """'report tokenizer stats with the tokenizer at /path' routes,
    reads both store kinds, and rejects missing/garbage paths."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.bpe import (
        save_bpe,
        train_bpe,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.operators.unigram import (
        save_unigram,
        train_unigram,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import (
        Catalog,
    )

    assert parse_dataops_query(
        "report tokenizer stats with the tokenizer at /t") \
        == {"target": "tokenizer_stats", "tokenizer_path": "/t"}
    assert parse_dataops_query(
        "tokenizer fertility per language, tokenizer at /t")[
        "target"] == "tokenizer_stats"
    # the train/tokenize faces must not be shadowed
    assert parse_dataops_query(
        "train a bpe tokenizer on the corpus and save it")[
        "target"] == "tokenizer_train"
    # 'fertility' alone (no token context in the sentence) must NOT
    # hijack queries bound for later targets (r13 routing guard)
    assert parse_dataops_query(
        "split the corpus into train/val/test, stratified by the "
        "fertility rate column")["target"] == "split_corpus"
    # ...while fertility-then-tokenizer in one sentence still routes
    assert parse_dataops_query(
        "report fertility per language with the tokenizer at /t")[
        "target"] == "tokenizer_stats"

    docs = Catalog(spark, sf_dir).documents
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    bstore = str(tmp_path / "bpe")
    save_bpe(spark, train_bpe(docs, n_merges=30), bstore)
    res = pipe.run_dataops(
        f"report tokenizer stats with the tokenizer at {bstore}",
        sf_dir, str(tmp_path / "out"))
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["kind"] == "bpe"
    assert rep["overall"]["n_docs"] == docs.count()
    assert rep["overall"]["fertility"] >= 1.0
    langs = {r["lang"] for r in rep["per_lang"]}
    assert langs == {r["lang"] for r in
                     docs.select("lang").distinct().collect()}
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == len(rep["per_lang"])
    # unigram store: kind inferred from its own columns
    ustore = str(tmp_path / "uni")
    save_unigram(spark, train_unigram(docs, vocab_size=80), ustore)
    res2 = pipe.run_dataops(
        f"tokenizer fertility with the tokenizer at {ustore}",
        sf_dir, str(tmp_path / "out2"))
    assert res2["status"] == "complete"
    assert res2["reports"]["kind"] == "unigram"
    # a documents table without a lang column still gets the
    # corpus-wide 'all' stratum instead of an AnalysisException (r13)
    nolang = str(tmp_path / "nolang")
    docs.select("doc_id", "text").limit(50) \
        .write.parquet(nolang + "/documents.parquet")
    res3 = pipe.run_dataops(
        f"report tokenizer stats with the tokenizer at {bstore}",
        nolang, str(tmp_path / "out3"))
    assert res3["status"] == "complete"
    assert [r["lang"] for r in res3["reports"]["per_lang"]] == ["all"]
    assert res3["reports"]["overall"]["n_docs"] == 50
    # rejections
    r1 = pipe.run_dataops("report tokenizer stats", sf_dir,
                          str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "tokenizer path" in r1["reason"]
    docs.limit(1).write.parquet(str(tmp_path / "junk"))
    r2 = pipe.run_dataops(
        f"report tokenizer stats with the tokenizer at "
        f"{tmp_path}/junk", sf_dir, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" and "no tokenizer" in r2["reason"]
