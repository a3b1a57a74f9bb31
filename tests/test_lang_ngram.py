"""Trained char-n-gram language ID (Cavnar-Trenkle profiles as a
naive-Bayes weight table): held-out accuracy on real-language
fixtures, OOV-floor fairness, degenerate inputs, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T

# real-language training snippets (public-domain phrasing); several
# per language so profiles see in-language variety
_TRAIN = {
    "en": ["the quick brown fox jumps over the lazy dog near the river",
           "we know that many of these things will happen again soon",
           "there is nothing better than a long walk in the morning",
           "she said that the weather would be fine for the journey"],
    "de": ["der schnelle braune fuchs springt über den faulen hund",
           "wir wissen dass viele dieser dinge bald wieder geschehen",
           "es gibt nichts besseres als einen langen spaziergang",
           "sie sagte dass das wetter für die reise schön sein würde"],
    "es": ["el rápido zorro marrón salta sobre el perro perezoso",
           "sabemos que muchas de estas cosas volverán a suceder",
           "no hay nada mejor que un largo paseo por la mañana",
           "ella dijo que el tiempo sería bueno para el viaje"],
    "fr": ["le rapide renard brun saute par dessus le chien paresseux",
           "nous savons que beaucoup de ces choses arriveront encore",
           "il n'y a rien de mieux qu'une longue promenade le matin",
           "elle a dit que le temps serait beau pour le voyage"],
}
_HELD_OUT = [
    (0, "en", "the old man walked down to the sea with his dog"),
    (1, "en", "they will know the answer before the end of the day"),
    (2, "de", "das alte haus steht seit vielen jahren an der straße"),
    (3, "de", "ich würde gerne wissen wann der zug wieder fährt"),
    (4, "es", "la casa vieja está junto al camino desde hace años"),
    (5, "es", "me gustaría saber cuándo vuelve a salir el tren"),
    (6, "fr", "la vieille maison se trouve près du chemin depuis des années"),
    (7, "fr", "je voudrais savoir quand le train partira encore"),
]


def _train_df(spark):
    rows = [(i * 10 + j, lang, s)
            for i, (lang, sents) in enumerate(sorted(_TRAIN.items()))
            for j, s in enumerate(sents)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_char_ngrams_expression(spark):
    df = spark.createDataFrame(
        [(1, "Ab  c"), (2, "ab"), (3, ""), (4, None)], ["i", "t"])
    got = {r["i"]: r["g"] for r in df.select(
        "i", T._char_ngrams(F.col("t"), 3).alias("g")).collect()}
    assert got[1] == ["ab ", "b c"]          # lowercased, ws collapsed
    assert got[2] == [] and got[3] == [] and got[4] == []


def test_lang_id_ngram_heldout_accuracy(spark):
    weights, floors = T.train_lang_ngrams(_train_df(spark), top_k=400)
    assert set(floors) == {"en", "de", "es", "fr"}
    held = spark.createDataFrame(_HELD_OUT, ["doc_id", "want", "text"])
    got = {r["id"]: r["lang"] for r in
           T.lang_id_ngram(held, weights, floors).collect()}
    want = {i: lang for i, lang, _ in _HELD_OUT}
    assert got == want                       # 8/8 on held-out sentences
    # deterministic across runs
    again = {r["id"]: r["lang"] for r in
             T.lang_id_ngram(held, weights, floors).collect()}
    assert got == again


def test_lang_id_ngram_degenerate_inputs(spark):
    weights, floors = T.train_lang_ngrams(_train_df(spark), top_k=200)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "zz"), (4, "the the the")],
        "doc_id long, text string")
    got = {r["id"]: r["lang"] for r in
           T.lang_id_ngram(df, weights, floors).collect()}
    assert got[1] == "und" and got[2] == "und"   # no grams at all
    assert got[4] == "en"
    assert set(got) == {1, 2, 3, 4}              # every id gets a row


def test_lang_id_ngram_oov_floor_fairness(spark):
    """A doc that matches NOTHING in any profile must not silently
    default to whichever language has the largest profile: all its
    grams hit the per-language floors, and with no matched rows it
    resolves to 'und' rather than a spurious winner."""
    weights, floors = T.train_lang_ngrams(_train_df(spark), top_k=200)
    df = spark.createDataFrame([(1, "ZZZZQQQQXXXX")],
                               "doc_id long, text string")
    r = T.lang_id_ngram(df, weights, floors).first()
    assert r["lang"] == "und" and r["score"] is None
