"""clean_corpus pipeline: every stage's effect visible on a planted
fixture."""

from traits_data_spark.plans.corpus import clean_corpus


def test_clean_corpus_stages(spark):
    long = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, long),                                  # keeper
        (2, long),                                  # exact dup of 1 → dropped
        (3, long.replace("dog", "cat")),            # near dup of 1 → dropped
        (4, "short text"),                          # too few words
        (5, "!!! ??? *** !!! ??? *** !!! ??? *** !!!"),  # punct-heavy + und
        (6, "zzz qqq xxx yyy www vvv uuu ttt sss rrr"),  # no lang markers → und
        (7, "el perro es una mascota y los gatos son animales de la casa"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = clean_corpus(
        df, min_words=5, max_punct_ratio=0.2, jaccard_threshold=0.5,
        num_hashes=16, bands=8,
    )
    kept = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert set(kept) == {1, 7}
    assert kept[1] == "en" and kept[7] == "es"
