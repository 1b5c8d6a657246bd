

def test_ngram_novelty_first_occurrence_fractions(spark):
    """Hand corpus: doc 1 owns every gram it has; doc 2 repeats one of
    doc 1's trigrams and adds one new; doc 3 is too short for trigrams
    and drops out."""
    from ram_datapipeline_spark.operators.text_ops import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: "a b c", "b c d"
            (2, "a b c x y"),      # grams: "a b c"(old), "b c x", "c x y"
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_grams"], out[1]["n_novel"]) == (2, 2)
    assert out[1]["novelty"] == 1.0
    assert (out[2]["n_grams"], out[2]["n_novel"]) == (3, 2)
    assert out[2]["novelty"] == 2.0 / 3.0
