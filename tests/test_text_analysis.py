

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


def test_lexical_diversity_hand_values(spark):
    """gini = (T^2 - sum tf^2) * 1e9 div T^2 on hand-checkable docs."""
    from ram_datapipeline_spark.operators.text_ops import lexical_diversity

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),      # T=4, sumsq=16 -> gini 0
            (2, "a b c d"),      # T=4, sumsq=4 -> (16-4)*1e9 div 16
            (3, "a a b"),        # T=3, sumsq=5 -> (9-5)*1e9 div 9
            (4, "solo"),         # T=1 -> gini 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lexical_diversity(docs).collect()}
    assert (out[1]["n_tokens"], out[1]["distinct_tokens"]) == (4, 1)
    assert out[1]["gini_scaled"] == 0
    assert out[2]["gini_scaled"] == (16 - 4) * 10**9 // 16
    assert out[2]["distinct_tokens"] == 4
    assert out[3]["gini_scaled"] == (9 - 5) * 10**9 // 9
    assert out[4]["gini_scaled"] == 0


def test_bm25_rank_saturation_and_idf_ordering(spark):
    """A doc repeating the term beats one mention but saturates (less
    than proportional); rarer terms out-weigh common ones; k cuts with
    (score desc, id asc) ties."""
    from ram_datapipeline_spark.operators.text_ops import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "rare common filler one", 4),
            (2, "common common common common", 4),
            (3, "common filler pad pad", 4),
            (4, "pad pad pad pad", 4),
        ],
        "doc_id long, text string, n_chars long",
    )
    out = bm25_rank(
        docs, ("rare", "common"), len_col="n_chars", k=10
    ).collect()
    scores = {r["doc_id"]: r["score"] for r in out}
    # doc 1 has the rare term (df=1) -> dominates docs with common only
    assert scores[1] > scores[2] > scores[3]
    assert 4 not in scores
    # tf saturation: 3 extra mentions of 'common' gain < 3x one mention
    d2_common, d3_common = scores[2], scores[3]
    assert d2_common < 3 * d3_common
    assert out == sorted(out, key=lambda r: (-r["score"], r["doc_id"]))


def test_sorted_neighborhood_window_and_threshold(spark):
    """Identical texts sort adjacent and pair at Jaccard 1.0; a doc
    beyond the rank window never pairs even if identical."""
    from ram_datapipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "alpha beta delta x"),
            (4, "zz totally different words"),
        ],
        "doc_id long, text string",
    )
    pairs = sorted_neighborhood_pairs(
        docs, window=2, threshold_num=1, threshold_den=3, n_partitions=2
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): (r["inter"], r["uni"]) for r in pairs}
    # sort order: doc3 ('...delta') < doc1 = doc2 ('...gamma') < doc4
    assert got[(1, 2)] == (3, 3)  # exact clones, adjacent ranks
    assert got[(3, 1)] == (2, 5)  # 2/5 Jaccard passes 1/3 inside the window
    assert all(a != 4 and b != 4 for a, b in got)  # doc4 shares no token


def test_rake_keyphrases_hand_example(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from ram_datapipeline_spark.operators.text_ops import rake_keyphrases

    # classic RAKE behavior: longer runs outrank frequent single words
    docs = spark.createDataFrame(
        [(1, "deep learning beats the shallow model a deep model")],
        "doc_id long, text string",
    )
    out = rake_keyphrases(docs, stopwords=("a", "the"), top_k=3).collect()
    by_rank = {r.rk: r for r in out}
    # phrases: "deep learning beats" (run 0), "shallow model" (run 1),
    # "deep model" (run 2). freq: deep 2, learning 1, beats 1,
    # shallow 1, model 2. deg: deep 3+2=5, learning 3, beats 3,
    # shallow 2, model 2+2=4.
    S = 1_000_000
    exp = {
        "deep learning beats": (5 * S) // 2 + 3 * S + 3 * S,
        "shallow model": 2 * S + (4 * S) // 2,
        "deep model": (5 * S) // 2 + (4 * S) // 2,
    }
    got = {r.phrase: r.score_scaled for r in out}
    assert got == exp
    assert by_rank[1].phrase == "deep learning beats"
    # stopword runs delimit correctly: no phrase contains 'a' or 'the'
    assert all(" a " not in f" {p} " and " the " not in f" {p} "
               for p in got)


def test_gopher_rules_edges(spark):
    """Each rule trips on its published boundary: word-count bounds,
    mean word length 3..10 (cross-multiplied, no division), >=80%
    alphabetic words, >=2 stopword anchors, symbol-to-word <= 0.1
    counting '#' and '...' (ellipsis counted per occurrence)."""
    from ram_datapipeline_spark.operators.text_ops import gopher_rules

    good = "the quick brown fox jumps with zeal " * 8  # 56 words, stopwords the/with
    short_words = "a b c d e " * 12  # mean word length 1
    digits = " ".join(["123"] * 60)  # zero alphabetic words
    no_stop = " ".join(["zorp"] * 60)  # no stopword anchors
    symbols = ("the word and more ... # " * 10)  # 2 symbols per 6 words > 0.1
    df = spark.createDataFrame(
        [
            (1, good.strip()),
            (2, short_words.strip()),
            (3, digits),
            (4, no_stop),
            (5, symbols.strip()),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    g = out[1]
    assert g.rule_word_count and g.rule_mean_word_len and g.rule_alpha_ratio
    assert g.rule_stopwords and g.rule_symbol_ratio and g.pass_gopher
    assert out[2].n_words == 60 and not out[2].rule_mean_word_len
    assert not out[2].pass_gopher
    assert out[3].n_alpha_words == 0 and not out[3].rule_alpha_ratio
    assert out[4].n_stop_hits == 0 and not out[4].rule_stopwords
    s = out[5]
    assert s.n_symbols == 20  # 10x '#' + 10x '...'
    assert not s.rule_symbol_ratio and not s.pass_gopher


def test_gopher_rules_word_count_bounds(spark):
    from ram_datapipeline_spark.operators.text_ops import gopher_rules

    w49 = " ".join(["the and with fox"] * 12) + " run"  # 49 words
    w50 = " ".join(["the and with fox"] * 12) + " run fox"  # 50 words
    df = spark.createDataFrame([(1, w49), (2, w50)], "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].n_words == 49 and not out[1].rule_word_count
    assert out[2].n_words == 50 and out[2].rule_word_count


def test_gopher_rules_whitespace_not_words(spark):
    """Review find: doubled/leading/trailing spaces produced empty
    tokens that inflated n_words and corrupted the alpha ratio."""
    from ram_datapipeline_spark.operators.text_ops import gopher_rules

    clean = "the quick brown fox jumps with zeal " * 8
    messy = "  " + clean.replace("quick brown", "quick  brown") + "  "
    df = spark.createDataFrame(
        [(1, clean.strip()), (2, messy)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].n_words == out[2].n_words == 56
    assert out[2].n_alpha_words == 56 and out[2].rule_alpha_ratio
