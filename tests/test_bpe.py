"""BPE tokenizer: trainer determinism, encode correctness, Spark parity."""

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.bpe import (
    bpe_encode,
    encode_word_py,
    learn_merges,
    learn_merges_py,
)


def test_learn_merges_classic_example():
    # Sennrich-style vocabulary; pair counts: (e,s)=9, (s,t)=9, (w,e)=8 ...
    # the 9-tie breaks lexicographically → ('e','s') first, then the merged
    # symbol chains: ('es','t') at 9.
    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges_py(vocab, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert len(merges) == 4


def test_learn_merges_stops_when_no_pairs():
    assert learn_merges_py([("a", 10)], 5) == []
    assert learn_merges_py([], 5) == []


def test_encode_word_applies_lowest_rank_first():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word_py("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word_py("lowest", ranks) == ["low", "est"]
    assert encode_word_py("xyz", ranks) == ["x", "y", "z"]
    assert encode_word_py("", ranks) == []


def test_encode_detokenization_identity():
    merges = learn_merges_py(
        [("hugging", 4), ("hugs", 9), ("bugs", 3), ("mugs", 1)], 6
    )
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("hugging", "hugs", "debug", "mug", "gsgsgs"):
        assert "".join(encode_word_py(w, ranks)) == w


def test_spark_train_and_encode_match_python_mirror(spark):
    rows = [
        (0, "the quick brown fox jumps"),
        (1, "the quick brown fox"),
        (2, "the lazy dogs sleep"),
        (3, "quick quick foxes jump the fence"),
        (4, "brown dogs and brown foxes"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = learn_merges(docs, n_merges=12, vocab_size=100)

    # mirror the trainer on a driver-side word count of the same corpus
    wc: dict[str, int] = {}
    for _, t in rows:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    expect = learn_merges_py(
        sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:100], 12
    )
    assert merges == expect

    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["bpe_toks"]
        for r in bpe_encode(docs, merges).collect()
    }
    for did, t in rows:
        py = [tok for w in t.lower().split() for tok in encode_word_py(w, ranks)]
        assert got[did] == py, did


def test_gate_query_all_rows_self_verify(spark):
    import __spark_entry__ as E

    out = E.queries()["text_bpe_tokens"](spark, "/root/testdata/sf0.001")
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("bad"),
        F.sum(F.when(F.col("n_bpe") < F.col("n_words"), 1).otherwise(0)).alias(
            "undercount"
        ),
    ).collect()[0]
    assert agg["n"] > 0
    assert agg["bad"] == 0
    assert agg["undercount"] == 0
