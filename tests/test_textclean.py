"""C4 line-level cleaning (operators/textclean.py)."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.textclean import c4_clean


def _clean(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_clean(df, **kw).first()


def test_line_rules(spark):
    text = "\n".join(
        [
            "A perfectly fine sentence with enough words.",   # keep
            "Too short.",                                     # < 5 words
            "No terminal punctuation with plenty of words here",  # no punct
            '  "Quoted line with five words total."  ',       # keep (trim + ")
            "Ends with a question mark does it not?",         # keep
            "",                                               # empty
        ]
    )
    r = _clean(spark, text)
    assert (r.n_lines, r.n_kept_lines, r.keep) == (6, 3, True)
    assert r.cleaned_text.split("\n") == [
        "A perfectly fine sentence with enough words.",
        '"Quoted line with five words total."',
        "Ends with a question mark does it not?",
    ]


def test_doc_verdict_min_lines(spark):
    two_good = "Good sentence number one right here today.\nGood sentence number two right here today."
    r = _clean(spark, two_good)
    assert (r.n_kept_lines, r.keep) == (2, False)
    r2 = _clean(spark, two_good, min_lines=2)
    assert r2.keep is True
    # nothing survives → empty cleaned text, keep False
    r3 = _clean(spark, "menu\nhome\nabout us")
    assert (r3.n_kept_lines, r3.cleaned_text, r3.keep) == (0, "", False)


def test_single_line_doc_and_exclamation(spark):
    r = _clean(spark, "An exclamation with enough words to pass!", min_lines=1)
    assert (r.n_lines, r.n_kept_lines, r.keep) == (1, 1, True)
