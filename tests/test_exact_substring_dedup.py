"""operators/spans.exact_substring_dedup — ExactSubstr removal semantics
on hand-crafted corpora: first occurrence survives verbatim, later
occurrences lose exactly the shared span, short docs and within-doc
repeats are untouched."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.operators.spans import (
    exact_substring_dedup,
)

SPAN = "a b c d e f g h"  # exactly 8 tokens


def _run(spark, rows, n=8):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["redacted"])
        for r in exact_substring_dedup(df, "doc_id", n=n).collect()
    }


def test_first_occurrence_survives_later_removed(spark):
    got = _run(
        spark,
        [
            (1, f"intro {SPAN} outro"),
            (2, f"left {SPAN} right"),
            (3, "no overlap here at all with anything"),
        ],
    )
    assert got[1] == (10, 0, f"intro {SPAN} outro")
    assert got[2] == (10, 8, "left right")
    assert got[3][1] == 0


def test_overlapping_spans_remove_superspan(spark):
    # doc 2 contains the span plus one extra shared token on each side ->
    # multiple duplicated 8-grams chain; all covered positions go
    got = _run(
        spark,
        [
            (1, f"x {SPAN} y unrelated tail words here now"),
            (2, f"pre x {SPAN} y post"),
        ],
    )
    # "x a b c d e f g h y" is 10 shared tokens -> all removed from doc 2
    assert got[2] == (12, 10, "pre post")


def test_short_docs_pass_through(spark):
    got = _run(spark, [(1, "tiny doc"), (2, "tiny doc")])
    assert got[1] == (2, 0, "tiny doc")
    assert got[2] == (2, 0, "tiny doc")  # < n tokens: no grams, no removal


def test_within_doc_repeat_kept(spark):
    text = f"{SPAN} middle {SPAN}"
    got = _run(spark, [(1, text)])
    assert got[1][1] == 0  # cross-document only by contract


def test_whole_doc_removed(spark):
    got = _run(spark, [(1, SPAN), (2, SPAN)])
    assert got[1] == (8, 0, SPAN)
    assert got[2] == (8, 8, "")
