"""Line-level hygiene operators (satya_spark/functions/lines.py):
C4 line/page cleaning, corpus-global line dedup, Gopher duplicate-line
signals — hand-computed expectations plus the zero-shuffle plan pin
for the doc-local path. The DuckDB differential for all three runs in
the lines_clean / lines_dedup / line_repetition oracle gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from satya_spark.functions.lines import (
    clean_lines,
    dedup_lines,
    line_repetition,
)

GOOD1 = "the quick brown fox jumps over the lazy dog."
GOOD2 = "a different sentence with enough words to keep?"
FOOTER = "subscribe to the newsletter for more updates today."


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0: two good lines + footer + short junk line
        (0, "\n".join([GOOD1, "click here", GOOD2, FOOTER])),
        # doc 1: duplicate of GOOD1 twice (within-doc dup) + footer
        (1, "\n".join([GOOD1, GOOD1, GOOD2, FOOTER])),
        # doc 2: javascript line + lorem ipsum page poison
        (2, "\n".join([GOOD1, "uses javascript widgets on every page.",
                       "lorem ipsum dolor sit amet consectetur.", GOOD2, FOOTER])),
        # doc 3: curly brace page poison
        (3, "\n".join([GOOD1, "{ var x = 1; }", GOOD2, FOOTER])),
        # doc 4: only two keepable lines -> fails min_lines=3
        (4, "\n".join([GOOD1, "no terminal punctuation here", GOOD2])),
        # doc 5: exact duplicate of doc 0's text (loses everything in
        # global line dedup; page-level dedup falls out)
        (5, "\n".join([GOOD1, "click here", GOOD2, FOOTER])),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_clean_lines_c4_semantics(docs):
    out = {r["doc_id"]: r for r in clean_lines(docs).collect()}
    # doc 0: GOOD1, GOOD2, FOOTER survive (click here: 2 words)
    assert out[0]["n_lines"] == 4 and out[0]["n_kept"] == 3
    assert out[0]["text_clean"] == "\n".join([GOOD1, GOOD2, FOOTER])
    # doc 1: dup lines both kept (cleaning is not dedup)
    assert out[1]["n_kept"] == 4
    # doc 2 (lorem ipsum) and doc 3 (brace) dropped page-level
    assert 2 not in out and 3 not in out
    # doc 4: only 2 kept lines < min_lines=3 -> dropped
    assert 4 not in out
    # doc 5 identical to doc 0
    assert out[5]["text_clean"] == out[0]["text_clean"]


def test_clean_lines_is_narrow_zero_shuffle(docs):
    """The doc-local path must never shuffle: no Exchange anywhere in
    the physical plan (the 100 TB argument for taking the interpreted
    HOF over an explode+groupBy — see module docstring)."""
    df = clean_lines(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dedup_lines_first_occurrence_wins(docs):
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    # doc 0 is first for all its lines: keeps everything
    assert out[0]["n_dropped"] == 0
    assert out[0]["text_dedup"] == "\n".join([GOOD1, "click here", GOOD2, FOOTER])
    # doc 1: GOOD1/GOOD2/FOOTER already seen in doc 0; second GOOD1
    # also dropped -> nothing left, absent from output
    assert 1 not in out
    # doc 2 keeps only its two novel lines (js + lorem)
    assert out[2]["n_lines"] == 5 and out[2]["n_dropped"] == 3
    # doc 5 (exact dup of doc 0) vanishes entirely
    assert 5 not in out


def test_dedup_lines_order_preserved(spark):
    df = spark.createDataFrame(
        [(10, "z last line.\na first line.\nz last line.")],
        ["doc_id", "text"],
    )
    r = dedup_lines(df).collect()[0]
    # within one doc: first occurrence kept, original ORDER preserved
    # (not sorted by content)
    assert r["text_dedup"] == "z last line.\na first line."
    assert r["n_dropped"] == 1


def test_line_repetition_fractions(docs):
    out = {r["doc_id"]: r for r in line_repetition(docs).collect()}
    # doc 1: GOOD1 twice out of 4 lines -> dup_line_frac = 0.5
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == pytest.approx(0.5)
    chars = 2 * len(GOOD1) + len(GOOD2) + len(FOOTER)
    assert out[1]["dup_line_char_frac"] == pytest.approx(
        round(2 * len(GOOD1) / chars, 6)
    )
    # doc 0: all lines distinct
    assert out[0]["dup_line_frac"] == 0.0
    assert out[0]["dup_line_char_frac"] == 0.0


def test_line_repetition_empty_text(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    r = line_repetition(df).collect()[0]
    # split("") -> [""], one zero-length line: defined, no div-by-zero
    assert r["n_lines"] == 1
    assert r["dup_line_frac"] == 0.0 and r["dup_line_char_frac"] == 0.0


def test_clean_lines_keyword_knobs(spark):
    df = spark.createDataFrame(
        [(1, "one two three four.\nfive six seven eight.")],
        ["doc_id", "text"],
    )
    # default min_words=5 rejects both lines
    assert clean_lines(df).count() == 0
    # relaxed knobs keep the page
    r = clean_lines(df, min_words=3, min_lines=2).collect()[0]
    assert r["n_kept"] == 2
