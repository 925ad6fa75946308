"""C4 rule pack (Raffel 2020 §2.2): line filters (terminal punctuation,
min words, javascript), page filters (sentence count, blocklist, lorem
ipsum, curly brace) and the first-failing-rule reason ordering."""

from __future__ import annotations

from bloomine_spark.operators.textops import c4_clean

GOOD = "this line has plenty of words and ends properly."


def _run(spark, pages):
    rows = [(i, t) for i, t in enumerate(pages)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in c4_clean(df).collect()}


def test_line_filters(spark):
    page = "\n".join([
        GOOD,
        "no terminal punctuation on this line here",
        "too short.",
        "please enable JavaScript to view this content now.",
        GOOD,
        GOOD,
    ])
    out = _run(spark, [page])[0]
    assert out["n_lines_kept"] == 3
    assert out["n_lines_dropped"] == 3
    assert out["text"] == "\n".join([GOOD, GOOD, GOOD])
    assert out["n_sentences"] == 3
    assert out["page_keep"] and out["reason"] is None


def test_page_filters_and_reason_order(spark):
    three = "\n".join([GOOD, GOOD, GOOD])
    pages = [
        "\n".join([GOOD, GOOD]),                               # 2 sentences
        three + "\nthis page contains badword1 obviously right here.",
        three + "\nlorem ipsum dolor sit amet consectetur adipiscing elit.",
        three + "\nsee the {curly} bracket inline here today.",
        # fails sentences AND lorem → sentence reason wins (rule order)
        "lorem ipsum dolor sit amet consectetur adipiscing elit.",
        three,
    ]
    out = _run(spark, pages)
    assert out[0]["reason"] == "too_few_sentences" and not out[0]["page_keep"]
    assert out[1]["reason"] == "blocklist"
    assert out[2]["reason"] == "lorem_ipsum"
    assert out[3]["reason"] == "curly_brace"
    assert out[4]["reason"] == "too_few_sentences"
    assert out[5]["page_keep"] and out[5]["reason"] is None


def test_exclamation_and_question_count_as_sentences(spark):
    page = "\n".join([
        "is this a question with enough words here?",
        "yes it surely is an exclamation with words!",
        'and a quoted line with five or more words."',
    ])
    out = _run(spark, [page])[0]
    assert out["n_lines_kept"] == 3
    assert out["n_sentences"] == 3  # '?' + '!' + the '.' inside '."'
    assert out["page_keep"]


def test_curly_in_dropped_line_does_not_kill_page(spark):
    page = "\n".join([GOOD, GOOD, GOOD, "short {x}."])
    out = _run(spark, [page])[0]
    assert out["page_keep"]  # the curly line was dropped for word count
