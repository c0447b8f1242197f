"""C4-style cleaning filters (textops/clean.py): line rules, page rules
with fixed reason precedence, three-sentence-span dedup, and the
zero/one-exchange plan shapes that make them 100-TB-viable."""

from __future__ import annotations

from searchengine_spark.textops import (
    c4_clean,
    c4_doc_filter,
    c4_line_filter,
    span_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_line_filter_rules(spark):
    text = "\n".join(
        [
            "A good sentence ends here.",  # kept
            'He said "stop there."',  # kept (quote after period still .)
            "Is this kept too?",  # kept (?)
            "Wow what an ending!",  # kept (!)
            'She replied "fine"',  # kept (terminal quote)
            "no terminal punctuation",  # dropped
            "Short.",  # dropped (< 3 words)
            "Please enable JavaScript to continue.",  # dropped (javascript)
            "   ",  # dropped
            "Trailing spaces still count.   ",  # kept (rtrim)
        ]
    )
    out = c4_line_filter(_docs(spark, [(1, text)])).collect()[0]
    assert out["n_lines"] == 10
    assert out["n_lines_kept"] == 6
    assert "JavaScript" not in out["clean_text"]
    assert "no terminal" not in out["clean_text"]
    assert out["clean_text"].startswith("A good sentence ends here.")


def test_line_filter_null_and_empty_text(spark):
    rows = c4_line_filter(_docs(spark, [(1, None), (2, "")])).collect()
    by_id = {r["id"]: r for r in rows}
    for i in (1, 2):
        assert by_id[i]["n_lines_kept"] == 0
        assert by_id[i]["clean_text"] == ""


def test_doc_filter_reason_precedence(spark):
    five = "One two three. Four five six. Seven. Eight nine. Ten more here."
    rows = c4_doc_filter(
        _docs(
            spark,
            [
                (1, five),  # keep
                (2, "code { x } " + five),  # brace (first rule)
                (3, "Lorem Ipsum dolor. { }"),  # brace wins over lorem
                (4, "lorem ipsum dolor sit amet. " + five),
                (5, "contains a badword somewhere. " + five),
                (6, "Too short. Only two sentences."),
            ],
        ),
        bad_words=("badword",),
    ).collect()
    want = {
        1: (True, ""),
        2: (False, "brace"),
        3: (False, "brace"),
        4: (False, "lorem_ipsum"),
        5: (False, "bad_word"),
        6: (False, "few_sentences"),
    }
    assert {r["id"]: (r["keep"], r["reason"]) for r in rows} == want


def test_bad_words_escaped_cased_and_empty_safe(spark):
    """User-supplied bad words are regex-escaped (metachars never throw),
    lowercased (match the lowered text), and empty elements are dropped
    (never a match-everything '||' alternation)."""
    five = "One two three. Four five six. Seven more. Eight nine. Ten here."
    rows = c4_doc_filter(
        _docs(
            spark,
            [(1, "I know C++ quite well. " + five),
             (2, "Contains a BADWORD too. " + five),
             (3, five)],
        ),
        bad_words=("c++", "", "BadWord"),
    ).collect()
    got = {r["id"]: r["reason"] for r in rows}
    assert got == {1: "bad_word", 2: "bad_word", 3: ""}


def test_clean_composition_applies_page_rules_to_cleaned_text(spark):
    # the brace line is dropped by the LINE filter, so the page survives
    # the brace rule; it still needs >= min_sentences cleaned sentences
    good = " ".join(f"Sentence number {i} is fine." for i in range(5))
    doc1 = "var x = { a: 1 }\n" + good
    doc2 = "Everything here { stays } on one kept line with a brace."
    out = c4_clean(_docs(spark, [(1, doc1), (2, doc2)]))
    rows = out.collect()
    assert [r["id"] for r in rows] == [1]
    assert "{" not in rows[0]["clean_text"]


def test_clean_is_a_zero_exchange_map(spark):
    plan = _plan(c4_clean(_docs(spark, [(1, "x.")])))
    assert "Exchange" not in plan


def test_span_dedup_canonical_and_cross_doc(spark):
    shared = "Alpha beta gamma. Delta epsilon zeta. Eta theta iota."
    rows = span_dedup(
        _docs(
            spark,
            [
                (7, "Unique seven lead-in. " + shared),
                (3, "Unique three lead-in. " + shared),
                (9, "Totally unrelated page. With different sentences. Three of them."),
            ],
        )
    ).collect()
    # only the exact shared 3-sentence span duplicates; canonical is doc 3
    assert [(r["id"], r["span_idx"]) for r in rows] == [(7, 1)]


def test_span_dedup_within_doc_and_short_docs(spark):
    rep = "Aa bb. Cc dd. Ee ff. Aa bb. Cc dd. Ee ff."
    rows = span_dedup(_docs(spark, [(1, rep), (2, "One. Two.")])).collect()
    # spans: idx0 == idx3 (the repeated triple); doc 2 has < 3 sentences
    assert [(r["id"], r["span_idx"]) for r in rows] == [(1, 3)]


def test_span_dedup_single_exchange_plan(spark):
    plan = _plan(span_dedup(_docs(spark, [(1, "A b. C d. E f. G h.")])))
    assert plan.count("Arguments: hashpartitioning") == 1, plan
