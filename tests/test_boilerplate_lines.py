"""CCNet/RefinedWeb-style cross-document boilerplate line removal
(`textstats.remove_boilerplate_lines`): no-keeper semantics, digit-collapse
normalization, blank-line exemption, merged removed-span stats, and the
driver leg's synthetic lined input (`textstats._lined_docs`)."""

import pytest

import azure_based_pii_redactor_spark.engine.operators.textstats as ts

SF = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _run(spark, rows, **kw):
    out = ts.remove_boilerplate_lines(
        _df(spark, rows), "doc_id", span_stats=True, **kw
    ).collect()
    return {r["doc_id"]: r for r in out}


NAV = "home | about"
BODY = ["alpha bravo charlie", "delta echo foxtrot", "golf hotel india"]


def test_threshold_and_no_keeper(spark):
    """A line in >= min_docs DISTINCT docs is removed from ALL docs
    (including the first); a line in min_docs - 1 docs is kept."""
    rows = [
        (1, f"{NAV}\n{BODY[0]}\nrare pair"),
        (2, f"{NAV}\n{BODY[1]}\nrare pair"),
        (3, f"{NAV}\n{BODY[2]}"),
    ]
    by = _run(spark, rows, min_docs=3)
    # NAV is in 3 docs -> removed everywhere, even doc 1
    assert [by[i]["n_removed"] for i in (1, 2, 3)] == [1, 1, 1]
    assert by[1]["cleaned_text"] == f"{BODY[0]}\nrare pair"
    assert by[3]["cleaned_text"] == BODY[2]
    # 'rare pair' is in only 2 docs -> kept
    assert "rare pair" in by[2]["cleaned_text"]


def test_within_doc_repeats_count_once(spark):
    """Doc-frequency is DISTINCT docs: a line repeated 5x inside one doc
    plus one other doc is df=2, below a min_docs=3 threshold."""
    spam = "\n".join(["buy now"] * 5)
    rows = [(1, f"{spam}\n{BODY[0]}"), (2, f"buy now\n{BODY[1]}"),
            (3, BODY[2])]
    by = _run(spark, rows, min_docs=3)
    assert all(by[i]["n_removed"] == 0 for i in (1, 2, 3))


def test_normalization_digits_case_whitespace(spark):
    """'Visitor no. 3' / 'visitor no. 1744' / '  VISITOR NO. 9  ' share
    one normalized key (trim + lower + digit-collapse) and are removed
    together; the RAW line text is what disappears from each doc."""
    rows = [
        (1, f"Visitor no. 3\n{BODY[0]}"),
        (2, f"visitor no. 1744\n{BODY[1]}"),
        (3, f"  VISITOR NO. 9  \n{BODY[2]}"),
    ]
    by = _run(spark, rows, min_docs=3)
    assert [by[i]["n_removed"] for i in (1, 2, 3)] == [1, 1, 1]
    assert by[3]["cleaned_text"] == BODY[2]


def test_blank_lines_never_candidates(spark):
    """Empty / whitespace-only lines appear in every doc but are never
    boilerplate candidates -- paragraph structure survives."""
    rows = [(i, f"{BODY[i - 1]}\n\n   \nunique tail {chr(96 + i)}")
            for i in (1, 2, 3)]
    by = _run(spark, rows, min_docs=2)
    for i in (1, 2, 3):
        assert by[i]["n_removed"] == 0
        assert "\n\n   \n" in by[i]["cleaned_text"]


def test_adjacent_removals_merge_into_one_span(spark):
    """Two adjacent boilerplate lines are ONE merged 2-line span; a
    separated third removal is its own span."""
    rows = [
        (1, f"{NAV}\nfollow us\n{BODY[0]}\ncookie notice\n{BODY[1]}"),
        (2, f"{NAV}\nfollow us\n{BODY[2]}\ncookie notice"),
        (3, f"{NAV}\nfollow us\ncookie notice"),
    ]
    by = _run(spark, rows, min_docs=3)
    assert by[1]["n_spans"] == 2
    assert by[1]["max_span_len"] == 2
    assert by[1]["cleaned_text"] == f"{BODY[0]}\n{BODY[1]}"
    # doc 3 is ALL boilerplate: 3 removed lines, one merged span, empty
    # rebuilt text (the doc row survives with cleaned_text = '')
    assert by[3]["n_removed"] == 3
    assert by[3]["n_spans"] == 1
    assert by[3]["max_span_len"] == 3
    assert by[3]["cleaned_text"] == ""


def test_carry_cols_preserved(spark):
    df = spark.createDataFrame(
        [(1, "en", f"{NAV}\nbody one"), (2, "en", f"{NAV}\nbody two"),
         (3, "de", NAV)],
        "doc_id int, lang string, text string",
    )
    out = ts.remove_boilerplate_lines(
        df, "doc_id", min_docs=3, carry_cols=("lang",)
    ).collect()
    assert {(r["doc_id"], r["lang"]) for r in out} == {
        (1, "en"), (2, "en"), (3, "de")
    }


def test_lined_docs_shape(spark):
    """_lined_docs: header lines 0-1 are the shared boilerplate pair,
    body chunks are <= LINE_CHUNK_WORDS words of the original text in
    order, the promo footer carries doc_id % 7."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    lined = {r["doc_id"]: r["text"]
             for r in ts._lined_docs(spark, SF).collect()}
    assert set(lined) == set(orig)
    some = sorted(lined)[:25]
    for did in some:
        lines = lined[did].split("\n")
        assert lines[0] == ts.NAV_LINE
        assert lines[1] == ts.TAG_LINE
        assert lines[-1] == f"{ts.PROMO_PREFIX}{did % 7}"
        body = lines[2:-1]
        assert " ".join(body) == orig[did]
        assert all(
            len(b.split(" ")) <= ts.LINE_CHUNK_WORDS for b in body
        )
        # every chunk except the last is exactly full-width
        assert all(
            len(b.split(" ")) == ts.LINE_CHUNK_WORDS for b in body[:-1]
        )


def test_driver_leg_fires_at_smallest_sf(spark):
    """The lines leg must have real removals at every driver sf: the
    header pair + normalized promo are boilerplate in EVERY doc, so
    n_removed >= 3 and the adjacent header pair merges (max_span >= 2)."""
    out = ts.text_passage_and_line_dedup(spark, SF)
    rows = [r for r in out.collect() if r["leg"] == "lines"]
    assert len(rows) == 500
    assert all(r["n_removed"] >= 3 for r in rows)
    assert all(r["max_span_len"] >= 2 for r in rows)


def test_null_text_doc_survives(spark):
    """A NULL-text document must not vanish (split(NULL) explodes to
    zero rows) -- it survives as one blank line, rebuilt to ''."""
    df = spark.createDataFrame(
        [(1, None), (2, f"{NAV}\nbody a"), (3, f"{NAV}\nbody b"),
         (4, NAV)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in ts.remove_boilerplate_lines(
        df, "doc_id", min_docs=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_lines"] == 1
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_text"] == ""


def test_differential_vs_host_reference_random_corpus(spark):
    """Seeded-random corpus (small alphabet forces genuine cross-doc
    collisions, blanks, digit variants) vs a pure-Python reference
    implementation of the CCNet rule: every count, every span stat, and
    every rebuilt text must match exactly."""
    import random
    import re

    rng = random.Random(1744)
    vocab = ["nav", "shop", "cart", "Nav ", " SHOP", "item 3", "item 77",
             "", "   ", "alpha beta", "gamma", "promo x"]
    docs = {}
    for i in range(200):
        docs[i] = "\n".join(
            rng.choice(vocab) for _ in range(rng.randint(1, 8))
        )
    min_docs = 4

    def norm(line):
        return re.sub(r"[0-9]+", "0", line.strip().lower())

    df_counts = {}
    for i, text in docs.items():
        for k in {norm(l) for l in text.split("\n") if l.strip() != ""}:
            df_counts[k] = df_counts.get(k, 0) + 1
    boiler = {k for k, c in df_counts.items() if c >= min_docs}

    expect = {}
    for i, text in docs.items():
        lines = text.split("\n")
        rm = [j for j, l in enumerate(lines)
              if l.strip() != "" and norm(l) in boiler]
        spans = []
        for j in rm:
            if spans and j == spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], j)
            else:
                spans.append((j, j))
        expect[i] = (
            len(lines), len(rm), len(spans),
            max((b - a + 1 for a, b in spans), default=0),
            "\n".join(l for j, l in enumerate(lines) if j not in set(rm)),
        )

    out = ts.remove_boilerplate_lines(
        _df(spark, list(docs.items())), "doc_id", min_docs=min_docs,
        span_stats=True,
    ).collect()
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["n_spans"],
                      r["max_span_len"], r["cleaned_text"])
        for r in out
    }
    assert got == expect
