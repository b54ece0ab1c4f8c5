"""Golden tests for the CALK sectionizer (FIXTURES.md B5/B6): the
reference-grammar cases — numeric headings, two-line uppercase heading
continuation, consecutive-letter validation, double letters only after
'z', empty-content backward fill, '-' default."""

from etl_financial_report_spark.operators.sectionizer import (
    _next_letter,
    parse_lines,
    sectionize,
)

#: FIXTURES.md B5 — one document exercising the full grammar.
B5_LINES = [
    "1. GENERAL",
    "PT Example Tbk was established in 1990.",
    "It operates banks.",
    "2. SIGNIFICANT ACCOUNTING",
    "POLICIES",
    "a. Basis of preparation",
    "Statements follow IFAS.",
    "b. Foreign currency",
    "Translated at closing rates.",
    "d. Not a heading (skips c)",
    "3. EMPTY HEADING",
    "4. RISK MANAGEMENT",
    "Credit risk is monitored.",
]

#: FIXTURES.md B6 — expected (kode, heading, content-after-fill).
B6_EXPECTED = [
    ("1", "GENERAL", "PT Example Tbk was established in 1990. It operates banks."),
    # section 2's own content is empty (its lines became subsections) ->
    # backward-filled from 2a
    ("2", "SIGNIFICANT ACCOUNTING POLICIES", "Statements follow IFAS."),
    ("2a", "Basis of preparation", "Statements follow IFAS."),
    ("2b", "Foreign currency", "Translated at closing rates. d. Not a heading (skips c)"),
    ("3", "EMPTY HEADING", "Credit risk is monitored."),  # backward-filled from section 4
    ("4", "RISK MANAGEMENT", "Credit risk is monitored."),
]


def test_parse_lines_grammar():
    rows = parse_lines("DOC", B5_LINES)
    got = [(k, h, c) for (_, _, k, h, c) in rows]
    assert [g[0] for g in got] == ["1", "2", "2a", "2b", "3", "4"]
    assert got[0] == ("1", "GENERAL", "PT Example Tbk was established in 1990. It operates banks.")
    # heading continuation joined the second uppercase line
    assert got[1][1] == "SIGNIFICANT ACCOUNTING POLICIES"
    # 'd.' rejected as a heading -> became content of the open section (2b)
    assert "d. Not a heading" in got[3][2]
    # empty section content stays empty pre-fill
    assert got[4][2] == ""


def test_sectionize_backward_fill(spark):
    lines = spark.createDataFrame(
        [("DOC", 1, i, line) for i, line in enumerate(B5_LINES)],
        "doc_id string, page_no int, line_no int, line string",
    )
    out = sectionize(lines).orderBy("kode_calk").collect()
    got = [(r.kode_calk, r.heading_calk, r.konten_calk) for r in out]
    assert got == sorted(B6_EXPECTED, key=lambda t: t[0])


def test_empty_content_defaults_to_dash(spark):
    lines = spark.createDataFrame(
        [("D", 1, 0, "1. ONLY HEADING")],
        "doc_id string, page_no int, line_no int, line string",
    )
    out = sectionize(lines).collect()
    assert len(out) == 1 and out[0].konten_calk == "-"


def test_next_letter_sequence():
    assert _next_letter("") == "a"
    assert _next_letter("a") == "b"
    assert _next_letter("y") == "z"
    assert _next_letter("z") == "aa"
    assert _next_letter("aa") == "ab"
    assert _next_letter("az") == "ba"


def test_double_letter_only_after_z():
    # letters a..z then aa must be accepted; aa before z must not
    lines = ["1. SEC"] + [f"{chr(c)}. item {chr(c)}" for c in range(ord("a"), ord("z") + 1)]
    lines += ["aa. beyond z", "content"]
    rows = parse_lines("D", lines)
    keys = [r[2] for r in rows]
    assert keys[-1] == "1aa"

    early = parse_lines("D", ["1. SEC", "aa. too early", "a. fine"])
    keys = [r[2] for r in early]
    assert "1aa" not in keys and "1a" in keys
