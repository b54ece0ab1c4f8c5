"""CALK sectionizer — the reference's largest operator (W4): a sequential
state machine that turns ordered note-section text lines into a
hierarchical (kode_calk, heading, content) table
(``proses_pdf_calk``, mainTesting.py:500-636; key synthesis at
mainTesting.py:557-560,584-591,614-621; heading continuation at
mainTesting.py:529-540; letter-sequence validation at
mainTesting.py:566-570,596-600).

Spark shape (SURVEY.md §2.5 W4, §7 hard-part 1): the parse is inherently
sequential *per document* but embarrassingly parallel *across documents*,
so the physical strategy is ``groupBy(doc_id).applyInPandas`` — one
Arrow batch per document, lines sorted inside the group (Spark guarantees
no inter-group mixing; in-group order is minted from explicit
(page_no, line_no) columns, never from incidental row order).

Heading grammar (re-derived from the reference's behavior, not its code):

  * numeric heading   — ``^(\\d{1,2})\\.`` with an UPPERCASE remainder
    opens section ``N`` and resets the letter sequence;
  * heading continuation — an all-uppercase line directly after a heading
    line extends that heading text;
  * letter heading    — ``^([a-z])\\.\\s`` opens subsection ``N<letter>``
    but ONLY if the letter is the successor of the previous letter (or
    ``a`` first); otherwise the line is ordinary content;
  * double-letter heading — ``^([a-z]{2})\\.\\s`` is only valid once the
    single-letter sequence has passed ``z`` and must also be consecutive
    (``aa``, ``ab``, …) — key ``N<letters>``;
  * anything else     — content appended to the open section.

Sections with no content inherit the next section's content (backward
fill, mainTesting.py:648-658) and remaining empties become ``"-"``
(mainTesting.py:669).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUM_HEADING = re.compile(r"^(\d{1,2})\.\s*(.*)$")
_LETTER_HEADING = re.compile(r"^([a-z])\.\s+(.*)$")
_DLETTER_HEADING = re.compile(r"^([a-z]{2})\.\s+(.*)$")

#: output schema — mirrors tb_catatan_atas_laporan_keuangan
#: (mainTesting.py:673-677) with doc_id standing in for kode_emiten.
SECTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("section_no", T.IntegerType()),
        T.StructField("kode_calk", T.StringType()),
        T.StructField("heading_calk", T.StringType()),
        T.StructField("konten_calk", T.StringType()),
    ]
)


def _next_letter(seq: str) -> str:
    """Successor in the a..z, aa..az, ba.. sequence ('' -> 'a', 'z' -> 'aa')."""
    if not seq:
        return "a"
    if len(seq) == 1:
        return "aa" if seq == "z" else chr(ord(seq) + 1)
    if seq[1] == "z":
        return chr(ord(seq[0]) + 1) + "a"
    return seq[0] + chr(ord(seq[1]) + 1)


def parse_lines(doc_id: str, lines: list[str]) -> list[tuple[str, int, str, str, str]]:
    """Run the state machine over one document's ordered lines."""
    out: list[tuple[str, int, str, str, str]] = []
    cur_key: str | None = None
    cur_heading = ""
    cur_content: list[str] = []
    cur_num = ""          # open numeric section number
    last_letter = ""      # last accepted letter-sequence element
    in_heading = False    # previous line was (part of) a heading
    n = 0

    def emit() -> None:
        nonlocal n
        if cur_key is not None:
            out.append((doc_id, n, cur_key, cur_heading.strip(), " ".join(cur_content).strip()))
            n += 1

    for raw in lines:
        line = re.sub(r"\s+", " ", raw).strip()
        if not line:
            continue

        m = _NUM_HEADING.match(line)
        if m and (m.group(2) == "" or m.group(2).isupper()):
            emit()
            cur_num = m.group(1)
            cur_key = cur_num
            cur_heading = m.group(2)
            cur_content = []
            last_letter = ""
            in_heading = True
            continue

        if in_heading and line.isupper():
            # heading continuation (mainTesting.py:529-533)
            cur_heading += " " + line
            continue
        in_heading = False

        m = _LETTER_HEADING.match(line)
        if m and cur_num and m.group(1) == _next_letter(last_letter) and len(_next_letter(last_letter)) == 1:
            emit()
            last_letter = m.group(1)
            cur_key = cur_num + last_letter
            cur_heading = m.group(2)
            cur_content = []
            continue

        m = _DLETTER_HEADING.match(line)
        if m and cur_num and len(_next_letter(last_letter)) == 2 and m.group(1) == _next_letter(last_letter):
            emit()
            last_letter = m.group(1)
            cur_key = cur_num + last_letter
            cur_heading = m.group(2)
            cur_content = []
            continue

        if cur_key is not None:
            cur_content.append(line)

    emit()
    return out


def _parse_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["page_no", "line_no"], kind="mergesort")
    doc_id = str(pdf["doc_id"].iloc[0])
    rows = parse_lines(doc_id, pdf["line"].tolist())
    return pd.DataFrame(rows, columns=[f.name for f in SECTION_SCHEMA.fields])


def sectionize(lines: DataFrame) -> DataFrame:
    """(doc_id, page_no, line_no, line) -> hierarchical CALK sections.

    Parallel unit = document; in-group sort restores line order inside the
    Arrow batch. Backward fill + '-' default applied relationally on top
    of the parsed sections (W3 + F16).
    """
    parsed = lines.groupBy("doc_id").applyInPandas(_parse_group, SECTION_SCHEMA)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("section_no")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    content = F.when(F.col("konten_calk") != "", F.col("konten_calk"))
    filled = F.first(content, ignorenulls=True).over(w)
    return parsed.select(
        "doc_id",
        "kode_calk",
        "heading_calk",
        F.coalesce(filled, F.lit("-")).alias("konten_calk"),
    )


# ------------------------------------------------------------------ queries

from ..io import load_table  # noqa: E402
from ..registry import register  # noqa: E402


def synthetic_calk_lines(spark, sf_dir: str) -> DataFrame:
    """Deterministic CALK-shaped line corpus derived from the documents
    table: each doc contributes numbered uppercase headings, consecutive
    letter subsections, and content lines built from its own tokens.
    Exercises the full grammar without PDF dependencies."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    lines = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.lit("1. GENERAL"),
            F.concat_ws(" ", F.element_at(toks, 1), F.element_at(toks, 2)),
            F.concat(F.lit("a. policy "), F.element_at(toks, 3)),
            F.concat_ws(" ", F.element_at(toks, 4), F.element_at(toks, 5)),
            F.concat(F.lit("b. basis "), F.element_at(toks, 6)),
            F.concat(F.lit("d. skipped-not-consecutive "), F.element_at(toks, 7)),
            F.lit("2. SIGNIFICANT ACCOUNTING"),
            F.lit("POLICIES"),
            F.concat_ws(" ", F.element_at(toks, 8), F.element_at(toks, 9)),
            F.lit("3. EMPTY SECTION"),
            F.lit("4. FINAL"),
            F.element_at(toks, 10),
        ).alias("ls"),
    ).select("doc_id", F.posexplode("ls").alias("line_no", "line"))
    return lines.select("doc_id", F.lit(1).alias("page_no"), "line_no", "line")


#: The state machine itself is not SQL-expressible, but its output ON THE
#: SYNTHETIC CORPUS is a pure function of each document's tokens, so the
#: oracle enumerates the six expected sections per document (backward fill
#: gives the empty section 3 its successor's content). General-case grammar
#: behavior is covered by golden + property tests (tests/test_sectionizer.py).
_CALK_ORACLE = """
WITH t AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS k
    FROM documents WHERE doc_id < 50
)
SELECT doc_id, '1' AS kode_calk, 'GENERAL' AS heading_calk,
       k[1] || ' ' || k[2] AS konten_calk FROM t
UNION ALL
SELECT doc_id, '1a', 'policy ' || k[3], k[4] || ' ' || k[5] FROM t
UNION ALL
SELECT doc_id, '1b', 'basis ' || k[6], 'd. skipped-not-consecutive ' || k[7] FROM t
UNION ALL
SELECT doc_id, '2', 'SIGNIFICANT ACCOUNTING POLICIES', k[8] || ' ' || k[9] FROM t
UNION ALL
SELECT doc_id, '3', 'EMPTY SECTION', k[10] FROM t
UNION ALL
SELECT doc_id, '4', 'FINAL', k[10] FROM t
"""


@register(
    "calk_sectionizer",
    oracle=_CALK_ORACLE,
    doc=(
        "CALK sectionizer (W4, mainTesting.py:500-636): groupBy(doc).applyInPandas "
        "state machine over synthetic CALK-shaped lines; hierarchical keys 1/1a/1b, "
        "heading continuation, non-consecutive letter rejection, backward fill."
    ),
)
def calk_sectionizer(spark, sf_dir: str) -> DataFrame:
    return sectionize(synthetic_calk_lines(spark, sf_dir))
