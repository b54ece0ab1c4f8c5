"""PDF text sources (SURVEY.md §2.1 S4-S9).

Reference behavior being re-expressed:
  * page text extraction, blank-line drop, whitespace collapse
    (``ambil_teks_di_halaman``, mainTesting.py:256-287);
  * page search by keyword, case-insensitive (mainTesting.py:240-254);
  * non-consecutive-page pruning (mainTesting.py:217-238);
  * substring-containment scan over lines (mainTesting.py:289-295).

Spark shape: ``spark.read.format("binaryFile")`` scans the documents in
parallel (file = parallel unit — PDFs are non-splittable, SURVEY.md §7
hard-part 5), a ``mapInPandas`` extractor turns each binary into
``array<struct<page_no,text>>`` rows, and everything downstream —
line explosion with minted (page_no, line_no), keyword filters, page
pruning — is native DataFrame logic (windows.w2 is the pruning kernel).

The page extractor is pluggable: PyMuPDF (fitz) when importable, else a
plain-text decoder (pages split on form-feed ``\\f``) used by the test
suite; the orchestration around it is identical either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

PageExtractor = Callable[[bytes], list[str]]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("page_text", T.StringType()),
    ]
)


def fitz_extractor(data: bytes) -> list[str]:
    """Real PDF extraction via PyMuPDF — unavailable in this image, kept
    import-guarded (mirrors mainTesting.py:256-287)."""
    import fitz  # noqa: F401  (raises ImportError here when absent)

    doc = fitz.open(stream=data, filetype="pdf")
    return [doc.load_page(i).get_text() for i in range(doc.page_count)]


def text_extractor(data: bytes) -> list[str]:
    """Deterministic fallback: bytes are UTF-8 text, pages split on \\f."""
    return data.decode("utf-8", errors="replace").split("\f")


def default_extractor(data: bytes) -> list[str]:
    try:
        return fitz_extractor(data)
    except ImportError:
        return text_extractor(data)


def read_pdf_pages(
    spark: SparkSession, path: str, extractor: PageExtractor = default_extractor
) -> DataFrame:
    """binaryFile scan -> (path, page_no, page_text) rows; one task per
    file, Arrow-batched extraction, 1-based page numbers."""
    binary = spark.read.format("binaryFile").load(path).select("path", "content")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for i, text in enumerate(extractor(bytes(content))):
                    rows.append((p, i + 1, text))
            yield pd.DataFrame(rows, columns=["path", "page_no", "page_text"])

    return binary.mapInPandas(extract, PAGES_SCHEMA)


def pages_to_lines(pages: DataFrame) -> DataFrame:
    """S4 line discipline: split pages into lines, drop blanks, collapse
    whitespace, mint explicit (page_no, line_no) order columns."""
    lines = pages.select(
        "path",
        "page_no",
        F.posexplode(F.split("page_text", "\n")).alias("line_no", "line"),
    )
    return lines.select(
        "path",
        "page_no",
        "line_no",
        F.regexp_replace(F.trim("line"), r"\s+", " ").alias("line"),
    ).where(F.col("line") != "")


def find_pages_with_keyword(pages: DataFrame, keyword: str) -> DataFrame:
    """S5: case-insensitive page search (mainTesting.py:240-254)."""
    return pages.where(F.lower("page_text").contains(keyword.lower())).select("path", "page_no")


def first_contiguous_run(found: DataFrame) -> DataFrame:
    """S6: keep only the first contiguous page run per document
    (mainTesting.py:231-238) — the W2 kernel."""
    w = Window.partitionBy("path").orderBy("page_no")
    flagged = found.select(
        "path",
        "page_no",
        F.when(F.col("page_no") - F.lag("page_no").over(w) > 1, 1).otherwise(0).alias("brk"),
    )
    run = F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return flagged.withColumn("run_id", run).where(F.col("run_id") == 0).select("path", "page_no")


def lines_contain_keyword(lines: DataFrame, keyword: str) -> DataFrame:
    """P6: docs whose lines contain the keyword (mainTesting.py:289-295)."""
    return (
        lines.where(F.lower("line").contains(keyword.lower()))
        .select("path")
        .distinct()
    )


# ----------------------------------------------------- S7-S9: tables & crop

#: table extractor: (bytes, page_no (1-based), bbox or None) -> list of
#: tables, each a list of rows, each row a list of cell strings
TableExtractor = Callable[[bytes, int, "tuple[float, float, float, float] | None"], list]

TABLES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("table_no", T.IntegerType()),
        T.StructField("row_no", T.IntegerType()),
        T.StructField("cells", T.ArrayType(T.StringType())),
    ]
)


def pdfplumber_table_extractor(data, page_no, bbox):
    """Real bounded-region table extraction (test_uploadPDF.py:31-39 uses
    tabula with bbox [160,0,715,595]; pdfplumber's crop+extract_tables is
    the equivalent). Library absent in this image — import-guarded."""
    import io

    import pdfplumber  # noqa: F401  (ImportError here when absent)

    with pdfplumber.open(io.BytesIO(data)) as pdf:
        page = pdf.pages[page_no - 1]
        if bbox is not None:
            page = page.crop(bbox)
        return [t for t in page.extract_tables()]


def tsv_table_extractor(data, page_no, bbox):
    """Deterministic fallback: pages are \\f-separated text; a table is a
    maximal run of lines containing tabs; bbox (top, _, bottom, _) bounds
    the line range — the text-space analogue of the pixel bbox."""
    pages = data.decode("utf-8", errors="replace").split("\f")
    if page_no > len(pages):
        return []
    lines = pages[page_no - 1].split("\n")
    if bbox is not None:
        top, _, bottom, _ = bbox
        lines = lines[int(top) : int(bottom) + 1]
    tables, cur = [], []
    for ln in lines:
        if "\t" in ln:
            cur.append(ln.split("\t"))
        elif cur:
            tables.append(cur)
            cur = []
    if cur:
        tables.append(cur)
    return tables


def default_table_extractor(data, page_no, bbox):
    try:
        return pdfplumber_table_extractor(data, page_no, bbox)
    except ImportError:
        return tsv_table_extractor(data, page_no, bbox)


def read_pdf_tables(
    spark: SparkSession,
    path: str,
    pages: "list[int] | None" = None,
    bbox: "tuple[float, float, float, float] | None" = None,
    extractor: TableExtractor = default_table_extractor,
) -> DataFrame:
    """S7/S8 (test_uploadPDF.py:31-39): bounded-region table extraction
    over a binaryFile scan -> long (path, page_no, table_no, row_no,
    cells) frame. Page pre-filter before the expensive extraction is the
    caller's job (filter-before-UDF discipline, SURVEY.md §4) via
    ``pages``; file = parallel unit."""
    binary = spark.read.format("binaryFile").load(path).select("path", "content")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                n_pages = len(data.decode("utf-8", errors="replace").split("\f"))
                page_list = pages if pages is not None else range(1, n_pages + 1)
                for pg in page_list:
                    for ti, table in enumerate(extractor(data, pg, bbox)):
                        for ri, row in enumerate(table):
                            rows.append((p, pg, ti, ri, [str(c) for c in row]))
            yield pd.DataFrame(rows, columns=["path", "page_no", "table_no", "row_no", "cells"])

    return binary.mapInPandas(extract, TABLES_SCHEMA)


def crop_below_keyword(lines: DataFrame, keyword: str) -> DataFrame:
    """S9 (mainTesting.py:474-498): the reference finds the y-coordinate
    of a boundary word once, then crops every CALK page below it. The
    Spark shape: the boundary is a per-document scalar — the line_no of
    the keyword's first occurrence — broadcast-joined back; every page
    keeps only lines strictly below it."""
    hit = (
        lines.where(F.lower("line").contains(keyword.lower()))
        .groupBy("path")
        .agg(F.min(F.struct("page_no", "line_no")).alias("first_hit"))
        .select("path", F.col("first_hit.line_no").alias("boundary_line"))
    )
    return (
        lines.join(F.broadcast(hit), "path")
        .where(F.col("line_no") > F.col("boundary_line"))
        .select("path", "page_no", "line_no", "line")
    )


def bilingual_half_crop(lines: DataFrame, probe: str = "GENERAL") -> DataFrame:
    """Bilingual-layout handling (mainTesting.py:508-518): when the first
    page of a document shows the English column probe word, the reference
    crops every page to half width. Text-space analogue: per-document
    flag (broadcast) + keep the left half of each line's characters."""
    flagged = (
        lines.where((F.col("page_no") == 1) & F.col("line").contains(probe))
        .select("path")
        .distinct()
        .withColumn("bilingual", F.lit(True))
    )
    out = lines.join(F.broadcast(flagged), "path", "left")
    half = F.substring(F.col("line"), 1, (F.length("line") / 2).cast("int"))
    return out.select(
        "path",
        "page_no",
        "line_no",
        F.when(F.col("bilingual").isNotNull(), F.trim(half)).otherwise(F.col("line")).alias("line"),
    )
