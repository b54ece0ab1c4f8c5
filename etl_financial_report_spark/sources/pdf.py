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
