"""Excel workbook sources (SURVEY.md §2.1 S1-S3).

Reference behavior: read one worksheet into a frame
(``baca_file_excel``, mainTesting.py:456-458), discover the sheet whose
cells contain a keyword (``cari_sheet_excel``, mainTesting.py:379-389),
read the fixed general-info sheet (test_uploadPDF.py:151).

Spark shape: workbooks are small driver-side artifacts in the reference;
at scale they arrive as a ``binaryFile`` scan with a per-file extractor
(same pattern as pdf.py). The workbook decoder is pluggable: openpyxl
when importable, else a JSON fallback ({sheet_name: [[cell, ...], ...]})
used by tests. Sheet rows get explicit ``row_no`` minted at the source —
pandas positional idioms (P1/P2) need real order columns in Spark.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: sheet decoder: bytes -> {sheet_name: [[cell_value, ...], ...]}
WorkbookDecoder = Callable[[bytes], dict[str, list[list[str]]]]

CELLS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("sheet", T.StringType()),
        T.StructField("row_no", T.IntegerType()),
        T.StructField("col_no", T.IntegerType()),
        T.StructField("cell", T.StringType()),
    ]
)


def openpyxl_decoder(data: bytes) -> dict[str, list[list[str]]]:
    """Real XLSX decoding — openpyxl is not in this image; import-guarded."""
    import io

    import openpyxl  # noqa: F401

    wb = openpyxl.load_workbook(io.BytesIO(data), read_only=True, data_only=True)
    return {
        ws.title: [["" if c is None else str(c) for c in row] for row in ws.iter_rows(values_only=True)]
        for ws in wb.worksheets
    }


def json_decoder(data: bytes) -> dict[str, list[list[str]]]:
    """Deterministic fallback: the workbook is a JSON object of sheets."""
    obj = json.loads(data.decode("utf-8"))
    return {str(k): [[str(c) for c in row] for row in v] for k, v in obj.items()}


def default_decoder(data: bytes) -> dict[str, list[list[str]]]:
    try:
        return openpyxl_decoder(data)
    except ImportError:
        return json_decoder(data)


def read_workbook_cells(
    spark: SparkSession, path: str, decoder: WorkbookDecoder = default_decoder
) -> DataFrame:
    """binaryFile scan -> (path, sheet, row_no, col_no, cell) long frame.
    One task per workbook; everything downstream is relational."""
    binary = spark.read.format("binaryFile").load(path).select("path", "content")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for sheet, grid in decoder(bytes(content)).items():
                    for r, row in enumerate(grid):
                        for c, cell in enumerate(row):
                            rows.append((p, sheet, r, c, cell))
            yield pd.DataFrame(rows, columns=["path", "sheet", "row_no", "col_no", "cell"])

    return binary.mapInPandas(extract, CELLS_SCHEMA)


def find_sheet_with_keyword(cells: DataFrame, keyword: str) -> DataFrame:
    """S2: first sheet (per workbook) containing the keyword in any cell
    (mainTesting.py:379-389) — min over matching sheet names stands in
    for 'first' deterministically."""
    return (
        cells.where(F.lower("cell").contains(keyword.lower()))
        .groupBy("path")
        .agg(F.min("sheet").alias("sheet"))
    )


def sheet_as_kv(cells: DataFrame, sheet: str) -> DataFrame:
    """S3/P1: a (label, value) metadata sheet — columns 0 and 1 of the
    chosen sheet (mainTesting.py:413-431)."""
    wide = (
        cells.where(F.col("sheet") == sheet)
        .groupBy("path", "row_no")
        .pivot("col_no", [0, 1])
        .agg(F.first("cell"))
    )
    return wide.select(
        "path", "row_no", F.col("0").alias("label"), F.col("1").alias("value")
    )


def write_workbook(df: DataFrame, path: str, sheet: str = "Sheet1") -> None:
    """S15 Excel sink (test_uploadPDF.py:124 ``final_df.to_excel``).
    Without spark-excel/openpyxl jars in this image, the sink emits the
    same JSON workbook format ``json_decoder`` reads (sheet -> grid of
    cell strings), so write/read round-trips through the source path.
    Small-result sink by design: statements are per-issuer reports, not
    100 TB artifacts — collect to the driver is the correct shape."""
    header = [list(df.columns)]
    grid = header + [["" if v is None else str(v) for v in row] for row in df.collect()]
    with open(path, "w") as f:
        json.dump({sheet: grid}, f)
