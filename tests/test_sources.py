"""Source plumbing tests (SURVEY.md §2.1): binaryFile -> mapInPandas
extraction for PDF pages/lines and Excel workbooks, page search with
non-consecutive pruning, sink idempotency. Binaries are deterministic
fakes (text pages / JSON workbooks) — the Spark plumbing is the thing
under test, the library decode is pluggable (pdf.py/excel.py)."""

import json

import pytest

from etl_financial_report_spark.plans import formatted_plan
from etl_financial_report_spark.sources.excel import (
    find_sheet_with_keyword,
    read_workbook_cells,
    sheet_as_kv,
)
from etl_financial_report_spark.sources.pdf import (
    find_pages_with_keyword,
    first_contiguous_run,
    lines_contain_keyword,
    pages_to_lines,
    read_pdf_pages,
)


@pytest.fixture(scope="module")
def pdf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdfs")
    # doc A: keyword on pages 4,5,9 -> prune keeps {4,5} (FIXTURES.md B7)
    pages_a = ["filler"] * 9
    for p in (4, 5, 9):
        pages_a[p - 1] = f"CATATAN ATAS LAPORAN KEUANGAN page {p}\nsecond   line\n\nlain)"
    (d / "a.pdf").write_text("\f".join(pages_a))
    # doc B: mixed-case keyword hit (case-insensitive search, M:240-254)
    (d / "b.pdf").write_text("Catatan Atas laporan keuangan\nmore")
    return str(d)


def test_read_pages_and_lines(spark, pdf_dir):
    pages = read_pdf_pages(spark, pdf_dir)
    assert pages.count() == 10  # 9 + 1
    lines = pages_to_lines(pages)
    row = (
        lines.where(lines.path.endswith("a.pdf") & (lines.page_no == 4) & (lines.line_no == 1))
        .collect()[0]
    )
    # whitespace collapsed, blanks dropped (mainTesting.py:275-280)
    assert row.line == "second line"
    assert lines.where("line = ''").count() == 0


def test_page_search_and_prune(spark, pdf_dir):
    pages = read_pdf_pages(spark, pdf_dir)
    found = find_pages_with_keyword(pages, "catatan atas")
    a_pages = sorted(
        r.page_no for r in found.where(found.path.endswith("a.pdf")).collect()
    )
    assert a_pages == [4, 5, 9]
    kept = first_contiguous_run(found)
    a_kept = sorted(r.page_no for r in kept.where(kept.path.endswith("a.pdf")).collect())
    assert a_kept == [4, 5]  # 9 dropped: gap > 1 (mainTesting.py:231-238)
    # case-insensitive hit on doc B
    assert kept.where(kept.path.endswith("b.pdf")).count() == 1


def test_lines_keyword_scan(spark, pdf_dir):
    lines = pages_to_lines(read_pdf_pages(spark, pdf_dir))
    docs = lines_contain_keyword(lines, "LAIN)")
    assert docs.count() == 1  # only doc A has "lain)"


@pytest.fixture(scope="module")
def xlsx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wb")
    wb = {
        "1000000": [
            ["Kode entitas", "BBNI"],
            ["Nama entitas", "Bank Negara Indonesia (Persero) Tbk"],
            ["Periode penyampaian laporan keuangan", "Kuartal II / Second Quarter"],
            ["Tanggal awal periode berjalan", "2023-01-01"],
        ],
        "2000000": [["judul", ""], ["Laporan Neraca", ""], ["Kas", "100"]],
    }
    (d / "f.xlsx").write_text(json.dumps(wb))
    return str(d)


def test_workbook_cells_and_sheet_discovery(spark, xlsx_dir):
    cells = read_workbook_cells(spark, xlsx_dir)
    found = find_sheet_with_keyword(cells, "kode entitas")
    assert found.collect()[0].sheet == "1000000"  # S2 (mainTesting.py:379-389)
    found2 = find_sheet_with_keyword(cells, "laporan neraca")
    assert found2.collect()[0].sheet == "2000000"


def test_sheet_as_kv(spark, xlsx_dir):
    cells = read_workbook_cells(spark, xlsx_dir)
    kv = sheet_as_kv(cells, "1000000")
    d = {r.label: r.value for r in kv.collect()}
    assert d["Kode entitas"] == "BBNI"
    assert d["Tanggal awal periode berjalan"] == "2023-01-01"


def test_parquet_sink_idempotent(spark, tmp_path):
    from etl_financial_report_spark.sources.sinks import ParquetSink

    sink = ParquetSink(str(tmp_path / "facts"))
    df = spark.createDataFrame(
        [("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Kas", 100.0, None)],
        "kode_emiten string, nama_emiten string, tahun int, quartal int, "
        "grup_laporan_keuangan string, item string, nilai double, notes string",
    )
    sink.append_idempotent(df)
    sink.append_idempotent(df)  # J3 guard: second append is a no-op
    assert sink.read(spark).count() == 1
    # a new quarter's group does land
    df2 = df.withColumn("quartal", df.quartal + 1)
    sink.append_idempotent(df2)
    assert sink.read(spark).count() == 2


def test_pdf_table_extraction_bbox(spark, tmp_path):
    from etl_financial_report_spark.sources.pdf import read_pdf_tables

    d = tmp_path / "tbl"
    d.mkdir()
    page1 = "title line\nAset\tNotes\t2023\nKas\t2a\t100\nprose after"
    page2 = "header\nonly prose here"
    (d / "t.pdf").write_text("\f".join([page1, page2]))

    tables = read_pdf_tables(spark, str(d))
    rows = tables.orderBy("page_no", "table_no", "row_no").collect()
    assert len(rows) == 2  # one table, two rows, only on page 1
    assert rows[0].cells == ["Aset", "Notes", "2023"]
    assert rows[1].cells == ["Kas", "2a", "100"]

    # bbox bounds the scanned line range (S7 vs S8 region semantics)
    header_only = read_pdf_tables(spark, str(d), bbox=(0, 0, 1, 595))
    assert header_only.count() == 1  # row "Aset..." at line 1; "Kas" line is out
    # page pre-filter: no tables on page 2
    assert read_pdf_tables(spark, str(d), pages=[2]).count() == 0


def test_crop_below_keyword(spark, tmp_path):
    from etl_financial_report_spark.sources.pdf import crop_below_keyword, pages_to_lines, read_pdf_pages

    d = tmp_path / "crop"
    d.mkdir()
    # boundary word "lain)" at line_no 2 on page 1; pages keep lines > 2
    p1 = "CATATAN ATAS LAPORAN KEUANGAN\n(dinyatakan dalam rupiah, kecuali dinyatakan lain)\ncontent A\ncontent B"
    p2 = "heading repeat\nsub head\ncontent C"
    (d / "c.pdf").write_text("\f".join([p1, p2]))
    lines = pages_to_lines(read_pdf_pages(spark, str(d)))
    cropped = crop_below_keyword(lines, "lain)")
    got = sorted((r.page_no, r.line) for r in cropped.collect())
    assert got == [(1, "content A"), (1, "content B"), (2, "content C")]


def test_excel_sink_roundtrip(spark, tmp_path):
    from etl_financial_report_spark.sources.excel import read_workbook_cells, write_workbook

    df = spark.createDataFrame([("Kas", 100.0), ("Piutang", 250.5)], "item string, nilai double")
    out = tmp_path / "report.xlsx"
    write_workbook(df, str(out), sheet="laporan")
    cells = read_workbook_cells(spark, str(tmp_path))
    grid = {(r.row_no, r.col_no): r.cell for r in cells.where("sheet = 'laporan'").collect()}
    assert grid[(0, 0)] == "item" and grid[(0, 1)] == "nilai"  # header row
    assert grid[(1, 0)] == "Kas" and grid[(1, 1)] == "100.0"


def test_bilingual_half_crop(spark, tmp_path):
    from etl_financial_report_spark.sources.pdf import bilingual_half_crop, pages_to_lines, read_pdf_pages

    d = tmp_path / "bi"
    d.mkdir()
    # doc A: bilingual (GENERAL on page 1) -> lines halved at the char
    # midpoint; doc B untouched. Fixture lines are built so the Indonesian
    # column is exactly the left half.
    (d / "a.pdf").write_text("1. UMUM GENERAL\nkas dan setara cash equivale")
    (d / "b.pdf").write_text("1. UMUM saja\nkas dan setara kas")
    lines = pages_to_lines(read_pdf_pages(spark, str(d)))
    got = {(r.path.split("/")[-1], r.line_no): r.line for r in bilingual_half_crop(lines).collect()}
    assert got[("a.pdf", 0)] == "1. UMUM"             # left half kept
    assert got[("a.pdf", 1)] == "kas dan setara"
    assert got[("b.pdf", 1)] == "kas dan setara kas"  # non-bilingual untouched


def test_parquet_sink_partition_pruning(spark, tmp_path):
    """The tahun/quartal layout must actually prune: a tahun filter reads
    only that partition (PartitionFilters in the scan, not a post-filter)."""
    from etl_financial_report_spark.sources.sinks import ParquetSink

    sink = ParquetSink(str(tmp_path / "facts"))
    rows = [
        ("BBNI", "PT BNI", y, q, "Laporan Neraca", f"item {y}{q}", 1.0, None)
        for y in (2022, 2023)
        for q in (1, 2)
    ]
    df = spark.createDataFrame(
        rows,
        "kode_emiten string, nama_emiten string, tahun int, quartal int, "
        "grup_laporan_keuangan string, item string, nilai double, notes string",
    )
    sink.append(df)
    scan = sink.read(spark).where("tahun = 2023 AND quartal = 2")
    plan = formatted_plan(scan)
    assert "PartitionFilters" in plan
    assert "(tahun" in plan.split("PartitionFilters")[1][:200]  # filter reached the scan
    assert scan.count() == 1
