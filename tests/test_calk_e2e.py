"""EP3 end-to-end (mainTesting.py:799-819 -> 500-636): synthetic PDF
binaries through the REAL source path — binaryFile scan, page/line
explosion, boundary crop, sectionizer, backward fill — asserting the
exact CALK table rows. The unit tests cover each stage; this covers the
composition the reference runs as one button handler."""

from pyspark.sql import functions as F

from etl_financial_report_spark.operators.sectionizer import sectionize
from etl_financial_report_spark.sources.pdf import (
    crop_below_keyword,
    pages_to_lines,
    read_pdf_pages,
)

CALK_PDF = "\f".join(
    [
        # page 1: preamble above the boundary word, then sections
        "CATATAN ATAS LAPORAN KEUANGAN\n(dinyatakan dalam jutaan rupiah, kecuali dinyatakan lain)\n"
        "1. UMUM\npendirian bank dan informasi umum\na. pendirian\ndidirikan tahun 1946",
        # page 2: repeated title block (cropped like page 1's), then
        # letter continuation + next numeric section
        "CATATAN ATAS LAPORAN KEUANGAN\n(lanjutan / continued)\n"
        "b. kegiatan usaha\nperbankan umum\n2. IKHTISAR KEBIJAKAN\nAKUNTANSI\nkebijakan signifikan",
    ]
)


def test_calk_pipeline_end_to_end(spark, tmp_path):
    d = tmp_path / "calk"
    d.mkdir()
    (d / "BBNI.pdf").write_text(CALK_PDF)

    lines = pages_to_lines(read_pdf_pages(spark, str(d)))
    cropped = crop_below_keyword(lines, "lain)")
    # sectionizer contract: (doc_id, page_no, line_no, line)
    doc_lines = cropped.select(
        F.regexp_extract("path", r"([A-Z]{4})\.pdf$", 1).alias("doc_id"),  # F5 issuer-from-filename
        "page_no",
        "line_no",
        "line",
    )
    sections = sectionize(doc_lines).orderBy("kode_calk")
    got = [(r.kode_calk, r.heading_calk, r.konten_calk) for r in sections.collect()]
    assert got == [
        ("1", "UMUM", "pendirian bank dan informasi umum"),
        ("1a", "pendirian", "didirikan tahun 1946"),
        ("1b", "kegiatan usaha", "perbankan umum"),
        # heading continuation: uppercase line "AKUNTANSI" extends heading 2
        ("2", "IKHTISAR KEBIJAKAN AKUNTANSI", "kebijakan signifikan"),
    ]
    # issuer key extracted from the filename, reference-style
    assert sections.select("doc_id").distinct().collect()[0].doc_id == "BBNI"
