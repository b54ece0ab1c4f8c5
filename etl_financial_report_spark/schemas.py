"""Explicit StructTypes for every table the engine touches.

The reference infers schemas at every edge (pandas read_excel
mainTesting.py:457, tabula test_uploadPDF.py:33) and hand-patches the
failures (test_uploadPDF.py:54-57). Production Spark rule: schemas are
declared, never inferred (SURVEY.md §1.2).

Two groups:
  * driver test tables (TPC-H-ish star + events/documents/embeddings) —
    mirrors the parquet footers in /root/testdata (FIXTURES.md Group A);
  * reference-domain tables — the EAV fact table
    ``tb_laporan_keuangan`` (mainTesting.py:49,145), the CALK tree table
    ``tb_catatan_atas_laporan_keuangan`` (mainTesting.py:673-677), and the
    intermediate line/metadata frames (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- driver tables

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON, e.g. {"k": 87}
    ]
)

# schema of the JSON inside events.props, for from_json
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType())])

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

DRIVER_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ------------------------------------------------------- reference-domain tables

#: EAV fact table — one row per financial-statement line item, keyed by
#: (kode_emiten, tahun, quartal, grup_laporan_keuangan, item).
#: Columns per the INSERT at mainTesting.py:49 / SELECT at mainTesting.py:102-111.
#: ``nilai`` is DecimalType to survive the ×1e6 unit scaling
#: (mainTesting.py:55-57) without double drift at 100 TB.
FACT_STATEMENT = T.StructType(
    [
        T.StructField("kode_emiten", T.StringType()),
        T.StructField("nama_emiten", T.StringType()),
        T.StructField("tahun", T.IntegerType()),
        T.StructField("quartal", T.IntegerType()),
        T.StructField("grup_laporan_keuangan", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("nilai", T.DecimalType(38, 2)),
        T.StructField("notes", T.StringType()),
    ]
)

#: CALK notes tree flattened to rows — hierarchical key like 1, 2a, 2ab
#: (mainTesting.py:673-677; key synthesis mainTesting.py:557-560,584-591,614-621).
CALK = T.StructType(
    [
        T.StructField("kode_emiten", T.StringType()),
        T.StructField("kode_calk", T.StringType()),
        T.StructField("heading_calk", T.StringType()),
        T.StructField("konten_calk", T.StringType()),
    ]
)

#: Ordered text lines extracted from a PDF — replaces the reference's
#: Python-list order (ambil_teks_di_halaman, mainTesting.py:256-287) with
#: explicit (page_no, line_no); order is load-bearing for the lead-1/lead-2
#: note lookups (mainTesting.py:124,152).
PDF_TEXT_LINES = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("grup", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("line_no", T.IntegerType()),
        T.StructField("line", T.StringType()),
    ]
)

#: Page-level text (page-search operators, mainTesting.py:217-254).
PDF_PAGES = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("page_text", T.StringType()),
    ]
)

#: IDX general-information sheet as (label, value) rows
#: (mainTesting.py:413-431; sheet "1000000" test_uploadPDF.py:151).
GENERAL_INFO = T.StructType(
    [
        T.StructField("file_id", T.StringType()),
        T.StructField("row_no", T.IntegerType()),
        T.StructField("label", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

#: One financial-statement sheet in long form (mainTesting.py:456-471);
#: first 3 rows are preamble (mainTesting.py:54).
STATEMENT_LINES = T.StructType(
    [
        T.StructField("file_id", T.StringType()),
        T.StructField("grup", T.StringType()),
        T.StructField("row_no", T.IntegerType()),
        T.StructField("item", T.StringType()),
        T.StructField("nilai", T.DoubleType()),
    ]
)
