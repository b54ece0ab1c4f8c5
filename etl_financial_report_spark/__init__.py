"""etl_financial_report_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference repo ``Nyomantayo/ETL-Financial-Report`` (a desktop ETL pipeline
for Indonesian stock-exchange quarterly filings; see ``SURVEY.md``),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst/AQE, Pandas UDFs only where built-ins genuinely cannot express
the semantics (PDF/Excel binary extraction, the CALK sectionizer state
machine), plus the LLM-data-pipeline operator surface (dedup, similarity
search, multimodal columns, text analysis) required by the north star.

Layout:
    session.py    SparkSession builder + runtime-conf prep for foreign sessions
    schemas.py    explicit StructTypes (never infer in production paths)
    io.py         parquet readers for the driver test tables
    registry.py   the queries()/oracle_sql() registry the driver consumes
    operators/    relational core, windows, sectionizer, dedup, similarity, text
    functions/    composable column helpers (text, finance, vectors, hashing)
    sources/      pdf / excel / jdbc / multimodal source & sink plumbing
    plans/        plan-inspection helpers (pushdown / broadcast assertions)
    streaming/    Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
