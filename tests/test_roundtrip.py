"""Structural invariants for the clustering and reshaping operators —
properties the DuckDB value-hash can't express directly (SURVEY.md §5.4).
"""

from pyspark.sql import functions as F

from etl_financial_report_spark.operators.dedup import (
    dedup_components,
    dedup_minhash_lsh_pairs,
)
from etl_financial_report_spark.operators.relational import (
    flagship_statement_report,
    p_pivot_statement,
    p_unpivot_statement,
)


def test_components_cover_every_doc_once(spark, sf_dir):
    comp = dedup_components(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert comp.count() == docs.count()
    assert comp.select("doc_id").distinct().count() == docs.count()


def test_components_agree_on_every_candidate_pair(spark, sf_dir):
    """The defining property: two docs joined by any LSH candidate edge end
    up in the same component."""
    comp = dedup_components(spark, sf_dir)
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    joined = (
        pairs.join(comp.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("component", "comp_a")
        .join(comp.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("component", "comp_b")
    )
    assert joined.where(F.col("comp_a") != F.col("comp_b")).count() == 0


def test_component_id_is_min_member(spark, sf_dir):
    comp = dedup_components(spark, sf_dir)
    bad = (
        comp.groupBy("component")
        .agg(F.min("doc_id").alias("min_member"))
        .where(F.col("component") != F.col("min_member"))
    )
    assert bad.count() == 0


def test_pivot_unpivot_roundtrip(spark, sf_dir):
    """unpivot(pivot(long)) reproduces the quarterly aggregate the long
    frame came from (quartal label qN maps back to N; null cells drop)."""
    back = p_unpivot_statement(spark, sf_dir).select(
        "tahun",
        F.substring("quartal", 2, 1).cast("int").alias("quartal"),
        F.col("nilai").alias("revenue"),
    )
    want = flagship_statement_report(spark, sf_dir).select(
        "tahun", "quartal", F.col("total_nilai").alias("revenue")
    )
    # flagship filters to 1996-1997; compare on its year range only
    back_96_97 = back.where(F.col("tahun").between(1996, 1997))
    assert back_96_97.exceptAll(want).count() == 0
    assert want.exceptAll(back_96_97).count() == 0


def test_pivot_row_per_year(spark, sf_dir):
    wide = p_pivot_statement(spark, sf_dir)
    years = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.year("o_orderdate").alias("y"))
        .distinct()
        .count()
    )
    assert wide.count() == years
