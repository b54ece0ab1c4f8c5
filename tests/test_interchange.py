"""Round-trip invariants for the interchange formats (sources/interchange.py):
every format must reproduce the exact rows, including hostile text (quotes,
commas, embedded newlines, unicode) and null, under an explicit schema.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from etl_financial_report_spark.plans import formatted_plan
from etl_financial_report_spark.sources.interchange import (
    FORMATS,
    read_corpus,
    write_corpus,
)

HOSTILE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

HOSTILE_ROWS = [
    Row(doc_id=1, text='plain words', score=0.5),
    Row(doc_id=2, text='comma, separated, values', score=-1.25),
    Row(doc_id=3, text='a "quoted" phrase', score=0.0),
    Row(doc_id=4, text="line one\nline two", score=2.0),
    Row(doc_id=5, text="unicode: laporan keuangan émet 報告", score=3.5),
    Row(doc_id=6, text=None, score=None),
]


@pytest.mark.parametrize("fmt", FORMATS)
def test_hostile_text_roundtrips(spark, tmp_path, fmt):
    df = spark.createDataFrame(HOSTILE_ROWS, HOSTILE_SCHEMA)
    path = str(tmp_path / f"corpus_{fmt}")
    write_corpus(df, path, fmt)
    back = read_corpus(spark, path, fmt, HOSTILE_SCHEMA)
    assert back.schema == HOSTILE_SCHEMA
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0


@pytest.mark.parametrize("fmt", FORMATS)
def test_documents_table_roundtrips(spark, sf_dir, tmp_path, fmt):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / f"docs_{fmt}")
    write_corpus(docs, path, fmt, codec="gzip" if fmt != "orc" else "zstd")
    back = read_corpus(spark, path, fmt, docs.schema)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_part")
    write_corpus(docs, path, "json", partition_by=("lang",))
    back = read_corpus(
        spark,
        path,
        "json",
        T.StructType([f for f in docs.schema.fields if f.name != "lang"]),
    ).where("1=1")
    # partition column becomes a directory; a filter on it must reach the
    # scan as a partition filter, not a post-scan predicate
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    pruned = spark.read.format("json").schema(
        T.StructType([f for f in docs.schema.fields if f.name != "lang"])
    ).load(path).where(f"lang = '{langs[0]}'")
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and langs[0] in plan
    assert back.count() == docs.count()


def test_unknown_format_is_loud(spark):
    with pytest.raises(ValueError):
        write_corpus(spark.range(1), "/tmp/x", "xml")


# --------------------------------------------------------------- property

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# surrogates can't survive UTF-8 files; everything else must round-trip,
# including quotes, commas, newlines, and the CSV escape char itself
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_text, min_size=1, max_size=8))
@pytest.mark.slow  # opt-in (driver test budget, optimization r15)
def test_interchange_roundtrips_arbitrary_text(spark, tmp_path_factory, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
        ),
    )
    base = tmp_path_factory.mktemp("prop")
    for fmt in ("json", "csv"):
        path = str(base / f"rt_{fmt}")
        write_corpus(df, path, fmt)
        back = read_corpus(spark, path, fmt, df.schema)
        assert back.exceptAll(df).count() == 0, fmt
        assert df.exceptAll(back).count() == 0, fmt
