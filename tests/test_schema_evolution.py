"""Schema evolution under explicit-schema reads: a directory holding
files written at different schema versions must read cleanly with the
CURRENT schema — old files surface null for columns they predate, and
no inference pass ever runs (the discipline sources/interchange.py
enforces; at 100 TB you cannot rewrite history when a column lands)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

V1 = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)
V2 = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.mark.parametrize("fmt", ["parquet", "json", "orc"])
def test_old_files_read_under_new_schema(spark, tmp_path, fmt):
    base = str(tmp_path / fmt)
    spark.createDataFrame([(1, "a"), (2, "b")], V1).write.format(fmt).save(
        base + "/batch=v1"
    )
    spark.createDataFrame([(3, "c", 0.5)], V2).write.format(fmt).save(
        base + "/batch=v2"
    )
    df = spark.read.format(fmt).schema(V2).load(base)
    assert df.count() == 3
    # rows from v1 files: score is null, not an error and not a type guess
    nulls = df.where(F.col("score").isNull()).select("id").collect()
    assert sorted(r["id"] for r in nulls) == [1, 2]
    assert df.where(F.col("id") == 3).collect()[0]["score"] == 0.5


def test_renamed_column_is_loud_not_silent(spark, tmp_path):
    # a RENAME is not evolution — reading old files under the new name
    # must yield nulls (parquet matches by name), which the pipeline's
    # null-audit catches; this test documents that contract
    base = str(tmp_path / "renamed")
    spark.createDataFrame([(1, "a")], V1).write.parquet(base)
    renamed = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("full_name", T.StringType())]
    )
    df = spark.read.schema(renamed).parquet(base)
    assert df.where(F.col("full_name").isNull()).count() == 1
