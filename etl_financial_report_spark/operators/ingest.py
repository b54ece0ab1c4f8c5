"""The three reference entry-point pipelines (SURVEY.md §3) as composable
DataFrame transforms over the domain schemas (schemas.py):

  * EP1 statement ingest   — general-info metadata x statement lines ->
    EAV fact rows (preamble skip, null fill, unit scaling, idempotent
    anti-join append)   [proses_files_excel -> masukkan_ke_database,
    mainTesting.py:391-471,38-86]
  * EP2 notes enrichment   — PDF text lines ⋈ fact rows (equi+contains),
    lead-1/lead-2 note lookup, comma-split explode: element 0 updates the
    matched row's notes, elements 1+ insert zero-value rows
    [cocokkan_database_pdf, mainTesting.py:88-185]
  * EP3 CALK parse         — see sectionizer.py.

Each stage is a pure DataFrame -> DataFrame function so the pipelines
compose and the pieces stay independently testable. The reference's
per-row INSERT+COMMIT and per-line SELECT round trips (anti-baseline,
BASELINE.md) have no equivalent here: one join, one write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.finance import money, scale_units
from .windows import NOTE_PATTERN

# ------------------------------------------------------------ EP1 stages

#: statement-group titles (mainTesting.py:12)
STATEMENT_GROUPS = ("Laporan Neraca", "Laporan Laba Rugi", "Laporan Arus Kas")

#: preamble rows per sheet before data starts (mainTesting.py:54)
PREAMBLE_ROWS = 3


def extract_metadata(general_info: DataFrame) -> DataFrame:
    """(file_id, row_no, label, value) rows -> one wide metadata row per
    file: issuer code/name, quarter (+unique-Q4 flag), year
    (mainTesting.py:413-431; quarter mapping 421-429; year 430-431).
    Name normalization: prefix 'PT ' unless already present
    (mainTesting.py:418-419)."""
    label = F.lower(F.trim(F.col("label")))
    val = F.trim(F.col("value"))
    pivoted = (
        general_info.groupBy("file_id")
        .agg(
            F.max(F.when(label == "kode entitas", val)).alias("kode_emiten"),
            F.max(F.when(label == "nama entitas", val)).alias("raw_nama"),
            F.max(F.when(label == "periode penyampaian laporan keuangan", val)).alias("periode"),
            F.max(F.when(label == "tanggal awal periode berjalan", val)).alias("tanggal_awal"),
        )
    )
    periode = F.lower(F.col("periode"))
    quartal = (
        F.when(periode.contains("kuartal i ") | periode.contains("first"), 1)
        .when(periode.contains("kuartal ii ") | periode.contains("second"), 2)
        .when(periode.contains("kuartal iii") | periode.contains("third"), 3)
        .otherwise(4)
    )
    return pivoted.select(
        "file_id",
        "kode_emiten",
        F.when(F.upper(F.substring("raw_nama", 1, 2)) == "PT", F.col("raw_nama"))
        .otherwise(F.concat(F.lit("PT "), F.col("raw_nama")))
        .alias("nama_emiten"),
        quartal.alias("quartal"),
        (quartal == 4).alias("kuartal_unik"),
        F.substring("tanggal_awal", 1, 4).cast("int").alias("tahun"),
    )


def statement_facts(statement_lines: DataFrame, metadata: DataFrame) -> DataFrame:
    """Statement sheet lines -> EAV fact rows: skip preamble (P2), fill
    null values with 0 (F16), scale millions -> absolute unless the
    unique-Q4 flag (F12), attach file metadata (broadcast join — the
    metadata side is one row per file)."""
    w = Window.partitionBy("file_id", "grup").orderBy("row_no")
    data_rows = (
        statement_lines.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > PREAMBLE_ROWS)
        .drop("rn")
    )
    joined = data_rows.join(F.broadcast(metadata), "file_id")
    nilai = scale_units(
        money(F.coalesce(F.col("nilai"), F.lit(0.0))), F.col("kuartal_unik")
    )
    return joined.select(
        "kode_emiten",
        "nama_emiten",
        "tahun",
        "quartal",
        F.col("grup").alias("grup_laporan_keuangan"),
        F.col("item"),
        nilai.cast("decimal(38,2)").alias("nilai"),
        F.lit(None).cast("string").alias("notes"),
    )


FACT_KEY = ["kode_emiten", "tahun", "quartal", "grup_laporan_keuangan"]


def idempotent_append(incoming: DataFrame, existing: DataFrame) -> DataFrame:
    """J3 guard (mainTesting.py:693-729): drop any incoming *group* whose
    key already exists — whole statement groups are the ingest unit, like
    the reference's status_* flags (mainTesting.py:53,63,73)."""
    present = existing.select(*FACT_KEY).distinct()
    return incoming.join(present, FACT_KEY, "left_anti")


# ------------------------------------------------------------ EP2 stages


def with_lookahead(lines: DataFrame) -> DataFrame:
    """Mint lead-1/lead-2 columns over explicit line order (J2/W1) —
    replaces teks[index+1] / teks[index+2] (mainTesting.py:124,152)."""
    w = Window.partitionBy("doc_id", "grup").orderBy("page_no", "line_no")
    return lines.select(
        "*",
        F.lead("line", 1).over(w).alias("next1"),
        F.lead("line", 2).over(w).alias("next2"),
    )


def match_notes(lines: DataFrame, facts: DataFrame) -> DataFrame:
    """J1: equi-prejoin on the statement keys, contains() residual, then
    pick the note from the first following line matching the note pattern
    (mainTesting.py:99-152). Returns (fact keys..., item, note)."""
    led = with_lookahead(lines)
    note = F.when(F.col("next1").rlike(NOTE_PATTERN), F.col("next1")).when(
        F.col("next2").rlike(NOTE_PATTERN), F.col("next2")
    )
    candidates = led.select("doc_id", "grup", "line", note.alias("note")).where(
        F.col("note").isNotNull() & (F.trim("line") != "")
    )
    return (
        facts.alias("f")
        .join(
            candidates.alias("c"),
            (F.col("f.kode_emiten") == F.col("c.doc_id"))
            & (F.col("f.grup_laporan_keuangan") == F.col("c.grup"))
            & F.lower(F.col("f.item")).contains(F.lower(F.col("c.line"))),
        )
        .select("f.kode_emiten", "f.tahun", "f.quartal", "f.grup_laporan_keuangan", "f.item", "c.note")
    )


def explode_notes(matches: DataFrame) -> DataFrame:
    """F8: split the comma-separated note; position 0 is an update to the
    matched row, positions 1+ become new zero-value rows
    (mainTesting.py:127-177)."""
    return matches.select(
        "kode_emiten",
        "tahun",
        "quartal",
        "grup_laporan_keuangan",
        "item",
        F.posexplode(F.split("note", ",")).alias("pos", "note_element"),
    ).select(
        "*", (F.col("pos") == 0).alias("is_update")
    )


def merge_notes(facts: DataFrame, matches: DataFrame) -> DataFrame:
    """Apply EP2 results to the fact table without a mutable store
    (S14 — the reference's row-wise UPDATE, mainTesting.py:130-143):
    update-path rows overwrite notes via left join; insert-path rows append
    with nilai=0 (mainTesting.py:145-149). With a Delta/Iceberg sink this
    is MERGE INTO; the pure-DataFrame form keeps the engine storage-free."""
    exploded = explode_notes(matches)
    key = ["kode_emiten", "tahun", "quartal", "grup_laporan_keuangan", "item"]
    updates = (
        exploded.where("is_update")
        .groupBy(*key)
        .agg(F.min("note_element").alias("new_note"))
    )
    updated = (
        facts.join(updates, key, "left")
        .withColumn("notes", F.coalesce(F.col("new_note"), F.col("notes")))
        .drop("new_note")
    )
    inserts = (
        exploded.where(~F.col("is_update"))
        .join(facts.select(*key, "nama_emiten").dropDuplicates(key), key, "left")
        .select(
            "kode_emiten",
            F.coalesce("nama_emiten", F.lit("")).alias("nama_emiten"),
            "tahun",
            "quartal",
            "grup_laporan_keuangan",
            F.concat(F.col("item"), F.lit(" (nota "), F.col("note_element"), F.lit(")")).alias("item"),
            F.lit(0).cast("decimal(38,2)").alias("nilai"),
            F.col("note_element").alias("notes"),
        )
    )
    return updated.unionByName(inserts)
