"""EP1/EP2 pipeline tests on FIXTURES.md Group B shaped literal frames,
plus hypothesis property tests (SURVEY.md §5.4): ingest idempotency,
unit-scaling invariant, CALK letter-key monotonicity."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_financial_report_spark.operators.ingest import (
    extract_metadata,
    idempotent_append,
    match_notes,
    merge_notes,
    statement_facts,
)
from etl_financial_report_spark.operators.sectionizer import parse_lines

GI = [
    ("F1", 1, "Kode entitas", "BBNI"),
    ("F1", 2, "Nama entitas", "Bank Negara Indonesia (Persero) Tbk"),
    ("F1", 3, "Periode penyampaian laporan keuangan", "Kuartal II / Second Quarter"),
    ("F1", 4, "Tanggal awal periode berjalan", "2023-01-01"),
    ("F2", 1, "Kode entitas", "TLKM"),
    ("F2", 2, "Nama entitas", "PT Telkom Indonesia Tbk"),
    ("F2", 3, "Periode penyampaian laporan keuangan", "Tahunan / Annual"),
    ("F2", 4, "Tanggal awal periode berjalan", "2022-01-01"),
]


@pytest.fixture(scope="module")
def metadata(spark):
    gi = spark.createDataFrame(GI, "file_id string, row_no int, label string, value string")
    return extract_metadata(gi).cache()


def test_extract_metadata(metadata):
    m = {r.file_id: r for r in metadata.collect()}
    # 'PT ' prefix added only when missing (mainTesting.py:418-419)
    assert m["F1"].nama_emiten == "PT Bank Negara Indonesia (Persero) Tbk"
    assert m["F2"].nama_emiten == "PT Telkom Indonesia Tbk"
    assert (m["F1"].quartal, m["F1"].kuartal_unik) == (2, False)
    # annual filing -> Q4 + unique flag (mainTesting.py:427-429)
    assert (m["F2"].quartal, m["F2"].kuartal_unik) == (4, True)
    assert m["F1"].tahun == 2023


def test_statement_facts_scaling_and_preamble(spark, metadata):
    rows = [
        # 3 preamble rows then data (mainTesting.py:54); null nilai -> 0 (F16)
        ("F1", "Laporan Neraca", i, f"pre{i}", None)
        for i in range(3)
    ] + [
        ("F1", "Laporan Neraca", 3, "Kas dan setara kas", 145230.0),
        ("F1", "Laporan Neraca", 4, "Giro pada BI", None),
        ("F2", "Laporan Neraca", 0, "pre", None),
        ("F2", "Laporan Neraca", 1, "pre", None),
        ("F2", "Laporan Neraca", 2, "pre", None),
        ("F2", "Laporan Neraca", 3, "Kas", 99.0),
    ]
    sl = spark.createDataFrame(
        rows, "file_id string, grup string, row_no int, item string, nilai double"
    )
    facts = statement_facts(sl, metadata)
    got = {(r.kode_emiten, r.item): float(r.nilai) for r in facts.collect()}
    assert len(got) == 3  # preamble rows dropped
    assert got[("BBNI", "Kas dan setara kas")] == 145230.0 * 1_000_000  # millions -> absolute
    assert got[("BBNI", "Giro pada BI")] == 0.0
    assert got[("TLKM", "Kas")] == 99.0  # unique-Q4: no scaling (F12)


def test_ep2_match_explode_merge(spark):
    facts = spark.createDataFrame(
        [
            ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Kas dan setara kas", 100.0, None),
            ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Giro pada Bank Indonesia", 50.0, None),
            ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Unmatched item", 1.0, None),
        ],
        "kode_emiten string, nama_emiten string, tahun int, quartal int, "
        "grup_laporan_keuangan string, item string, nilai double, notes string",
    )
    # FIXTURES.md B3: line 11 -> lead-1 note with comma split; lines 13-15
    # -> lead-2 fallback past a garbage line; near-misses must not match.
    lines = spark.createDataFrame(
        [
            ("BBNI", "Laporan Neraca", 1, 10, "Kas dan setara kas"),
            ("BBNI", "Laporan Neraca", 1, 11, "2,2b"),  # first element must be bare (M:197 regex)
            ("BBNI", "Laporan Neraca", 1, 12, "145.230"),
            ("BBNI", "Laporan Neraca", 1, 13, "Giro pada Bank Indonesia"),
            ("BBNI", "Laporan Neraca", 1, 14, "(garbage line)"),
            ("BBNI", "Laporan Neraca", 1, 15, "3"),
            ("BBNI", "Laporan Neraca", 1, 16, "2A"),   # near-miss: uppercase
            ("BBNI", "Laporan Neraca", 1, 17, "102"),  # near-miss: 3 digits
        ],
        "doc_id string, grup string, page_no int, line_no int, line string",
    )
    matches = match_notes(lines, facts)
    got = {r.item: r.note for r in matches.collect()}
    assert got == {"Kas dan setara kas": "2,2b", "Giro pada Bank Indonesia": "3"}

    merged = merge_notes(facts, matches)
    out = {r.item: (r.notes, float(r.nilai)) for r in merged.collect()}
    assert out["Kas dan setara kas"] == ("2", 100.0)  # element 0 updates notes
    assert out["Giro pada Bank Indonesia"] == ("3", 50.0)
    assert out["Unmatched item"] == (None, 1.0)
    # element 1+ -> new zero-value row (mainTesting.py:145-149)
    inserted = [k for k in out if "nota 2b" in k]
    assert len(inserted) == 1 and out[inserted[0]] == ("2b", 0.0)


def test_idempotent_append_group_granularity(spark):
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        "kode_emiten string, nama_emiten string, tahun int, quartal int, "
        "grup_laporan_keuangan string, item string, nilai double, notes string",
    )
    existing = mk([("BBNI", "x", 2023, 2, "Laporan Neraca", "Kas", 1.0, None)])
    incoming = mk(
        [
            ("BBNI", "x", 2023, 2, "Laporan Neraca", "NEW ITEM", 9.0, None),  # same group
            ("BBNI", "x", 2023, 3, "Laporan Neraca", "Kas", 2.0, None),  # new quarter
        ]
    )
    out = idempotent_append(incoming, existing).collect()
    # whole-group dedupe: the same-(emiten,year,quarter,grup) row is dropped
    assert [(r.quartal, r.item) for r in out] == [(3, "Kas")]


# ------------------------------------------------------------- properties


@given(
    nilai=st.floats(min_value=0, max_value=1e9, allow_nan=False).map(lambda x: round(x, 2)),
    unik=st.booleans(),
)
@settings(max_examples=20, deadline=None)
def test_scaling_invariant(nilai, unik):
    """F12 invariant: unique-Q4 => identity, else exactly x1e6 (no drift)."""
    from decimal import Decimal

    from etl_financial_report_spark.functions.finance import money, scale_units

    spark = get_cached_spark()
    df = spark.createDataFrame([(nilai, unik)], "nilai double, unik boolean")
    out = df.select(scale_units(money("nilai"), F.col("unik")).alias("v")).collect()[0].v
    expected = Decimal(str(nilai)).quantize(Decimal("0.01"))
    if not unik:
        expected *= 1_000_000
    assert Decimal(out) == expected


_spark_singleton = None


def get_cached_spark():
    global _spark_singleton
    if _spark_singleton is None:
        from etl_financial_report_spark.session import get_spark

        _spark_singleton = get_spark("tests")
    return _spark_singleton


@given(
    st.lists(
        st.sampled_from(
            ["1. ALPHA", "2. BETA", "a. one", "b. two", "c. three", "plain content", "MORE CAPS"]
        ),
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_calk_letter_keys_monotonic(lines):
    """W4 property: within each numeric section, emitted letter suffixes
    are consecutive starting at 'a' (mainTesting.py:566-570)."""
    rows = parse_lines("D", lines)
    expected_next = "a"
    cur_num = None
    for _, _, key, _, _ in rows:
        num = "".join(ch for ch in key if ch.isdigit())
        suffix = key[len(num):]
        if not suffix:
            cur_num = num  # new numeric section resets the letter sequence
            expected_next = "a"
        else:
            assert num == cur_num
            assert suffix == expected_next
            expected_next = chr(ord(expected_next) + 1)
