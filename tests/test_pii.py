"""PII detection/redaction: every pattern class must FIRE on engineered
PII (the constraint-report discipline — a rule that can't fire is
untested), the clean corpus must report zero, and the Spark (Java regex)
and DuckDB (RE2) implementations must agree byte-for-byte on the
engineered corpus including the documented tricky cases (email whose
host contains a dotted quad, boundary-adjacent punctuation)."""

import duckdb
from pyspark.sql import functions as F

from etl_financial_report_spark import registry
from etl_financial_report_spark.operators.quality import PII_PATTERNS


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


ENGINEERED = [
    (0, "contact alice.smith+spam@mail.example.co today"),        # email
    (1, "server at 10.0.255.3 rebooted"),                          # ipv4
    (2, "ssn 123-45-6789 on file"),                                # ssn
    (3, "call 555-123-4567 or 555.987.6543 now"),                  # 2 phones
    (4, "mixed: bob@host.org from 192.168.1.1, ssn 987-65-4321"),  # 3 classes
    (5, "email at quad host user@1.2.3.4.example.com stays one email"),
    (6, "no pii here at all"),
    (7, "almost: 1234-56-7890 12.34 555-12-34567 not matches"),
    (8, "reach me at 123.456.7890@example.com asap"),  # phone INSIDE email
]


def test_every_pii_class_fires_and_engines_agree(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, ENGINEERED)
    q = registry.all_queries()

    got_report = {
        r.doc_id: r.asDict() for r in q["text_pii_report"].fn(spark, sf).collect()
    }
    # each class fires at least once across the corpus
    for name, _, _ in PII_PATTERNS:
        assert sum(r[f"n_{name}"] for r in got_report.values()) > 0, name
    assert got_report[0]["n_email"] == 1
    assert got_report[1]["n_ipv4"] == 1
    assert got_report[2]["n_ssn"] == 1
    assert got_report[3]["n_phone"] == 2
    assert got_report[4]["has_pii"] and not got_report[6]["has_pii"]
    assert not got_report[7]["has_pii"]  # near-miss shapes must NOT match

    got_redact = {
        r.doc_id: r.asDict() for r in q["text_pii_redact"].fn(spark, sf).collect()
    }
    assert "<EMAIL>" in got_redact[0]["redacted"]
    assert "<IP>" in got_redact[1]["redacted"]
    assert "<SSN>" in got_redact[2]["redacted"]
    assert got_redact[3]["redacted"].count("<PHONE>") == 2
    assert got_redact[4]["n_redactions"] == 3
    assert got_redact[6]["redacted"] == "no pii here at all"
    # The classes OVERLAP: PII nested inside an email is counted by the
    # report (raw matches on the original text) but redacted only once by
    # the chain — n_redactions counts on the progressively-redacted text,
    # so it equals the replacements performed, NOT the report sum.
    for d in (5, 8):
        rep = got_report[d]
        assert sum(rep[f"n_{n}"] for n, _, _ in PII_PATTERNS) == 2, d  # overlap
        assert got_redact[d]["n_redactions"] == 1, d                   # one replace
        assert got_redact[d]["redacted"].count("<EMAIL>") == 1
        assert "<IP>" not in got_redact[d]["redacted"]
        assert "<PHONE>" not in got_redact[d]["redacted"]
    assert got_report[5]["n_ipv4"] == 1 and got_report[8]["n_phone"] == 1
    # invariant for EVERY doc: n_redactions == placeholder tokens emitted
    for d, r in got_redact.items():
        emitted = sum(r["redacted"].count(tok) for _, _, tok in PII_PATTERNS)
        assert r["n_redactions"] == emitted, d

    # Java-regex vs RE2 agreement: run the registered oracles on the SAME
    # engineered corpus and compare every cell
    con = duckdb.connect()
    # Spark wrote a part-file directory; DuckDB needs the glob form
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    for qname, got in (("text_pii_report", got_report), ("text_pii_redact", got_redact)):
        want = {r[0]: r for r in con.sql(q[qname].oracle).fetchall()}
        cols = [c for c in con.sql(q[qname].oracle).columns]
        for doc_id, row in want.items():
            for i, c in enumerate(cols):
                assert got[doc_id][c] == row[i], (qname, doc_id, c)


def test_clean_corpus_reports_zero_pii(spark):
    rep = (
        registry.all_queries()["text_pii_report"]
        .fn(spark, "/root/testdata/sf0.001")
        .agg(F.sum(F.col("has_pii").cast("long")).alias("n"))
        .first()
    )
    assert rep.n == 0
