"""tokenizer_vocab_churn: every verdict class must FIRE on an engineered
corpus pair (the constraint-report discipline), and the registered
incremental-slice query must be exactly consistent with independent
Python ranking of the same corpus."""

from collections import Counter

from etl_financial_report_spark import registry
from etl_financial_report_spark.operators.textops import (
    VOCAB_CHURN_K,
    vocab_churn_frames,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_every_churn_verdict_fires(spark):
    # old corpus: K+1 tokens a..q with strictly decreasing counts, so the
    # head is a..p and q sits just outside it
    toks = [chr(ord("a") + i) for i in range(VOCAB_CHURN_K + 1)]
    old_texts = [" ".join([t] * (VOCAB_CHURN_K + 2 - i)) for i, t in enumerate(toks)]
    # new corpus: q surges into the head (pushing p out), b and c swap
    new_counts = {t: VOCAB_CHURN_K + 2 - i for i, t in enumerate(toks)}
    new_counts["q"] = 100  # entered
    new_counts["b"], new_counts["c"] = new_counts["c"], new_counts["b"]  # shifted
    new_texts = [" ".join([t] * n) for t, n in new_counts.items()]
    got = {
        r.tok: r
        for r in vocab_churn_frames(_docs(spark, old_texts), _docs(spark, new_texts)).collect()
    }
    # ground truth: old head a(1)..p(16); new head q(1) a(2) c(3) b(4)
    # d(5).. o(16) — q's entry shifts everything except c, whose swap
    # with b exactly cancels the shift (old 3 -> new 3)
    assert got["q"].status == "entered" and got["q"].old_rank is None
    assert got["q"].new_rank == 1
    assert got["p"].status == "left" and got["p"].new_rank is None
    assert got["a"].status == "shifted" and (got["a"].old_rank, got["a"].new_rank) == (1, 2)
    assert got["b"].status == "shifted" and (got["b"].old_rank, got["b"].new_rank) == (2, 4)
    assert got["c"].status == "stable" and got["c"].old_rank == got["c"].new_rank == 3
    assert {r.status for r in got.values()} == {"entered", "left", "shifted", "stable"}


def test_registered_query_matches_independent_ranking(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    words = con.sql(
        f"SELECT unnest(string_split(text,' ')) AS w, doc_id "
        f"FROM '{sf}/documents.parquet'"
    ).fetchall()

    def head(rows):
        c = Counter(w for w, _ in rows)
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_CHURN_K]
        return {t: i + 1 for i, (t, _) in enumerate(ranked)}

    old_rank = head([(w, d) for w, d in words if d % 10 != 7])
    new_rank = head(words)
    got = {
        r.tok: r
        for r in registry.all_queries()["tokenizer_vocab_churn"].fn(spark, sf).collect()
    }
    assert set(got) == set(old_rank) | set(new_rank)
    for t, r in got.items():
        assert r.old_rank == old_rank.get(t), t
        assert r.new_rank == new_rank.get(t), t
