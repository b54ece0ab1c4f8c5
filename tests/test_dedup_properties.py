"""Property-based checks for the pair-driven verifier stages: for random
tiny corpora, exact_jaccard / containment over ALL pairs must equal a
brute-force set computation in Python — the stages' equi-join +
left-join plumbing may never drop, duplicate, or misattribute a pair.
"""

from hypothesis import given, settings

import pytest

# property fuzzers are opt-in (driver test budget, optimization r15):
# run with `-m slow` before publishing a round
pytestmark = pytest.mark.slow

from hypothesis import strategies as st

from etl_financial_report_spark.operators.dedup import (
    containment,
    distinct_tokens,
    exact_jaccard,
)

_word = st.sampled_from(["a", "b", "c", "d", "e"])
_doc = st.lists(_word, min_size=1, max_size=6).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=5)


def _spark_stage(spark, corpus, fn):
    docs = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(i, j) for i in range(len(corpus)) for j in range(i + 1, len(corpus))],
        ["doc_a", "doc_b"],
    )
    return {(r.doc_a, r.doc_b): r for r in fn(pairs, distinct_tokens(docs)).collect()}


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_exact_jaccard_matches_set_math(spark, corpus):
    got = _spark_stage(spark, corpus, exact_jaccard)
    sets = [set(t.split(" ")) for t in corpus]
    assert set(got) == {(i, j) for i in range(len(sets)) for j in range(i + 1, len(sets))}
    for (i, j), row in got.items():
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        assert row.n_shared == inter
        assert row.jaccard == inter / union


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_containment_matches_set_math(spark, corpus):
    got = _spark_stage(spark, corpus, containment)
    sets = [set(t.split(" ")) for t in corpus]
    for (i, j), row in got.items():
        inter = len(sets[i] & sets[j])
        assert row.containment == inter / min(len(sets[i]), len(sets[j]))
        assert row.smaller_is_a is (len(sets[i]) < len(sets[j]))
        # containment dominates jaccard by construction
        assert row.containment >= inter / len(sets[i] | sets[j])


@settings(max_examples=8, deadline=None)
@given(_corpus, _corpus)
def test_incremental_verdicts_invariants(spark, batch_texts, corpus_texts):
    """dedup_incremental's verdict stage on random tiny corpora:
    * every batch doc verdicts exactly once;
    * exact_dup verdicts are COMPLETE and match the smallest identical
      corpus doc (the exact stage is deterministic, no LSH involved);
    * near_dup verdicts are SOUND — the matched pair's true token-set
      jaccard clears the bar (recall is probabilistic under banding, so
      only soundness is asserted);
    * match ids always point into the corpus, never the batch."""
    from etl_financial_report_spark.operators.dedup import (
        VERIFY_JACCARD,
        build_corpus_dedup_index,
        incremental_verdicts,
    )

    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        list(enumerate(corpus_texts)), ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in incremental_verdicts(batch, build_corpus_dedup_index(corpus)).collect()
    }
    assert sorted(out) == [100 + i for i in range(len(batch_texts))]

    corpus_ids = set(range(len(corpus_texts)))
    sets = {i: set(t.split(" ")) for i, t in enumerate(corpus_texts)}
    for i, t in enumerate(batch_texts):
        row = out[100 + i]
        exact_matches = [j for j, ct in enumerate(corpus_texts) if ct == t]
        if exact_matches:
            assert row.verdict == "exact_dup"
            assert row.match_id == min(exact_matches)
            assert row.jaccard is None
        else:
            assert row.verdict in ("near_dup", "unique")
        if row.verdict == "near_dup":
            assert row.match_id in corpus_ids
            bset = set(t.split(" "))
            mset = sets[row.match_id]
            true_j = len(bset & mset) / len(bset | mset)
            assert abs(row.jaccard - true_j) < 1e-12
            assert row.jaccard >= VERIFY_JACCARD


def test_dedup_aware_split_has_zero_pair_leakage(spark, sf_dir):
    """The whole point of sample_dedup_aware_split: joining every LSH
    candidate pair onto its members' split assignments must yield ZERO
    off-diagonal (cross-split) pairs — the audit sample_split_leakage
    runs, passed by construction because the split key is the component
    id. Also pins that both pair endpoints share a component."""
    from pyspark.sql import functions as F

    from etl_financial_report_spark.operators.dedup import dedup_minhash_lsh_pairs
    from etl_financial_report_spark.operators.sampling import sample_dedup_aware_split

    assign = sample_dedup_aware_split(spark, sf_dir)
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    a = assign.select(
        F.col("doc_id").alias("doc_a"),
        F.col("split").alias("split_a"),
        F.col("component").alias("comp_a"),
    )
    b = assign.select(
        F.col("doc_id").alias("doc_b"),
        F.col("split").alias("split_b"),
        F.col("component").alias("comp_b"),
    )
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    assert joined.where(F.col("split_a") != F.col("split_b")).count() == 0
    assert joined.where(F.col("comp_a") != F.col("comp_b")).count() == 0
    # and the split still covers every document exactly once
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert assign.count() == n_docs


def test_semantic_aware_split_has_zero_embedding_leakage(spark):
    """Every SemDeDup pair (cosine >= bar) must be intra-split under
    sample_semantic_aware_split — zero embedding-space eval leakage by
    construction, the embedding twin of the dedup-aware-split pin."""
    from etl_financial_report_spark.operators.sampling import (
        sample_semantic_aware_split,
    )
    from etl_financial_report_spark.operators.similarity import (
        SEMDEDUP_COSINE,
        sim_bucketed_cosine_pairs,
    )

    sf = "/root/testdata/sf0.01"
    split = {r.vec_id: r.split for r in sample_semantic_aware_split(spark, sf).collect()}
    pairs = [
        (r.vec_a, r.vec_b)
        for r in sim_bucketed_cosine_pairs(spark, sf).collect()
        if r.cosine >= SEMDEDUP_COSINE
    ]
    assert pairs, "the corpus must contain semantic pairs"
    assert all(split[a] == split[b] for a, b in pairs)


def test_bbit_minhash_estimator_invariants(spark, tmp_path):
    """b=1 minhash invariants: full-hash agreement IMPLIES low-bit
    agreement (n_bit_match >= n_agree, corpus-wide), identical docs hit
    the ceiling on every estimator, and the 2P-1 correction never goes
    below zero. Engineered identical pair pins the ceiling exactly."""
    from etl_financial_report_spark import registry

    text = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"w{i}" for i in range(15)) + " " + " ".join(
        f"z{i}" for i in range(15)
    )
    spark.createDataFrame(
        [(0, text, "en", "s", len(text)), (1, text, "en", "s", len(text)),
         (2, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = (
        registry.all_queries()["dedup_minhash_bbit"].fn(spark, str(tmp_path)).collect()
    )
    assert rows
    ident = [r for r in rows if (r.doc_a, r.doc_b) == (0, 1)]
    assert len(ident) == 1
    r = ident[0]
    assert r.n_bit_match == 8 and r.bbit_est_ppm == 1_000_000
    assert r.n_agree == 8 and r.full_est_ppm == 1_000_000
    assert r.exact_jaccard_ppm == 1_000_000
    for r in rows:
        assert r.n_bit_match >= r.n_agree  # hash equal => low bit equal
        assert 0 <= r.bbit_est_ppm <= 1_000_000

    # corpus-wide at sf0.01: the implication and clamp hold on real pairs
    big = (
        registry.all_queries()["dedup_minhash_bbit"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert big
    assert all(r.n_bit_match >= r.n_agree for r in big)
    assert all(0 <= r.bbit_est_ppm <= 1_000_000 for r in big)
