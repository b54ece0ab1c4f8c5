"""Pair-driven exact-verifier stage tests: the jaccard/containment verdicts
must be computed THROUGH an explicit candidate-pair frame — never via a
token self-join (the quadratic-under-stopword-skew shape). The behavioral
tests prove pair-driven semantics (a non-candidate dup pair must NOT appear
in the output even though its docs share every token); the plan pin lives
in tests/test_plans.py::test_lsh_verified_token_join_is_pair_driven."""

from etl_financial_report_spark.operators.dedup import (
    containment,
    distinct_tokens,
    exact_jaccard,
)


def _toks(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),
            (3, "a b c d"),  # exact dup of doc 1 — but never a candidate below
            (4, "x y z"),
            (5, "a b"),  # contained in doc 1
        ],
        ["doc_id", "text"],
    )
    return distinct_tokens(docs)


def test_exact_jaccard_is_pair_driven(spark):
    toks = _toks(spark)
    pairs = spark.createDataFrame([(1, 2), (1, 4)], ["doc_a", "doc_b"])
    out = {(r.doc_a, r.doc_b): r for r in exact_jaccard(pairs, toks).collect()}
    # docs 1 and 3 are identical, yet (1, 3) is absent: the stage scored
    # exactly the candidate frame, so the token stream never self-joined
    assert set(out) == {(1, 2), (1, 4)}
    assert out[(1, 2)].n_shared == 3
    assert abs(out[(1, 2)].jaccard - 3 / 5) < 1e-12
    # a disjoint candidate comes back with an explicit 0, not a dropped row
    assert out[(1, 4)].n_shared == 0
    assert out[(1, 4)].jaccard == 0.0


def test_containment_is_pair_driven(spark):
    toks = _toks(spark)
    pairs = spark.createDataFrame([(1, 5), (2, 4)], ["doc_a", "doc_b"])
    out = {(r.doc_a, r.doc_b): r for r in containment(pairs, toks).collect()}
    assert set(out) == {(1, 5), (2, 4)}
    # doc 5 ("a b") is fully contained in doc 1 ("a b c d")
    assert out[(1, 5)].n_shared == 2
    assert out[(1, 5)].containment == 1.0
    assert out[(1, 5)].smaller_is_a is False  # |A|=4 > |B|=2
    assert out[(2, 4)].containment == 0.0


def test_simhash64_bucket_cap_prunes_hot_buckets(spark):
    """max_bucket=None is exact; the finite default and a huge cap change
    nothing at this corpus size (no Manku bucket is hot); cap=1 kills
    every candidate (any collision implies bucket size >= 2) — the
    Dolma-style hash-skew guard is a strict pre-join filter, not a
    post-hoc sample."""
    from etl_financial_report_spark.operators.dedup import dedup_simhash64_hamming

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_simhash64_hamming(spark, sf, max_bucket=None).collect()
    }
    default = {(r.doc_a, r.doc_b) for r in dedup_simhash64_hamming(spark, sf).collect()}
    huge = {
        (r.doc_a, r.doc_b)
        for r in dedup_simhash64_hamming(spark, sf, max_bucket=10**6).collect()
    }
    assert default == exact
    assert huge == exact
    assert dedup_simhash64_hamming(spark, sf, max_bucket=1).count() == 0


def test_simhash64_manku_tables_recall_equals_single_block_pigeonhole(spark):
    """The 20 Manku 3-of-6-sub-block tables must find EXACTLY the pairs the
    plain 1-of-4-block pigeonhole finds (both are exact for hamming<=3);
    the oracle SQL keeps the 4-block form, so this equality is what makes
    the narrower Manku keys parity-safe."""
    from pyspark.sql import functions as F

    from etl_financial_report_spark.operators.dedup import (
        MAX_HAMMING64,
        dedup_simhash64,
        dedup_simhash64_hamming,
    )

    sf = "/root/testdata/sf0.001"
    sig = dedup_simhash64(spark, sf)
    a, b = sig.alias("a"), sig.alias("b")
    # brute-force ground truth: every doc pair's exact hamming
    truth = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            sum(
                F.bit_count(F.expr(f"a.b{j} ^ b.b{j}")) for j in range(4)
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= MAX_HAMMING64)
        .collect()
    }
    manku = {
        (r.doc_a, r.doc_b)
        for r in dedup_simhash64_hamming(spark, sf, max_bucket=None).collect()
    }
    assert manku == truth
    assert len(truth) > 0  # the corpus does contain near-dup signatures


def test_min_label_components_long_chain_converges_logarithmically(spark, monkeypatch):
    """The x100 smoke falsified the "near-dup clusters are shallow"
    assumption with a 63-link chain (lag-rotated embeddings); pin the fix
    here cheaply: graph contraction must converge a 63-link chain under a
    10-round cap (plain propagation needs ~63 rounds and raised), and the
    labels must be the true transitive closure plus untouched singletons."""
    from pyspark.sql import functions as F

    import etl_financial_report_spark.operators.dedup as D

    monkeypatch.setattr(D, "MAX_CC_ITERATIONS", 10)
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)], ["doc_a", "doc_b"]
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id")).unionAll(
        spark.createDataFrame([(100,), (101,), (999,)], ["doc_id"])
    )
    got = {
        r.doc_id: r.component
        for r in D.min_label_components(pairs, nodes).collect()
    }
    assert len(got) == n + 3
    assert all(got[i] == 0 for i in range(n))
    assert got[100] == 100 and got[101] == 100
    assert got[999] == 999


def test_min_label_components_adversarial_ordering_converges(spark, monkeypatch):
    """The scheme contraction replaced (node-local pointer jumping) was
    falsified at x100 not by chain LENGTH but by adversarial id ORDERING:
    minima crawl when hooking never reaches component roots. Pin the
    O(log #components) guarantee on its worst shape — a 256-link chain
    whose ids are a deterministic pseudo-random permutation (many local
    minima per round, no monotone runs) — under a 12-round cap
    (ceil(log2(256)) = 8 plus margin; plain propagation needs ~256)."""
    from pyspark.sql import functions as F

    import etl_financial_report_spark.operators.dedup as D

    monkeypatch.setattr(D, "MAX_CC_ITERATIONS", 12)
    n = 256
    # fixed LCG permutation of 0..n-1 (full period for m=2^k, c odd,
    # a ≡ 1 mod 4): deterministic, order-scrambled ids along the chain
    perm, x = [], 0
    for _ in range(n):
        perm.append(x)
        x = (5 * x + 113) % n
    assert len(set(perm)) == n
    pairs = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.component
        for r in D.min_label_components(pairs, nodes).collect()
    }
    assert len(got) == n
    assert all(got[i] == 0 for i in range(n))
