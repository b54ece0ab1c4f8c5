"""Semantic pins for the r6 LLM-pipeline additions: chunk-level
keep-first dedup (C4/Dolma paragraph semantics), temperature-based
source mixing, and hard-negative mining. Exactness vs DuckDB is covered
by the parity harness; these tests pin the SEMANTICS on corpora built to
exercise each rule."""

import pytest
from pyspark.sql import functions as F

from etl_financial_report_spark.operators.dedup import (
    DEDUP_CHUNK_W,
    dedup_chunk_keep_first,
)
from etl_financial_report_spark.operators.sampling import (
    sample_temperature_mixture,
)
from etl_financial_report_spark.operators.similarity import (
    HARD_NEG_K,
    N_QUERY_BATCH,
    sim_hard_negative_mining,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_chunk_keep_first_scrubs_later_copies_only(spark, tmp_path):
    W = DEDUP_CHUNK_W
    chunk_a = " ".join(f"a{i}" for i in range(W))
    chunk_b = " ".join(f"b{i}" for i in range(W))
    chunk_c = " ".join(f"c{i}" for i in range(W))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, f"{chunk_a} {chunk_b}", "src0"),  # first owner of a and b
            (2, f"{chunk_a} {chunk_c}", "src0"),  # later copy of a: scrubbed
            (3, "tiny doc", "src0"),  # shorter than W: single unique chunk
        ],
    )
    got = {r.doc_id: r for r in dedup_chunk_keep_first(spark, sf).collect()}
    assert got[1].n_chunks == 2 and got[1].n_kept == 2
    assert got[1].kept_text == f"{chunk_a} {chunk_b}"
    # doc 2 keeps only its unique chunk — the duplicate of chunk_a goes
    assert got[2].n_chunks == 2 and got[2].n_kept == 1
    assert got[2].kept_text == chunk_c
    assert got[3].n_chunks == 1 and got[3].n_kept == 1
    assert got[3].kept_text == "tiny doc"


def test_chunk_keep_first_winner_is_lexicographic_min(spark, tmp_path):
    """First occurrence = min (doc_id, chunk_idx): when the same chunk
    appears at a LATER index of an earlier doc and an earlier index of a
    later doc, the earlier doc wins."""
    W = DEDUP_CHUNK_W
    dup = " ".join(f"d{i}" for i in range(W))
    uniq = " ".join(f"u{i}" for i in range(W))
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, f"{uniq} {dup}", "src0"), (2, f"{dup} {uniq}", "src0")],
    )
    got = {r.doc_id: r for r in dedup_chunk_keep_first(spark, sf).collect()}
    # doc 1 owns both chunks (uniq@(1,0), dup@(1,1) beats dup@(2,0))
    assert got[1].n_kept == 2
    assert got[2].n_kept == 0 and got[2].kept_text == ""


def test_temperature_mixture_flattens_the_head(spark, tmp_path):
    rows = [(i, f"tok{i}", "big") for i in range(400)] + [
        (1000 + i, f"tok{i}", "small") for i in range(100)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r.source: r for r in sample_temperature_mixture(spark, sf).collect()}
    big, small = got["big"], got["small"]
    assert big.n_docs == 400 and small.n_docs == 100
    assert big.isqrt == 20 and small.isqrt == 10
    # raw share 4:1 flattens to 2:1 at alpha = 0.5
    assert big.raw_ppm == 800_000 and small.raw_ppm == 200_000
    assert big.temp_ppm == 666_666 and small.temp_ppm == 333_333
    # the head gives up share, the tail gains it
    assert big.temp_ppm < big.raw_ppm and small.temp_ppm > small.raw_ppm
    # quotas sum to at most one epoch and follow the temperature weights
    assert big.quota_docs + small.quota_docs <= 500
    assert big.quota_docs == 333 and small.quota_docs == 166


def test_hard_negative_mining_semantics(spark, sf_dir):
    df = sim_hard_negative_mining(spark, sf_dir)
    rows = df.collect()
    negs = [r for r in rows if r.kind == "neg"]
    poss = [r for r in rows if r.kind == "pos"]
    q_ids = {r.q_id for r in rows}
    assert q_ids == set(range(N_QUERY_BATCH))
    # every negative crosses the label boundary; every positive stays inside
    assert all(r.label != r.q_label for r in negs)
    assert all(r.label == r.q_label for r in poss)
    # per anchor: HARD_NEG_K negatives ranked by descending similarity,
    # exactly one hardest positive
    for q in q_ids:
        qn = sorted((r for r in negs if r.q_id == q), key=lambda r: r.rank)
        assert [r.rank for r in qn] == list(range(1, HARD_NEG_K + 1))
        assert all(
            qn[i].cosine >= qn[i + 1].cosine for i in range(len(qn) - 1)
        )
        qp = [r for r in poss if r.q_id == q]
        assert len(qp) == 1 and qp[0].rank == 1
    # the hard positive really is the least-similar same-label vector:
    # no negative of the same anchor may beat it from below -- and the
    # mined negatives sit above the positive in similarity for a margin
    # loss to have signal on at least one anchor
    assert any(
        max(r.cosine for r in negs if r.q_id == q)
        > [r.cosine for r in poss if r.q_id == q][0]
        for q in q_ids
    )


def test_chunk_incremental_scrubs_only_corpus_seen_chunks(spark, tmp_path):
    """Batch docs (doc_id % 10 == 7) lose exactly the chunks the CORPUS
    already has; never-seen chunks survive even if repeated inside the
    batch (intra-batch dedup is out of scope by contract)."""
    from etl_financial_report_spark.operators.dedup import (
        dedup_chunk_incremental,
    )

    W = DEDUP_CHUNK_W
    known = " ".join(f"k{i}" for i in range(W))
    fresh = " ".join(f"f{i}" for i in range(W))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, f"{known} filler", "src0"),  # corpus owns `known`
            (7, f"{known} {fresh}", "src0"),  # batch: one stale, one fresh
            (17, fresh, "src0"),  # batch: fresh only (batch-internal dup OK)
        ],
    )
    got = {r.doc_id: r for r in dedup_chunk_incremental(spark, sf).collect()}
    assert set(got) == {7, 17}  # only batch docs verdict
    assert got[7].n_chunks == 2 and got[7].n_kept == 1
    assert got[7].kept_text == fresh
    assert got[7].seen_frac_ppm == 500_000
    assert got[17].n_chunks == 1 and got[17].n_kept == 1
    assert got[17].seen_frac_ppm == 0


def test_semantic_threshold_sweep_is_monotone_and_matches_keep_list(spark, sf_dir):
    """Raising the bar can only shrink the pair set, and the 40% bar must
    agree exactly with dedup_semantic_keep_list: a vector sits in a
    multi-member component iff it has at least one >= SEMDEDUP_COSINE
    neighbor (components are built from exactly those edges)."""
    from etl_financial_report_spark.operators.similarity import (
        SEM_SWEEP_PCTS,
        dedup_semantic_keep_list,
        sim_semantic_threshold_sweep,
    )

    rows = {
        r.threshold_pct: r
        for r in sim_semantic_threshold_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == set(SEM_SWEEP_PCTS)
    for lo, hi in zip(SEM_SWEEP_PCTS, SEM_SWEEP_PCTS[1:]):
        assert rows[lo].n_pairs >= rows[hi].n_pairs
        assert rows[lo].n_dup_vecs >= rows[hi].n_dup_vecs
        assert rows[lo].dup_frac_ppm >= rows[hi].dup_frac_ppm
    clustered = (
        dedup_semantic_keep_list(spark, sf_dir)
        .where(F.col("cluster_size") > 1)
        .count()
    )
    assert rows[40].n_dup_vecs == clustered


def test_winnowing_guarantee_and_density(spark, tmp_path):
    """The winnowing contract (Schleimer et al. 2003): any shared token
    run of >= W + K - 1 tokens MUST share a selected fingerprint, and
    selection stores far fewer positions than the gram stream. Docs 1/2
    share exactly such a run embedded at different offsets in otherwise
    disjoint text; doc 3 shares nothing."""
    from etl_financial_report_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        dedup_winnowing_pairs,
        text_winnowing_fingerprints,
    )

    # two disjoint guarantee-windows of W+K-1 tokens -> >= 2 distinct
    # shared fingerprints (the pair report's bar)
    run = " ".join(f"s{i}" for i in range(2 * (WINNOW_W + WINNOW_K - 1)))
    pad_a = " ".join(f"a{i}" for i in range(30))
    pad_b = " ".join(f"b{i}" for i in range(30))
    pad_c = " ".join(f"c{i}" for i in range(30))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, f"{pad_a} {run}", "src0"),
            (2, f"{run} {pad_b}", "src0"),
            (3, pad_c, "src0"),
        ],
    )
    pairs = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in dedup_winnowing_pairs(spark, sf).collect()
    }
    assert (1, 2) in pairs and set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] >= 2
    stats = {r.doc_id: r for r in text_winnowing_fingerprints(spark, sf).collect()}
    for r in stats.values():
        assert 0 < r.n_selected <= r.n_grams
        assert 0 < r.density_ppm <= 1_000_000
    # ~2/(W+1) density on random-ish text, loosely bounded
    assert stats[3].n_selected < stats[3].n_grams


def test_domain_cap_binds_only_on_mega_sources(spark, tmp_path):
    """The C4-style per-source cap: a 100-doc source keeps exactly
    DOMAIN_CAP_DOCS (deterministically — rerun keeps the same set), a
    5-doc source keeps everything uncapped, and per-source rank heads
    are dense 1..cap with NULL ranks past the cap."""
    from etl_financial_report_spark.operators.sampling import (
        DOMAIN_CAP_DOCS,
        sample_domain_cap,
    )

    rows = [(i, f"mega doc {i}", "mega") for i in range(100)]
    rows += [(1000 + i, f"small doc {i}", "small") for i in range(5)]
    sf = _write_docs(spark, tmp_path, rows)
    out = sample_domain_cap(spark, sf).collect()
    mega = [r for r in out if r.source == "mega"]
    small = [r for r in out if r.source == "small"]
    assert len(mega) == 100 and len(small) == 5  # drop rows still emit
    kept_mega = {r.doc_id for r in mega if r.keep}
    assert len(kept_mega) == DOMAIN_CAP_DOCS
    assert sorted(r.rk for r in mega if r.keep) == list(
        range(1, DOMAIN_CAP_DOCS + 1)
    )
    assert all(r.rk is None for r in mega if not r.keep)
    assert all(r.cap_bound for r in mega)
    assert all(r.keep and not r.cap_bound for r in small)
    assert {r.source_docs for r in mega} == {100}
    # no-RNG determinism: the kept set is identical on a rerun
    again = {r.doc_id for r in sample_domain_cap(spark, sf).collect() if r.keep}
    assert kept_mega | {r.doc_id for r in small} == again


def test_quality_dup_matrix_cells_are_exact(spark, tmp_path):
    """All four (quality, dup) cells engineered to fire, with exact
    counts and ppm shares. Duplication uses the canonical key, so a
    whitespace-variant copy still counts as a dup of its original —
    while its QUALITY verdict legitimately differs (the raw-text
    tokenizer sees empty tokens, dropping mean word length below the
    gate): the matrix separates the two dimensions exactly as designed."""
    from etl_financial_report_spark.operators.quality import GOPHER_STOPWORDS

    # 20 tokens, mean word len in [4,5], >= 2 distinct stopwords -> PASS
    good = " ".join((list(GOPHER_STOPWORDS)[:2] + ["token"] * 18))
    bad = "shorty text"  # far under the 16-token floor -> FAIL
    rows = [
        (0, good, "s"),
        (1, good, "s"),
        (2, good.replace(" ", "  "), "s"),   # whitespace variant: same canonical key
        (3, bad, "s"),
        (4, bad, "s"),
        (5, good.replace("token", "tokun"), "s"),  # unique passing
        (6, "another tiny", "s"),                  # unique failing
    ]
    sf = _write_docs(spark, tmp_path, rows)
    from etl_financial_report_spark import registry

    cells = {
        (r.quality_keep, r.is_exact_dup): r
        for r in registry.all_queries()["pipeline_quality_dup_matrix"]
        .fn(spark, sf)
        .collect()
    }
    assert len(cells) == 4
    assert cells[(True, True)].n_docs == 2   # the two verbatim good copies
    # the two bad copies + the ws-variant (dup by canonical key,
    # quality-fail by raw tokenization)
    assert cells[(False, True)].n_docs == 3
    assert cells[(True, False)].n_docs == 1
    assert cells[(False, False)].n_docs == 1
    assert sum(r.n_docs for r in cells.values()) == 7
    assert cells[(True, True)].share_ppm == 2 * 1_000_000 // 7
    # token volume: the ws-variant doc still has 20 tokens after split?
    # no — double spaces split into empty tokens; just pin the two
    # single-doc cells, whose token counts are unambiguous
    assert cells[(True, False)].cell_tokens == 20
    assert cells[(False, False)].cell_tokens == 2


def test_dsir_selection_prefers_target_like_docs(spark, tmp_path):
    """DSIR importance selection (r11): with a target slice
    (doc_id % 10 == 3) written in a distinctive vocabulary, source-pool
    docs sharing that vocabulary must outscore and be selected over
    docs in an unrelated vocabulary — and the scoring is deterministic
    across reruns (no-RNG discipline)."""
    from etl_financial_report_spark.operators.sampling import (
        DSIR_KEEP_DOCS,
        sample_dsir_selection,
    )

    med = "patient dosage clinical trial symptom therapy diagnosis"
    web = "click subscribe celebrity gossip viral trending meme"
    rows = []
    # target slice: ids ≡ 3 (mod 10), medical vocabulary
    for k in range(10):
        rows.append((3 + 10 * k, f"{med} study {k}", "target"))
    # source pool: 20 medical-like docs and 60 web-like docs
    for k in range(20):
        rows.append((10_000 + 10 * k, f"{med} report {k}", "pool-med"))
    for k in range(60):
        rows.append((20_000 + 10 * k, f"{web} post {k}", "pool-web"))
    sf = _write_docs(spark, tmp_path, rows)

    out = {r.doc_id: r for r in sample_dsir_selection(spark, sf).collect()}
    # the target slice itself never appears in the scored pool
    assert all(d % 10 != 3 for d in out)
    med_ids = {10_000 + 10 * k for k in range(20)}
    web_ids = {20_000 + 10 * k for k in range(60)}
    assert set(out) == med_ids | web_ids
    # every medical doc outscores every web doc
    worst_med = min(out[d].avg_lift_ppm for d in med_ids)
    best_web = max(out[d].avg_lift_ppm for d in web_ids)
    assert worst_med > best_web
    # all 20 target-like docs are selected; the rest of the K budget
    # falls to web docs by (score, doc_id) determinism
    selected = {d for d, r in out.items() if r.selected}
    assert med_ids <= selected
    assert len(selected) == min(DSIR_KEEP_DOCS, len(out))
    again = {
        d for d, r in
        ((r.doc_id, r) for r in sample_dsir_selection(spark, sf).collect())
        if r.selected
    }
    assert selected == again


def test_coreset_fps_covers_clusters_before_revisiting(spark, tmp_path):
    """FPS coreset selection (r11): with three tight orthogonal clusters,
    the seed plus the first two picks must land in three DIFFERENT
    clusters (farthest-first covers modes before densifying), and the
    coverage curve max_cos_to_prior is non-decreasing by construction of
    the greedy argmin."""
    from etl_financial_report_spark.operators.similarity import sample_coreset_fps

    dim = 16

    def vec(axis, jitter):
        v = [0.0] * dim
        v[axis] = 1.0
        v[(axis + 5) % dim] = 0.001 * jitter  # tight within-cluster spread
        return v

    rows = []
    for c, axis in enumerate((0, 1, 2)):
        for j in range(10):
            rows.append((100 * c + j, vec(axis, j), c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")

    out = sorted(
        sample_coreset_fps(spark, str(tmp_path)).collect(),
        key=lambda r: r.sel_idx,
    )
    assert [r.sel_idx for r in out] == list(range(len(out)))
    assert out[0].vec_id == 0 and out[0].max_cos_to_prior is None  # min-id seed
    first_three_clusters = {r.vec_id // 100 for r in out[:3]}
    assert first_three_clusters == {0, 1, 2}
    curve = [r.max_cos_to_prior for r in out[1:]]
    assert all(a <= b + 1e-12 for a, b in zip(curve, curve[1:]))
    # picks 1-2 are cross-cluster: orthogonal axes, cosine ~0; pick 3
    # onward revisits a covered cluster at high cosine
    assert curve[0] < 0.1 and curve[1] < 0.1
    assert curve[2] > 0.9


def test_cluster_balanced_quota_semantics(spark, tmp_path):
    """Cluster-balanced sampling (r11): quotas bind per trained cell —
    kept rows per cell never exceed CLUSTER_QUOTA, drop rows still emit
    with NULL rank, keep == (rk not null), at least one cell is
    quota_bound on a 310-vector corpus (8 cells x 25 = 200 < 310 by
    pigeonhole), and the kept set is deterministic across reruns."""
    from etl_financial_report_spark.operators.similarity import (
        CLUSTER_QUOTA,
        sample_cluster_balanced,
    )

    dim = 16

    def vec(axis, j):
        v = [0.0] * dim
        v[axis] = 1.0
        v[(axis + 7) % dim] = 0.001 * (j % 9)
        return v

    rows = [(j, vec(0, j), 0) for j in range(300)]
    rows += [(1000 + j, vec(1, j), 1) for j in range(10)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")

    out = sample_cluster_balanced(spark, str(tmp_path)).collect()
    assert len(out) == 310  # every vector verdicts, kept or not
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    total_kept = 0
    for cell, rs in by_cell.items():
        kept = [r for r in rs if r.keep]
        assert len(kept) <= CLUSTER_QUOTA
        assert len(kept) == min(len(rs), CLUSTER_QUOTA)
        assert sorted(r.rk for r in kept) == list(range(1, len(kept) + 1))
        assert all(r.rk is None for r in rs if not r.keep)
        assert all((r.cell_n == len(rs)) for r in rs)
        assert all(r.quota_bound == (len(rs) > CLUSTER_QUOTA) for r in rs)
        total_kept += len(kept)
    assert any(len(rs) > CLUSTER_QUOTA for rs in by_cell.values())
    assert total_kept == sum(min(len(rs), CLUSTER_QUOTA) for rs in by_cell.values())
    again = {
        r.vec_id for r in sample_cluster_balanced(spark, str(tmp_path)).collect() if r.keep
    }
    assert again == {r.vec_id for r in out if r.keep}


def test_coreset_fps_degrades_gracefully_on_tiny_corpus(spark, tmp_path):
    """ADVICE r11: a corpus with fewer than FPS_K+1 conforming nonzero
    vectors must emit the picks it can make (like the oracle's empty
    pk stages), and a corpus with ZERO conforming vectors must emit the
    empty frame — never IndexError."""
    from etl_financial_report_spark.operators.similarity import sample_coreset_fps

    dim = 8

    def vec(axis):
        v = [0.0] * dim
        v[axis] = 1.0
        return v

    rows = [(i, vec(i % dim), 0) for i in range(3)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = sorted(
        sample_coreset_fps(spark, str(tmp_path)).collect(), key=lambda r: r.sel_idx
    )
    assert [r.vec_id for r in out] == [0, 1, 2]  # 3 picks, then exhausted

    zero = spark.createDataFrame(
        [(0, [0.0] * dim, 0)], "vec_id long, embedding array<float>, label int"
    )
    zero.coalesce(1).write.parquet(f"{tmp_path}/z/embeddings.parquet")
    assert sample_coreset_fps(spark, f"{tmp_path}/z").collect() == []


def test_coreset_fps_k_cap_raises_loudly(spark, monkeypatch):
    """VERDICT r11 item 5: FPS_K past FPS_K_MAX must fail with a loud
    ValueError before any Spark work (K is sequential driver latency)."""
    import pytest

    from etl_financial_report_spark.operators import similarity as S

    monkeypatch.setattr(S, "FPS_K", S.FPS_K_MAX + 1)
    with pytest.raises(ValueError, match="FPS_K_MAX"):
        S.sample_coreset_fps(spark, "/root/testdata/sf0.001")


def test_dsir_lift_grammar_exact_past_int64(spark):
    """ADVICE r11: the DECIMAL lift grammar must match Python big-int
    floor division on profile counts far past the old int64 numerator
    bound (tc*s_tot > 9.2e12 used to wrap silently with ANSI off)."""
    from pyspark.sql import functions as F

    NF = 8192
    cases = [
        # (tc, sc, t_tot, s_tot) — last two rows wrap the old grammar
        (0, 5, 100, 1000),
        (17, 40, 12_345, 678_901),
        (4_000_000_000, 9_000_000_000, 5_000_000_000, 3_000_000_000_000),
        (9_000_000_000_000, 9_000_000_000_000, 9_200_000_000_000, 9_300_000_000_000),
    ]
    df = spark.createDataFrame(
        cases, "tc long, sc long, t_tot long, s_tot long"
    ).select(
        "*",
        F.expr(
            f"(CAST(COALESCE(tc, 0) + 1 AS DECIMAL(19,0)) * 1000000"
            f" * CAST(s_tot + {NF} AS DECIMAL(19,0)))"
            f" DIV (CAST(sc + 1 AS DECIMAL(19,0))"
            f" * CAST(t_tot + {NF} AS DECIMAL(19,0)))"
        ).alias("lift_ppm"),
    )
    for r in df.collect():
        want = (1_000_000 * (r.tc + 1) * (r.s_tot + NF)) // (
            (r.sc + 1) * (r.t_tot + NF)
        )
        assert r.lift_ppm == want, (r, want)


def test_cluster_term_profile_labels_clusters(spark, tmp_path):
    """r12 sim_cluster_term_profile: with three orthogonal embedding
    clusters whose documents carry cluster-specific marker vocabulary,
    every cell's top lifted term must be a marker of the cluster that
    dominates the cell, never the shared filler vocabulary."""
    from etl_financial_report_spark.operators.similarity import (
        CLUSTER_TERM_MIN_C,
        sim_cluster_term_profile,
    )

    dim = 16
    markers = ["medicine", "astronomy", "cooking"]
    filler = "the common shared words appear everywhere equally"
    erows, drows = [], []
    for cidx in range(3):
        for j in range(12):
            vid = 100 * cidx + j
            v = [0.0] * dim
            v[cidx] = 1.0
            v[(cidx + 5) % dim] = 0.001 * j
            erows.append((vid, v, cidx))
            text = f"{filler} " + " ".join([markers[cidx]] * CLUSTER_TERM_MIN_C)
            drows.append((vid, text, "en", "s", len(text)))
    spark.createDataFrame(
        erows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")
    spark.createDataFrame(
        drows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")

    out = sim_cluster_term_profile(spark, str(tmp_path)).collect()
    assert out, "profile must emit rows"
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, rs in by_cell.items():
        top = min(rs, key=lambda r: r.rk)
        assert top.tok in markers, (cell, top)
        # markers concentrate in one cell: lift far above the corpus rate
        assert top.lift_ppm > 1_000_000
        # filler words are flat across cells -> never the top term
        assert all(r.tok in markers for r in rs if r.lift_ppm > 1_500_000)
    # the seed rule (vec_id < N_CELLS) draws every seed from cluster 0,
    # so clusters 1 and 2 can tie into one cell after the single Lloyd
    # round — at least two cells must still be marker-labeled, and every
    # marker must surface SOMEWHERE in the profiles with above-corpus lift
    tops = {min(rs, key=lambda r: r.rk).tok for rs in by_cell.values()}
    assert tops <= set(markers) and len(tops) >= 2
    lifted_toks = {r.tok for r in out if r.lift_ppm > 1_000_000}
    assert set(markers) <= lifted_toks


def test_doremi_upweights_hard_domains(spark, tmp_path):
    """r12 sample_doremi_weights: a domain whose documents fail the
    quality weak label (negative classifier margins) must end with the
    LARGEST mixture weight (the minimax chase upweights below-mean
    domains), a uniformly-easy corpus must stay uniform, and final
    weights floor-normalize to <= 1e6 ppm total."""
    from etl_financial_report_spark.operators.sampling import sample_doremi_weights

    good = "the and " + " ".join("alpha" for _ in range(18))  # gate-pass
    bad = " ".join("beta" for _ in range(8))  # word-count violation
    rows = []
    for i in range(40):
        rows.append((i, good, "en", "easy_a", len(good)))
    for i in range(40, 80):
        rows.append((i, good, "en", "easy_b", len(good)))
    for i in range(80, 120):
        rows.append((i, bad, "en", "hard", len(bad)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")

    out = {r.source: r for r in sample_doremi_weights(spark, str(tmp_path)).collect()}
    assert set(out) == {"easy_a", "easy_b", "hard"}
    assert out["hard"].weight_ppm > out["easy_a"].weight_ppm
    assert out["hard"].weight_ppm > out["easy_b"].weight_ppm
    assert out["hard"].excess_norm_ppm > 0
    # identical-content domains tie exactly (deterministic integer math)
    assert out["easy_a"].weight_ppm == out["easy_b"].weight_ppm
    assert sum(r.weight_ppm for r in out.values()) <= 1_000_000

    # uniform corpus: zero excess everywhere -> uniform weights
    u = [(i, good, "en", f"s{i % 4}", len(good)) for i in range(200, 280)]
    spark.createDataFrame(
        u, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/u/documents.parquet")
    uout = sample_doremi_weights(spark, f"{tmp_path}/u").collect()
    assert len({r.weight_ppm for r in uout}) == 1


def test_doremi_lm_loss_sees_novelty_margin_loss_cannot(spark, tmp_path):
    """VERDICT r13 item 4's done-bar: a domain that is a word-order
    PERMUTATION of the majority domain has bit-identical bag-of-words
    classifier margins (same unigram counts -> same dot product), so
    margin-DoReMi is provably indifferent (uniform weights); but its
    bigrams are novel under the corpus LM, so LM-DoReMi upweights it."""
    from etl_financial_report_spark.operators.sampling import (
        sample_doremi_weights,
        sample_doremi_weights_lm,
    )

    words = [f"w{i:02d}" for i in range(20)]
    common = " ".join(words)
    # adjacent-pair swap: same multiset of words, disjoint bigram set
    # (except the final (w19, w18) pair whose context only exists here)
    swapped = " ".join(
        words[i + 1] if i % 2 == 0 else words[i - 1] for i in range(20)
    )
    rows = [(i, common, "en", "common", len(common)) for i in range(200)]
    rows += [(1000 + i, swapped, "en", "scrambled", len(swapped)) for i in range(4)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)

    wm = {r["source"]: r for r in sample_doremi_weights(spark, sf).collect()}
    assert wm["common"]["weight_ppm"] == wm["scrambled"]["weight_ppm"], (
        "identical unigram counts -> identical margins -> margin loss "
        "cannot tell the domains apart"
    )

    wl = {r["source"]: r for r in sample_doremi_weights_lm(spark, sf).collect()}
    assert wl["scrambled"]["excess_norm_ppm"] > 0
    assert wl["common"]["excess_norm_ppm"] == 0
    assert wl["scrambled"]["weight_ppm"] > wl["common"]["weight_ppm"], (
        "novel bigrams -> high LM loss -> the scrambled domain upweights"
    )


def test_rho_selection_composes_gate_and_lm_loss(spark, tmp_path):
    """RHO composition pinned where it bites: dirty-but-novel docs (fail
    the model gate) are EXCLUDED however novel; among gate survivors the
    most-novel docs win the head; boilerplate (low rarity) loses."""
    from etl_financial_report_spark.operators.quality import qc_gate_bar
    from etl_financial_report_spark.operators.sampling import (
        RHO_KEEP_DOCS,
        sample_rho_selection,
    )

    out = sample_rho_selection(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(out) <= RHO_KEEP_DOCS
    qbar = qc_gate_bar(spark, "/root/testdata/sf0.001").first()["qbar"]
    assert all(r["margin"] > qbar for r in out), "every kept doc is clean"
    # the head is sorted by rarity desc with doc_id tiebreak
    keys = [(-r["rare_ppm"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)


def test_doremi_single_source_is_identity(spark, tmp_path):
    """Degenerate mixture: ONE source means the weighted mean IS the
    domain mean, excess pins to zero every round, and the final weight
    is the whole mixture."""
    from etl_financial_report_spark.operators.sampling import sample_doremi_weights

    good = "the and " + " ".join("alpha" for _ in range(18))
    rows = [(i, good, "en", "only", len(good)) for i in range(30)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    out = sample_doremi_weights(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.source == "only" and r.excess_norm_ppm == 0
    assert r.w_raw == 1_000_000 and r.weight_ppm == 1_000_000


def test_threshold_sweep_uniform_margins(spark, tmp_path):
    """Degenerate sweep: identical documents give ONE margin value, so
    every decile bar equals it and margin > bar keeps nothing — the
    sweep reports an honest all-zero keep column instead of dying on the
    single-band edge (mx == mn exercises the band formula's +1 guard)."""
    from etl_financial_report_spark.operators.quality import (
        text_quality_threshold_sweep,
    )

    good = "the and " + " ".join("alpha" for _ in range(18))
    rows = [(i, good, "en", "s", len(good)) for i in range(25)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    out = sorted(
        text_quality_threshold_sweep(spark, str(tmp_path)).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in out] == list(range(1, 10))
    assert len({r.bar for r in out}) == 1  # one margin value everywhere
    assert all(r.n_keep == 0 and r.keep_ppm == 0 for r in out)
    # precision undefined (no kept docs) -> NULL; recall defined and zero
    assert all(r.precision_ppm is None for r in out)
    assert all(r.recall_ppm == 0 for r in out)

    # ADVICE r13: the gate-bar selection over this all-NULL-precision
    # sweep must report precision_met = FALSE (the oracle's
    # MAX(CASE...ELSE 0)), not NULL (Spark's null-skipping MAX), and
    # fall back to the strictest bar
    from etl_financial_report_spark.operators.quality import qc_gate_bar_frame

    sweep = text_quality_threshold_sweep(spark, str(tmp_path))
    bar = qc_gate_bar_frame(sweep).collect()
    assert len(bar) == 1
    assert bar[0].precision_met is False  # not None
    assert bar[0].qbar == out[0].bar


def test_calibrated_spend_curve_drives_selection(spark):
    """VERDICT r13 item 3's done-bar: with a MONOTONE calibration curve
    the calibrated budget equals margin-greedy selection (the curve
    changes nothing); with an INVERTED curve (a lower-margin bin whose
    empirical keep rate is higher) the selection flips to that bin —
    the calibration artifact drives the spend, not the raw margin."""
    from etl_financial_report_spark.operators.sampling import _calibrated_spend

    def frame(krate_hi, krate_lo):
        rows = [
            (i, 40, 2, 200 + i, krate_hi) for i in range(3)
        ] + [
            (10 + i, 40, 1, 100 + i, krate_lo) for i in range(3)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, n_chars long, bin long, margin long, krate long"
        )

    # monotone: higher-margin bin 2 is better calibrated -> it wins the
    # budget, exactly as pure margin order would
    mono = {r["bin"]: r for r in _calibrated_spend(frame(900_000, 500_000), 120).collect()}
    assert mono[2]["n_kept"] == 3 and mono[1]["n_kept"] == 0
    assert mono[2]["chars_kept"] == 120

    # inverted: bin 1's docs EMPIRICALLY keep better despite lower
    # margins -> the calibrated spend promotes them; margin order would
    # have picked bin 2
    inv = {r["bin"]: r for r in _calibrated_spend(frame(500_000, 900_000), 120).collect()}
    assert inv[1]["n_kept"] == 3 and inv[2]["n_kept"] == 0
    assert inv[1]["chars_kept"] == 120

    # partial budget stops mid-bin deterministically (margin desc order)
    part = {r["bin"]: r for r in _calibrated_spend(frame(900_000, 500_000), 100).collect()}
    assert part[2]["n_kept"] == 2 and part[1]["n_kept"] == 0


def test_calibrated_budget_spends_whole_budget_on_testdata(spark, sf_dir):
    """The registered query over the real corpus: per-bin accounting
    sums to the corpus, kept chars never exceed the budget, and kept
    bins form a prefix of the (keep_rate, bin) order."""
    from etl_financial_report_spark.operators.sampling import (
        _QUALITY_BUDGET_CHARS,
        sample_calibrated_budget,
    )

    out = sample_calibrated_budget(spark, sf_dir).collect()
    assert sum(r["chars_kept"] for r in out) <= _QUALITY_BUDGET_CHARS
    assert all(0 <= r["n_kept"] <= r["n_total"] for r in out)
    # bins with any kept doc must dominate fully-skipped bins in the
    # calibrated order (keep_rate desc, bin desc) — prefix property
    ordered = sorted(out, key=lambda r: (-r["keep_rate_ppm"], -r["bin"]))
    seen_partial = False
    for r in ordered:
        if seen_partial:
            assert r["n_kept"] == 0, "spend is a prefix of the calibrated order"
        if r["n_kept"] < r["n_total"]:
            seen_partial = True


def test_doremi_mixture_quotas_derive_from_the_weights(spark, sf_dir):
    """r13 consumer contract: sample_doremi_mixture's rate_ppm is the
    DOCUMENTED pure function of sample_doremi_weights' fixed point —
    qs = weight_ppm * SCALE // n_docs, rate = qs * 1e6 // max(qs) —
    recomputed independently here; and the per-doc gate + packer consume
    exactly those quotas (kept counts match a Python replay of the
    salted hash; shard chars re-add to the kept chars)."""
    from etl_financial_report_spark.operators.sampling import (
        DOREMI_RATE_SCALE,
        sample_doremi_mixture,
        sample_doremi_pack,
        sample_doremi_weights,
    )

    w = {r["source"]: r for r in sample_doremi_weights(spark, sf_dir).collect()}
    qs = {
        s: (r["weight_ppm"] * DOREMI_RATE_SCALE) // r["n_docs"]
        for s, r in w.items()
    }
    mq = max(qs.values())
    want_rate = {s: (q * 1_000_000) // mq for s, q in qs.items()}
    mix = {r["source"]: r for r in sample_doremi_mixture(spark, sf_dir).collect()}
    assert set(mix) == set(w)
    for s, r in mix.items():
        assert r["rate_ppm"] == want_rate[s], s
        assert r["weight_ppm"] == w[s]["weight_ppm"]
        assert 0 <= r["n_kept"] <= r["n_docs"]
    assert max(r["rate_ppm"] for r in mix.values()) == 1_000_000
    # the packer consumes the same survivor set: total chars agree
    shards = sample_doremi_pack(spark, sf_dir).collect()
    assert sum(r["shard_chars"] for r in shards) == sum(
        r["kept_chars"] for r in mix.values()
    )
    assert sum(r["n_docs"] for r in shards) == sum(
        r["n_kept"] for r in mix.values()
    )


def test_winnow_arrow_kernel_matches_expression_reference(spark):
    """The r14 mapInArrow winnowing kernel must emit exactly what the old
    interpreted-HOF pipeline produced — n_grams, the packed fingerprint
    VALUES and their first-occurrence ORDER — pinned on a tie-heavy
    fixture (constant runs, alternating periods, short docs, empty text)."""
    from etl_financial_report_spark.functions.hashing import hash32
    from etl_financial_report_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        _WINNOW_POS_SHIFT,
        _winnow_selected,
    )

    rows = [
        (1, "a a a a a a a a"),            # all-equal grams: every window ties
        (2, "x y z w"),                    # exactly one gram
        (3, "p q r"),                      # shorter than k -> no row
        (4, "b c b c b c b c b c"),        # period-2 ties
        (5, ""),                           # empty text -> no row
        (6, "m n o p q r s t u v w x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    k, w, shift = WINNOW_K, WINNOW_W, _WINNOW_POS_SHIFT
    toks = F.col("toks")
    grams_col = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: hash32(F.array_join(F.slice(toks, i, k), " ")),
    )
    g = docs.where(F.size(toks) >= k).select("doc_id", grams_col.alias("grams"))
    grams = F.col("grams")
    weff = F.least(F.lit(w), F.size(grams))

    def select_at(j):
        window = F.slice(grams, j, weff)
        wmin = F.array_min(window)
        rightmost = F.array_max(
            F.filter(
                F.sequence(j, j + weff - 1),
                lambda p: F.element_at(grams, p) == wmin,
            )
        )
        return wmin * shift + rightmost

    ref = g.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_grams"),
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size(grams) - weff + 1), select_at)
        ).alias("fps"),
    )
    got = _winnow_selected(docs)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
