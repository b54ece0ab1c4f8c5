"""Semantic pins for the r6 late additions: the duplication-length
spectrum (scrub-width selection), the nearest-centroid classifier eval,
and the data-constrained repeat-upsampling plan. Exactness vs DuckDB is
covered by the parity harness; these pin the SEMANTICS on corpora built
to exercise each rule."""

from pyspark.sql import functions as F

from etl_financial_report_spark import registry

from etl_financial_report_spark.operators.quality import (
    SPECTRUM_WIDTHS,
    dedup_span_spectrum,
)
from etl_financial_report_spark.operators.sampling import (
    REPEAT_MAX_EPOCHS,
    sample_repeat_upsampling,
)
from etl_financial_report_spark.operators.similarity import (
    sim_centroid_classifier,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_vecs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


# ------------------------------------------------------- span spectrum


def test_span_spectrum_counts_shared_run_exactly(spark, tmp_path):
    """Two docs share exactly a 32-token run; the spectrum must report
    32-w+1 duplicated spans at width w <= 32 and zero at w = 64, with
    within-doc repeats (doc 3) never counted as cross-doc dups."""
    shared = [f"s{i}" for i in range(32)]
    doc1 = [f"x{i}" for i in range(40)] + shared + [f"y{i}" for i in range(40)]
    doc2 = [f"p{i}" for i in range(40)] + shared + [f"q{i}" for i in range(40)]
    rep = [f"r{i}" for i in range(16)]
    doc3 = rep + rep + [f"z{i}" for i in range(40)]  # internal repeat only
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(doc1), "a"), (2, " ".join(doc2), "a"), (3, " ".join(doc3), "b")],
    )
    rows = {r["span_w"]: r for r in dedup_span_spectrum(spark, sf).collect()}
    assert set(rows) == set(SPECTRUM_WIDTHS)
    for w in (8, 16, 32):
        r = rows[w]
        # only windows fully inside the shared run match across docs
        assert r["n_dup_spans"] == 32 - w + 1
        assert r["dup_positions"] == 2 * (32 - w + 1)
        assert r["affected_docs"] == 2
    assert rows[64]["n_dup_spans"] == 0
    assert rows[64]["dup_positions"] == 0
    assert rows[64]["affected_docs"] == 0
    # the spectrum is monotone: wider spans can only trigger less
    ppms = [rows[w]["dup_ppm"] for w in SPECTRUM_WIDTHS]
    assert ppms == sorted(ppms, reverse=True)
    # every positional span is accounted (doc lengths 112, 112, 72)
    for w in SPECTRUM_WIDTHS:
        expect = sum(max(0, n - w + 1) for n in (112, 112, 72))
        assert rows[w]["n_spans"] == expect


# ------------------------------------------- nearest-centroid classifier


def test_centroid_classifier_separable_labels_are_diagonal(spark, tmp_path):
    """Two orthogonal label clouds classify perfectly; a deliberately
    flipped vector produces exactly one off-diagonal cell."""
    rows = []
    for i in range(8):
        rows.append((i, [10.0 + i * 0.01, 0.1, 0.0, 0.0], 0))
    for i in range(8):
        rows.append((100 + i, [0.1, 10.0 + i * 0.01, 0.0, 0.0], 1))
    # vec 999 is labeled 0 but sits in label 1's direction
    rows.append((999, [0.0, 50.0, 0.0, 0.0], 0))
    sf = _write_vecs(spark, tmp_path, rows)
    out = sim_centroid_classifier(spark, sf).collect()
    cells = {(r["actual_label"], r["predicted_label"]): r for r in out}
    assert cells[(0, 0)]["n"] == 8
    assert cells[(0, 1)]["n"] == 1  # the flipped vector
    assert cells[(1, 1)]["n"] == 8
    assert (1, 0) not in cells
    assert cells[(1, 1)]["cell_ppm"] == 1_000_000
    # ppm cells of one actual label sum to ~1e6 (floor division slack)
    s = cells[(0, 0)]["cell_ppm"] + cells[(0, 1)]["cell_ppm"]
    assert 999_998 <= s <= 1_000_000
    assert cells[(0, 0)]["actual_total"] == 9


# --------------------------------------------- repeat-upsampling plan


def test_repeat_upsampling_caps_and_deficits(spark, tmp_path):
    """A dominant source donates quota to a tiny one; the tiny source's
    epoch count hits the cap and reports its unmet deficit."""
    big = [(i, " ".join(f"t{i}_{j}" for j in range(100)), "big") for i in range(64)]
    tiny = [(1000, " ".join(f"u{j}" for j in range(10)), "tiny")]
    sf = _write_docs(spark, tmp_path, big + tiny)
    out = {r["source"]: r for r in sample_repeat_upsampling(spark, sf).collect()}
    bigr, tinyr = out["big"], out["tiny"]
    assert bigr["n_tokens"] == 6400 and tinyr["n_tokens"] == 10
    # temperature flattening: big is capped below its raw share ...
    assert bigr["quota_tokens"] < bigr["n_tokens"]
    assert bigr["epochs_needed"] == 1 and bigr["deficit_tokens"] == 0
    assert bigr["tokens_served"] == bigr["quota_tokens"]
    # ... and tiny is upsampled past the epoch cap, leaving a deficit
    assert tinyr["epochs_needed"] > REPEAT_MAX_EPOCHS
    assert tinyr["epochs_planned"] == REPEAT_MAX_EPOCHS
    assert tinyr["tokens_served"] == REPEAT_MAX_EPOCHS * tinyr["n_tokens"]
    assert tinyr["deficit_tokens"] == tinyr["quota_tokens"] - tinyr["tokens_served"]
    assert tinyr["upsample_ppm"] == REPEAT_MAX_EPOCHS * 1_000_000
    # quotas never exceed the corpus-wide token budget
    assert sum(r["quota_tokens"] for r in out.values()) <= 6410


def test_repeat_quota_overflow_guard_fires(spark):
    """ADVICE r6: past ~1e18 the total_tokens * isqrt product would
    silently WRAP in int64 — the quota expression must raise loudly
    instead. Drive the guarded expression directly with literals just
    past the boundary (and prove an in-range frame is untouched)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from etl_financial_report_spark.operators.sampling import repeat_quota_guarded

    over = spark.createDataFrame(
        [(2**62, 4, 10)], "total_tokens long, isqrt long, total_isqrt long"
    )
    with pytest.raises(SparkRuntimeException, match="rescale isqrt"):
        over.select(repeat_quota_guarded().alias("q")).collect()

    ok = spark.createDataFrame(
        [(2**40, 1000, 2000), (123, 0, 2000)],
        "total_tokens long, isqrt long, total_isqrt long",
    )
    got = [r.q for r in ok.select(repeat_quota_guarded().alias("q")).collect()]
    assert got == [(2**40) * 1000 // 2000, 0]


# ------------------------------------------------- hybrid retrieval


def _hybrid_fixture(spark, tmp_path):
    kw = "spark"
    docs = [
        (0, "plain filler text", "s"),          # query doc, no keyword
        (1, f"{kw} {kw} {kw} pad", "s"),        # kw x3, high cosine
        (2, f"{kw} other words here", "s"),     # kw x1, orthogonal vector
        (3, "no keyword at all", "s"),          # high cosine, filtered out
        (4, f"{kw} {kw} pad pad", "s"),         # kw x2, NO vector
        (5, f"{kw} tail tail tail", "s"),       # kw x1, mid cosine
    ]
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.1, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [1.0, 0.0, 0.1, 0.0], 0),
        (5, [0.9, 0.2, 0.0, 0.0], 0),
    ]
    _write_docs(spark, tmp_path, docs)
    return _write_vecs(spark, tmp_path, vecs)


def test_hybrid_retrieval_filters_then_ranks(spark, tmp_path):
    from etl_financial_report_spark.operators.similarity import (
        sim_hybrid_retrieval,
    )

    sf = _hybrid_fixture(spark, tmp_path)
    out = sim_hybrid_retrieval(spark, sf).collect()
    # only keyword docs WITH a vector survive (3 lacks the kw, 4 a vector),
    # ranked by exact cosine to vec 0
    assert [r["doc_id"] for r in out] == [1, 5, 2]
    assert [r["n_kw"] for r in out] == [3, 1, 1]
    assert out[0]["cosine"] > out[1]["cosine"] > out[2]["cosine"]


def test_hybrid_rrf_both_lists_beat_one(spark, tmp_path):
    from etl_financial_report_spark.operators.similarity import (
        RRF_K,
        sim_hybrid_rrf_fusion,
    )

    sf = _hybrid_fixture(spark, tmp_path)
    rows = sim_hybrid_rrf_fusion(spark, sf).collect()
    order = [r["doc_id"] for r in rows]
    # doc1 leads (rank 1 in BOTH lists); docs 2 and 5 have mirrored ranks
    # (kw 3/vec 4 vs kw 4/vec 3) -> equal scores, id tie-break; the
    # single-list docs 3 (vector only) and 4 (keyword only) trail
    assert order == [1, 2, 5, 3, 4]
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["rrf_score"] == 2 * (1.0 / (RRF_K + 1))
    assert by_id[2]["rrf_score"] == by_id[5]["rrf_score"]
    assert by_id[4]["kw_rank"] == 2 and by_id[4]["v_rank"] is None
    assert by_id[3]["kw_rank"] is None and by_id[3]["v_rank"] == 2


# --------------------------------------------------- dedup funnel


def test_dedup_funnel_attributes_each_stage(spark, tmp_path):
    """One engineered casualty per stage: an exact copy, a chunk-heavy
    doc, an LSH near-dup, and a semantic (embedding) dup — the funnel
    must attribute exactly one drop to each stage, in order."""
    from etl_financial_report_spark.operators.dedup import (
        pipeline_dedup_funnel,
    )

    def soup(prefix, n):
        return " ".join(f"{prefix}{i}" for i in range(n))

    base = {i: soup(f"d{i}_", 40) for i in range(1, 6)}
    d2 = soup("c2_", 48)                       # 3 chunks of 16
    d2_first_chunk = " ".join(d2.split()[:16])
    d3 = base[3].split()
    mut = list(d3)
    for c in range(3):                         # one token changed PER chunk
        mut[c * 16 + 3] = f"mut{c}"
    docs = [
        (1, base[1], "s"),
        (2, d2, "s"),
        (3, base[3], "s"),
        (4, base[4], "s"),
        (5, base[5], "s"),
        (10, base[1], "s"),                    # exact copy of 1
        (20, d2_first_chunk + " " + soup("u20_", 16), "s"),  # 1 of 2 chunks dup
        (30, " ".join(mut), "s"),              # near-dup of 3, no dup chunk
        (40, soup("q40_", 40), "s"),
        (41, soup("q41_", 40), "s"),
    ]
    vecs = [
        (40, [5.0, 1.0, 0.5, 0.0], 0),
        (41, [5.0, 1.1, 0.5, 0.0], 0),         # cosine ~1 with 40
    ]
    _write_docs(spark, tmp_path, docs)
    sf = _write_vecs(spark, tmp_path, vecs)
    rows = pipeline_dedup_funnel(spark, sf).collect()
    got = [(r["stage"], r["n_in"], r["n_dropped"], r["n_out"]) for r in rows]
    assert got[:4] == [
        ("exact", 10, 1, 9),
        ("chunk_heavy", 9, 1, 8),
        ("lsh_near_dup", 8, 1, 7),
        ("semantic", 7, 1, 6),
    ]
    # stage 5 (r13): the model gate on the 6 survivors at the swept bar —
    # pinned semantically against the classifier's own margins rather
    # than a magic count (the tiny synthetic corpus trains a degenerate
    # model; what matters is the stage applies margin > qbar and chains)
    st5 = got[4]
    assert st5[0] == "model_quality" and st5[1] == 6
    assert st5[3] == st5[1] - st5[2] and 0 <= st5[3] <= 6
    ppm = {r["stage"]: r["drop_ppm"] for r in rows}
    assert ppm["exact"] == 100_000 and ppm["semantic"] == 142_857
    assert ppm["model_quality"] == (st5[2] * 1_000_000) // 6


# --------------------------------------------- IVF nprobe recall sweep


def test_nprobe_sweep_monotone_and_exhaustive_at_full_width(spark, sf_dir):
    """Recall@10 must be non-decreasing in nprobe, and probing all
    N_CELLS cells must recover the exact top-10 (recall exactly 1.0) —
    the self-check that the cell partition never loses a candidate."""
    from etl_financial_report_spark.operators.similarity import (
        IVF_NPROBE_SWEEP,
        N_CELLS,
        sim_ann_ivf_nprobe_sweep,
    )

    rows = sim_ann_ivf_nprobe_sweep(spark, sf_dir).collect()
    assert [r["nprobe"] for r in rows] == list(IVF_NPROBE_SWEEP)
    recalls = [r["mean_recall_at_10"] for r in rows]
    assert recalls == sorted(recalls)
    by_np = {r["nprobe"]: r for r in rows}
    assert N_CELLS in by_np
    assert by_np[N_CELLS]["mean_recall_at_10"] == 1.0
    assert by_np[N_CELLS]["n_overlap"] == by_np[N_CELLS]["n_queries"] * 10
    # a narrow probe must actually prune (otherwise the sweep is vacuous)
    assert by_np[IVF_NPROBE_SWEEP[0]]["mean_recall_at_10"] < 1.0


# ----------------------------------------------- constraint report


def test_constraint_report_every_rule_binds(spark, tmp_path):
    """Engineer exactly ONE violation per constraint on top of the clean
    sf0.001 tables: every rule must fire with count 1 (a rule that can't
    fire is untested), and on the pristine tables all must pass."""
    import os

    from etl_financial_report_spark.io import load_table
    from etl_financial_report_spark.operators.pipelines import (
        pipeline_constraint_report,
    )

    src = "/root/testdata/sf0.001"
    clean = {
        r["constraint_name"]: r
        for r in pipeline_constraint_report(spark, src).collect()
    }
    assert all(r["passed"] and r["n_violations"] == 0 for r in clean.values())
    assert len(clean) == 12

    def first_mut(name, **changes):
        row = load_table(spark, src, name).limit(1)
        for col, val in changes.items():
            row = row.withColumn(col, F.lit(val).cast(dict(row.dtypes)[col]))
        return row

    def write(name, extra_rows):
        df = load_table(spark, src, name)
        for r in extra_rows:
            df = df.unionByName(r)
        df.write.parquet(str(tmp_path / f"{name}.parquet"))

    write("nation", [first_mut("nation", n_nationkey=9000, n_regionkey=9999)])
    write("customer", [
        first_mut("customer"),                                   # dup key
        first_mut("customer", c_custkey=8999, c_nationkey=8888), # bad fk
    ])
    write("orders", [first_mut("orders", o_orderkey=555555, o_custkey=7777)])
    write("lineitem", [
        first_mut("lineitem", l_orderkey=666666),
        first_mut("lineitem", l_partkey=666666),
        first_mut("lineitem", l_suppkey=666666),
        first_mut("lineitem", l_quantity=0.0),
        first_mut("lineitem", l_discount=0.9),
        # ADVICE r6: three-valued logic drops NULLs from a bare
        # NOT (x > 0) and NaN compares greater than 0 — both must
        # VIOLATE under the explicit null/NaN-hostile rules
        first_mut("lineitem", l_quantity=None),
        first_mut("lineitem", l_quantity=float("nan")),
        first_mut("lineitem", l_discount=None),
        first_mut("lineitem", l_discount=float("nan")),
    ])
    write("documents", [first_mut("documents")])                 # dup doc_id
    write("embeddings", [first_mut("embeddings", vec_id=999999)])
    write("events", [first_mut("events", user_id=None)])
    for name in ("region", "part", "supplier"):
        os.symlink(f"{src}/{name}.parquet", str(tmp_path / f"{name}.parquet"))

    dirty = {
        r["constraint_name"]: r
        for r in pipeline_constraint_report(spark, str(tmp_path)).collect()
    }
    assert len(dirty) == 12
    # the domain rules fire once per engineered bad value (0.0/NULL/NaN
    # for quantity; 0.9/NULL/NaN for discount); everything else once
    expected = {"lineitem_quantity_positive": 3, "lineitem_discount_range": 3}
    for name, r in dirty.items():
        assert r["n_violations"] == expected.get(name, 1), (name, r)
        assert not r["passed"]


# ------------------------------------------------- shard manifests


def test_manifest_drift_flags_exactly_the_batch_shards(spark):
    """A shard's checksum must move iff the daily batch slice
    (doc_id % 10 == 7) touched it — computed independently here with
    hashlib over the raw parquet, so the operator's portable shard hash
    and XOR accounting are both cross-checked outside Spark and DuckDB."""
    import hashlib

    import pyarrow.parquet as pq

    from etl_financial_report_spark.operators.pipelines import N_MANIFEST_SHARDS

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    shard_of = lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % N_MANIFEST_SHARDS  # noqa: E731
    batch_shards = {shard_of(d) for d in t.doc_id if d % 10 == 7}

    rows = {
        r.shard: r
        for r in registry.all_queries()["pipeline_manifest_drift"]
        .fn(spark, sf)
        .collect()
    }
    assert set(rows) == {shard_of(d) for d in t.doc_id}
    for shard, r in rows.items():
        assert r.changed == (shard in batch_shards), (shard, r)
        assert (r.verdict != "unchanged") == (shard in batch_shards)
        assert r.added_docs == sum(
            1 for d in t.doc_id if d % 10 == 7 and shard_of(d) == shard
        )


def test_manifest_drift_surfaces_fully_dropped_shards(spark):
    """A shard present in the previous manifest but entirely absent from
    the current one (all its docs dropped) must surface as
    'shard_dropped' with cur_docs=0 — the full-outer contract; with a
    cur-LEFT-join it would silently vanish from the report."""
    from etl_financial_report_spark.operators.pipelines import manifest_drift_frames

    prev = spark.createDataFrame(
        [(0, 5, 111), (1, 3, 222), (2, 4, 333)],
        "shard int, prev_docs long, prev_xor long",
    )
    cur = spark.createDataFrame(
        [(0, 5, 111), (1, 4, 999), (3, 2, 444)],
        "shard int, n_docs long, content_xor60 long",
    )
    rows = {r.shard: r for r in manifest_drift_frames(prev, cur).collect()}
    assert set(rows) == {0, 1, 2, 3}  # prev-only shard 2 is NOT dropped
    assert rows[2].verdict == "shard_dropped"
    assert rows[2].cur_docs == 0 and rows[2].added_docs == -4 and rows[2].changed
    assert rows[0].verdict == "unchanged" and not rows[0].changed
    assert rows[1].verdict == "content_changed"
    assert rows[3].verdict == "new_shard" and rows[3].prev_docs == 0


def test_shard_checksum_flips_on_any_single_doc_mutation(spark, tmp_path):
    """The integrity contract: corrupt ONE doc's text and exactly its
    shard's content_xor60 (and nothing else) must change."""
    import hashlib

    from etl_financial_report_spark.io import load_table
    from etl_financial_report_spark.operators.pipelines import N_MANIFEST_SHARDS

    src = "/root/testdata/sf0.001"
    docs = load_table(spark, src, "documents")
    victim = docs.orderBy("doc_id").first()
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim.doc_id, F.concat("text", F.lit(" CORRUPT")))
        .otherwise(F.col("text")),
    )
    mutated.write.parquet(str(tmp_path / "documents.parquet"))

    q = registry.all_queries()["pipeline_shard_checksums"].fn
    clean = {r.shard: r for r in q(spark, src).collect()}
    dirty = {r.shard: r for r in q(spark, str(tmp_path)).collect()}
    assert set(clean) == set(dirty)
    vshard = (
        int(hashlib.md5(str(victim.doc_id).encode()).hexdigest()[:8], 16)
        % N_MANIFEST_SHARDS
    )
    for shard in clean:
        same = clean[shard].content_xor60 == dirty[shard].content_xor60
        assert same == (shard != vshard), shard
        assert clean[shard].n_docs == dirty[shard].n_docs
