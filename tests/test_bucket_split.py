"""Exact-collapse + recursive-split + probe-backstop policy for the
embedding pair path (VERDICT r8/r9 top ask): identical vectors must
COLLAPSE to one count-weighted representative before any bucketing (no
sign split can separate them), distinct vectors in a hot bucket must
keep splitting on further sign-bit prefixes, and a full-depth bucket
still over the backstop must pair members with its min-id representative
(O(bucket) probes) instead of dropping them. sf0.01/sf0.1 never reach
SIM_SPLIT_CAP, so these synthetic corpora are what actually exercise the
collapse/split/backstop branches; the x10/skew scale smokes assert
engagement on replicated real data."""

import itertools
from collections import Counter

import numpy as np
import pytest

from etl_financial_report_spark.functions.vectors import QUANT_SCALE
from etl_financial_report_spark.operators import similarity as S

DIM = 16  # exactly SIM_SPLIT_LEVELS * SIGN_BUCKET_BITS sign coordinates


def _make_corpus(spark, tmp_path, vecs, ids=None):
    ids = list(range(len(vecs))) if ids is None else ids
    rows = [(i, [float(x) for x in v], 0) for i, v in zip(ids, vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = str(tmp_path / "corpus")
    import os

    os.makedirs(out, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def _quantize_ref(vecs):
    """parquet stores float32; Spark's round() is HALF_UP (numpy's is
    banker's)."""
    v64 = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    return (np.sign(v64) * np.floor(np.abs(v64) * QUANT_SCALE + 0.5)).astype(
        np.int64
    )


def _expected_pairs(vecs, ids, split_cap, max_bucket, threshold=0.3):
    """Pure-python reference of the whole policy + pairing: exact
    collapse -> star edges; prefix-occupancy recursive split over
    representatives; live-bucket all-pairs; hot-bucket anchor probes."""
    q = _quantize_ref(vecs)
    by_id = {ids[i]: q[i] for i in range(len(ids))}
    groups = {}
    for i in sorted(by_id):
        groups.setdefault(by_id[i].tobytes(), []).append(i)
    pairs = set()
    reps = []
    for members in groups.values():
        r = min(members)
        reps.append(r)
        for m in members:
            if m != r and int(np.dot(by_id[m], by_id[m])) > 0:
                pairs.add((r, m))  # star edge
    levels = S.SIM_SPLIT_LEVELS

    def bits(i, off):
        v = by_id[i]
        return sum(
            (1 << (3 - k))
            for k in range(4)
            if off + k < len(v) and v[off + k] > 0
        )

    b = {r: [bits(r, 4 * d) for d in range(levels)] for r in reps}
    occs = [Counter(tuple(b[r][: d + 1]) for r in reps) for d in range(levels)]
    bucket, bn = {}, {}
    for r in reps:
        for d in range(levels):
            pref = tuple(b[r][: d + 1])
            if occs[d][pref] <= split_cap or d == levels - 1:
                bucket[r], bn[r] = pref, occs[d][pref]
                break

    def cos(a, c):
        na = float(np.dot(by_id[a], by_id[a]))
        nc = float(np.dot(by_id[c], by_id[c]))
        if na == 0 or nc == 0:
            return 0.0
        return float(np.dot(by_id[a], by_id[c])) / (np.sqrt(na) * np.sqrt(nc))

    for a, c in itertools.combinations(sorted(reps), 2):
        if bucket[a] == bucket[c] and bn[a] <= max_bucket:
            if cos(a, c) > threshold:
                pairs.add((a, c))
    hot = {}
    for r in reps:
        if bn[r] > max_bucket:
            hot.setdefault(bucket[r], []).append(r)
    for members in hot.values():
        anchor = min(members)
        for m in members:
            if m != anchor and cos(anchor, m) > threshold:
                pairs.add((anchor, m))
    return pairs


def _got_pairs(spark, sf):
    return {
        (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
        for r in S.sim_bucketed_cosine_pairs(spark, sf).collect()
    }


def test_exact_collapse_emits_stars_not_quadratic(spark, tmp_path):
    """25 identical copies + 3 distinct strangers: the identical group
    must collapse to ONE representative (stats prove it) and contribute
    exactly 24 star edges — never C(25,2) matmul pairs."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=DIM)
    vecs = [base.copy() for _ in range(25)] + [rng.normal(size=DIM) for _ in range(3)]
    sf = _make_corpus(spark, tmp_path, vecs)

    stats = S.sim_bucket_occupancy_stats(spark, sf).first()
    assert stats.n_vectors == 28
    assert stats.n_distinct == 4
    assert stats.max_group_n == 25
    assert stats.hot_buckets == 0 and stats.recovered_probes == 0

    got = _got_pairs(spark, sf)
    assert got == _expected_pairs(
        vecs, list(range(28)), S.SIM_SPLIT_CAP, S.SIM_MAX_BUCKET
    )
    stars = {(0, m) for m in range(1, 25)}
    assert stars <= got  # every copy reaches the representative


def test_split_engages_and_pairs_match_reference(spark, tmp_path, monkeypatch):
    """60 distinct vectors land in sign bucket 15 (all-positive lead
    coords) with a cap of 20 -> the bucket splits on the next prefix; 5
    more sit in bucket 0 (under the cap, unsplit). Pairs must equal the
    python reference of the same policy."""
    rng = np.random.default_rng(7)
    vecs = []
    for i in range(60):  # hot level-0 bucket 15
        v = rng.normal(size=DIM)
        v[:4] = np.abs(v[:4]) + 0.1
        vecs.append(v)
    for i in range(5):  # cold bucket 0
        v = rng.normal(size=DIM)
        v[:4] = -np.abs(v[:4]) - 0.1
        vecs.append(v)
    sf = _make_corpus(spark, tmp_path, vecs)
    monkeypatch.setattr(S, "SIM_SPLIT_CAP", 20)

    rbk = {r.rep_id: r for r in S.rep_sign_buckets(spark, sf).collect()}
    assert all("." in rbk[i].bucket for i in range(60))  # hot members re-keyed
    assert all(rbk[60 + i].bucket == "0" for i in range(5))  # cold untouched
    assert len({rbk[i].bucket for i in range(60)}) > 1  # split fans out

    got = _got_pairs(spark, sf)
    assert got == _expected_pairs(
        vecs, list(range(65)), split_cap=20, max_bucket=S.SIM_MAX_BUCKET
    )


def test_probe_backstop_recovers_unsplittable_bucket(
    spark, tmp_path, monkeypatch
):
    """Adversarial: 30 DISTINCT vectors share every sign bit (all
    coordinates positive), so no split depth separates them — the
    full-depth bucket stays hot and the backstop must pair every member
    with the min-id representative (29 bounded probes), with the stats
    accounting for exactly that. Nothing silently dropped."""
    rng = np.random.default_rng(11)
    vecs = [np.abs(rng.normal(size=DIM)) + 0.1 for _ in range(30)]
    sf = _make_corpus(spark, tmp_path, vecs)
    monkeypatch.setattr(S, "SIM_SPLIT_CAP", 10)
    monkeypatch.setattr(S, "SIM_MAX_BUCKET", 20)

    live = S.live_sign_buckets(spark, sf, split_cap=10, max_bucket=20)
    assert live.count() == 0  # the whole corpus is one un-splittable bucket

    stats = S.sim_bucket_occupancy_stats(spark, sf).first()
    assert stats.n_distinct == 30
    assert stats.hot_buckets == 1
    assert stats.hot_rep_rows == 30
    assert stats.recovered_probes == 29
    assert stats.max_occupancy == 30

    got = _got_pairs(spark, sf)
    expected = _expected_pairs(vecs, list(range(30)), split_cap=10, max_bucket=20)
    assert got == expected
    # all-positive vectors: every probe clears the 0.3 bar, so the whole
    # cluster is reachable through anchor 0
    assert got == {(0, m) for m in range(1, 30)}


def test_incremental_probes_hot_cluster_anchor(spark, tmp_path, monkeypatch):
    """The r8 gap, embedding side: a NEW near-dup of a capped hot
    cluster must verdict semantic_dup with the cluster anchor as match —
    one anchor probe, never a bucket-sized fan-out and never a silent
    'unique'."""
    rng = np.random.default_rng(13)
    corpus_ids = [i for i in range(40) if i % 10 != 7][:30]
    vecs = [np.abs(rng.normal(size=DIM)) + 0.1 for _ in corpus_ids]
    anchor_id = min(corpus_ids)
    anchor_vec = vecs[corpus_ids.index(anchor_id)]
    # batch vector: scaled (NOT exact) copy of the anchor -> the exact-
    # group candidate path cannot find it; only the anchor probe can
    batch_vec = anchor_vec * 1.5
    sf = _make_corpus(
        spark, tmp_path, vecs + [batch_vec], ids=corpus_ids + [7]
    )
    monkeypatch.setattr(S, "SIM_SPLIT_CAP", 10)
    monkeypatch.setattr(S, "SIM_MAX_BUCKET", 20)

    out = {r.vec_id: r for r in S.dedup_semantic_incremental(spark, sf).collect()}
    assert set(out) == {7}
    assert out[7].verdict == "semantic_dup"
    assert out[7].match_id == anchor_id
    assert out[7].cosine > 0.99


def test_incremental_exact_twin_matches_capped_cluster(
    spark, tmp_path, monkeypatch
):
    """A batch vector EXACTLY equal to a hot-cluster member must match
    through the exact-group join (content key) even though its bucket is
    capped — the boilerplate re-ingest case."""
    rng = np.random.default_rng(17)
    corpus_ids = [i for i in range(40) if i % 10 != 7][:30]
    vecs = [np.abs(rng.normal(size=DIM)) + 0.1 for _ in corpus_ids]
    twin_of = corpus_ids[5]
    sf = _make_corpus(
        spark,
        tmp_path,
        vecs + [vecs[corpus_ids.index(twin_of)].copy()],
        ids=corpus_ids + [7],
    )
    monkeypatch.setattr(S, "SIM_SPLIT_CAP", 10)
    monkeypatch.setattr(S, "SIM_MAX_BUCKET", 20)

    out = {r.vec_id: r for r in S.dedup_semantic_incremental(spark, sf).collect()}
    assert out[7].verdict == "semantic_dup"
    # best match ranks by cosine then min id: the exact twin ties with
    # the anchor probe at ~1.0 only if they are parallel; the twin's
    # cosine is exactly 1.0 so the match is the twin's REPRESENTATIVE
    # unless the anchor is also cosine-1.0 with it
    assert out[7].cosine == pytest.approx(1.0)


def test_tiling_is_invisible(spark, tmp_path, monkeypatch):
    """Tile smaller than the bucket -> identical pairs to one-shot matmul
    (PAIR_TILE_ROWS is a memory knob, never a semantics knob)."""
    rng = np.random.default_rng(3)
    vecs = [rng.normal(size=DIM) for _ in range(50)]
    sf = _make_corpus(spark, tmp_path, vecs)
    base = {
        (r.vec_a, r.vec_b, round(r.cosine, 12))
        for r in S.sim_bucketed_cosine_pairs(spark, sf).collect()
    }
    monkeypatch.setattr(S, "PAIR_TILE_ROWS", 7)
    tiled = {
        (r.vec_a, r.vec_b, round(r.cosine, 12))
        for r in S.sim_bucketed_cosine_pairs(spark, sf).collect()
    }
    assert tiled == base and len(base) > 0
