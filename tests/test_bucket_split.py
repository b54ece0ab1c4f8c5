"""Hot-bucket split policy for the embedding pair path (VERDICT r4 item
1): a deliberately anisotropic corpus — most vectors crammed into ONE
sign bucket — must (a) split that bucket on the next four sign bits, (b)
produce exactly the within-final-bucket cosine pairs a brute-force
reference computes under the same policy, and (c) drop (with accounting)
any sub-bucket that still exceeds the backstop. sf0.01/sf0.1 never reach
SIM_SPLIT_CAP, so this synthetic corpus is what actually exercises the
split and backstop branches; the x10 scale smoke asserts engagement on
replicated real data."""

import itertools

import numpy as np
import pytest

from etl_financial_report_spark.functions.vectors import QUANT_SCALE
from etl_financial_report_spark.operators import similarity as S

DIM = 16


def _make_corpus(spark, tmp_path, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = str(tmp_path / "corpus")
    import os

    os.makedirs(out, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def _expected_pairs(vecs, split_cap, max_bucket, threshold=0.3):
    """Pure-python reference of the whole policy + pairing. Mirrors the
    engine's numeric path: parquet stores float32, and Spark's round() is
    HALF_UP (numpy's is banker's)."""
    v64 = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    q = (np.sign(v64) * np.floor(np.abs(v64) * QUANT_SCALE + 0.5)).astype(np.int64)
    b0 = [
        sum((1 << (3 - k)) for k in range(4) if v[k] > 0) for v in np.asarray(vecs)
    ]
    b1 = [
        sum((1 << (3 - k)) for k in range(4) if v[4 + k] > 0) for v in np.asarray(vecs)
    ]
    from collections import Counter

    n0 = Counter(b0)
    final = [
        16 + b0[i] * 16 + b1[i] if n0[b0[i]] > split_cap else b0[i]
        for i in range(len(vecs))
    ]
    occ = Counter(final)
    pairs = set()
    for a, b in itertools.combinations(range(len(vecs)), 2):
        if final[a] != final[b] or occ[final[a]] > max_bucket:
            continue
        dot = int(np.dot(q[a], q[b]))
        cos = dot / (
            np.sqrt(float(np.dot(q[a], q[a]))) * np.sqrt(float(np.dot(q[b], q[b])))
        )
        if cos > threshold:
            pairs.add((min(a, b), max(a, b)))
    return pairs


def test_split_engages_and_pairs_match_reference(spark, tmp_path, monkeypatch):
    """60 vectors land in sign bucket 15 (all-positive lead coords) with a
    cap of 20 -> the bucket splits; 5 more sit in bucket 0 (under the cap,
    unsplit). Pairs must equal the python reference of the same policy."""
    rng = np.random.default_rng(7)
    vecs = []
    for i in range(60):  # hot bucket 15: first 4 coords positive
        v = rng.normal(size=DIM)
        v[:4] = np.abs(v[:4]) + 0.1
        vecs.append(v)
    for i in range(5):  # cold bucket 0: first 4 coords negative
        v = rng.normal(size=DIM)
        v[:4] = -np.abs(v[:4]) - 0.1
        vecs.append(v)
    sf = _make_corpus(spark, tmp_path, vecs)
    monkeypatch.setattr(S, "SIM_SPLIT_CAP", 20)

    got_b = S.split_sign_buckets(spark, sf, split_cap=20).collect()
    by_id = {r.vec_id: r.bucket for r in got_b}
    assert all(by_id[i] >= 16 for i in range(60))  # hot members re-keyed
    assert all(by_id[60 + i] == 0 for i in range(5))  # cold bucket untouched
    assert len({by_id[i] for i in range(60)}) > 1  # the split actually fans out

    got = {
        (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
        for r in S.sim_bucketed_cosine_pairs(spark, sf).collect()
    }
    assert got == _expected_pairs(vecs, split_cap=20, max_bucket=S.SIM_MAX_BUCKET)


def test_backstop_drops_still_hot_subbucket_with_accounting(
    spark, tmp_path, monkeypatch
):
    """Adversarial: every vector has IDENTICAL sign pattern in the first 8
    coords, so the split cannot spread them — the backstop must exclude
    the sub-bucket from pairing and the stats query must account for it."""
    rng = np.random.default_rng(11)
    vecs = []
    for i in range(30):
        v = rng.normal(size=DIM)
        v[:8] = np.abs(v[:8]) + 0.1  # all land in b0=15, b1=15
        vecs.append(v)
    sf = _make_corpus(spark, tmp_path, vecs)
    monkeypatch.setattr(S, "SIM_SPLIT_CAP", 10)
    monkeypatch.setattr(S, "SIM_MAX_BUCKET", 20)

    live = S.live_sign_buckets(spark, sf, split_cap=10, max_bucket=20)
    assert live.count() == 0  # the whole corpus is one un-splittable bucket
    assert S.sim_bucketed_cosine_pairs(spark, sf).count() == 0
    stats = S.sim_bucket_occupancy_stats(spark, sf).first()
    assert stats.split_level0 == 1
    assert stats.hot_buckets == 1
    assert stats.dropped_rows == 30


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
