"""Salted two-level top-k-per-key — the skew-safe replacement for a bare
``row_number() OVER (PARTITION BY <content key>)``.

A window partitioned by a corpus-derived key (token, content hash, label)
is the one shape Spark cannot rescue at scale: window partitions are
never partially aggregated and AQE cannot skew-split them, so one hot key
(a stopword's postings, a boilerplate doc's dup cluster) becomes a single
task holding the whole key. For top-k the fix is the same two-level shape
the pack_shards prefix sum uses:

  stage 1: rank within (key, salt) — the hot key's rows spread over
           ``n_salt`` parallel sort tasks; keep rank <= k per cell;
  stage 2: rank the <= n_salt*k survivors within (key) — a provably
           bounded frame — and keep the true global top k.

Exactness: the global top-k of a key is a subset of the union of its
per-cell top-k's (any row in the global top-k is in the top-k of its own
cell), so stage 2 sees every winner. The salt is derived from the
deterministic tiebreak column, never RNG, so results are rerun-stable and
oracle-checkable. ``n_salt`` bounds the skew relief (hot task shrinks by
that factor; sorts spill, so past that it degrades to slow-not-OOM);
raise it for pathological keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default salt fan-out for stage 1 — 32 parallel sort cells per hot key
N_TOPK_SALT = 32


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    tiebreak: Column,
    rank_col: str = "rk",
    n_salt: int = N_TOPK_SALT,
) -> DataFrame:
    """Rows of ``df`` ranked <= ``k`` within each ``keys`` group under
    ``order`` (which MUST end in a total-order tiebreak so ranks are
    deterministic). ``tiebreak`` is any expression unique per row within a
    key group — it seeds the stage-1 salt. Adds ``rank_col``."""
    salt = F.pmod(F.xxhash64(tiebreak), F.lit(n_salt))
    w1 = Window.partitionBy(*keys, "_topk_salt").orderBy(*order)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_topk_salt", salt)
        .withColumn("_topk_r1", F.row_number().over(w1))
        .where(F.col("_topk_r1") <= k)
        .withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= k)
        .drop("_topk_salt", "_topk_r1")
    )
