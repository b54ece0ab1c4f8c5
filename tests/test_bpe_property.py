"""Property test: the distributed BPE trainer (textops.bpe_merge_table)
must agree merge-for-merge with a pure-Python reference implementation of
Sennrich-style BPE on arbitrary word multisets — same weighting, same
(count desc, left, right) tie-break, same left-to-right non-overlapping
merge application. The operator's two-space-separator replace() exists
BECAUSE this test falsified the single-space scheme (the shared boundary
space was consumed, skipping every other pair inside an 'aaaa' run)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_financial_report_spark.operators.textops import bpe_merge_table

_word = st.text(alphabet="abc", min_size=1, max_size=6)
_corpus = st.lists(st.tuples(_word, st.integers(min_value=1, max_value=9)),
                   min_size=1, max_size=12, unique_by=lambda t: t[0])


def _ref_bpe(words: list[tuple[str, int]], rounds: int):
    """Pure-Python reference: symbol lists per word, weighted pair counts,
    deterministic argmax, left-to-right non-overlapping merge."""
    seqs = {w: list(w) + ["</w>"] for w, _ in words}
    freq = dict(words)
    out = []
    for rnd in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq[w]
        if not counts:
            break
        # argmax: count desc, then (left, right) lexicographic asc
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rnd, left, right, cnt, left + right))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2  # non-overlapping, left-to-right
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    return out


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_bpe_matches_pure_python_reference(spark, corpus):
    rounds = 3
    words = spark.createDataFrame(corpus, "tok string, n long")
    got = [
        (r.round, r.left_sym, r.right_sym, r.pair_count, r.merged_sym)
        for r in bpe_merge_table(words, rounds=rounds)
        .orderBy("round")
        .collect()
    ]
    want = _ref_bpe(corpus, rounds)
    # the operator emits one row per round unconditionally; single-symbol
    # degenerate corpora can exhaust pairs — compare the common prefix
    assert got[: len(want)] == want
    if len(got) > len(want):
        # rounds past exhaustion have no pairs left: the distributed
        # argmax over an empty frame yields no row, so lengths must match
        raise AssertionError(f"extra merge rounds emitted: {got[len(want):]}")


def test_bpe_32_rounds_matches_reference_with_bounded_plan(spark):
    """VERDICT r4 item 2: the trainer must reach REAL merge counts. A
    corpus rich enough to sustain 32 distinct merges is trained for 32
    rounds and compared merge-for-merge against the pure-Python
    reference; the final sequence frame's plan must hang off the last
    localCheckpoint (depth bounded by BPE_CHECKPOINT_EVERY, not rounds) —
    the stacked-replace chain the r4 verdict called out cannot scale to a
    tokenizer's ~32k merges."""
    from etl_financial_report_spark.operators.textops import (
        BPE_CHECKPOINT_EVERY,
        bpe_final_sequences,
    )

    # varied lengths/weights over a 6-letter alphabet: dozens of distinct
    # pairs, so 32 rounds never exhaust
    corpus = [
        (w, 1 + (i * 7) % 9)
        for i, w in enumerate(
            "banana bandana cabana abracadabra dead beef fed face cafe bead "
            "abcdef fedcba deadbeef feedface decafbad beaded fade bade".split()
        )
    ]
    rounds = 32
    words = spark.createDataFrame(corpus, "tok string, n long")
    got = [
        (r.round, r.left_sym, r.right_sym, r.pair_count, r.merged_sym)
        for r in bpe_merge_table(words, rounds=rounds).orderBy("round").collect()
    ]
    want = _ref_bpe(corpus, rounds)
    assert len(want) == rounds, "corpus must sustain all 32 merges"
    assert got == want

    # plan size: within a window each round references the prior seq twice
    # (once directly, once through best), so an un-truncated 32-round plan
    # would carry 2^32-1 replace() nodes; the checkpoint bounds it at
    # 2^K-1 for the rounds since the last pin — constant per window no
    # matter how many total merges run
    final = bpe_final_sequences(words, rounds=rounds)
    n_replace = final._jdf.queryExecution().analyzed().toString().count("replace(")
    assert 0 < n_replace < 2**BPE_CHECKPOINT_EVERY


def test_bpe_reference_merge_is_leftmost_nonoverlapping():
    # the ' l l l ' convention both engines implement via string replace
    assert _ref_bpe([("lll", 1)], 1)[0][:3] == (1, "l", "l")
    seqs_after = _ref_bpe([("llll", 1)], 2)
    # round 1 merges (l,l) pairwise left-to-right: l l l l </w> -> ll ll </w>
    assert seqs_after[0] == (1, "l", "l", 3, "ll")
    # round 2: (ll,ll) and (ll,</w>) tie at 1; '<' sorts before 'l', so the
    # (count desc, left, right) tie-break picks (ll, </w>)
    assert seqs_after[1][:3] == (2, "ll", "</w>")


def _rich_corpus(n_words: int = 400) -> list[tuple[str, int]]:
    """Deterministic corpus rich enough to sustain hundreds of merges with
    pair counts >= 2: words share heavy prefixes/suffixes by construction
    (a linear-congruential generator, no RNG imports)."""
    alphabet = "abcdef"
    corpus, seen, x = [], set(), 7
    while len(corpus) < n_words:
        x = (x * 1103515245 + 12345) % (2**31)
        length = 6 + (x % 7)
        w = "".join(alphabet[(x >> (3 * i)) % 6] for i in range(length))
        if w not in seen:
            seen.add(w)
            corpus.append((w, 1 + (x % 9)))
    return corpus


def _ref_bpe_early_stop(words, rounds, min_pair_count):
    """Reference with the production early-stop: stop BEFORE emitting a
    merge whose count falls below the threshold."""
    out = []
    for row in _ref_bpe(words, rounds):
        if row[3] < min_pair_count:
            break
        out.append(row)
    return out


@pytest.mark.slow
def test_bpe_256_rounds_early_stop_flat_cost(spark):
    """VERDICT r5 item 4, both done-criteria in one measured run: the
    trainer at 256 rounds in eager production mode (min_pair_count
    early-stop, literal-winner rewrite) must agree merge-for-merge with
    the pure-Python reference INCLUDING where it stops, and per-round
    wall-clock must be flat in the round number — the literal-winner
    rewrite plus checkpoint cadence keep every round's plan O(cadence),
    so round 200 costs what round 20 did. An un-truncated lineage would
    grow per-round cost superlinearly and blow the 3x ratio bound.

    The corpus rides one partition and one shuffle partition for the
    duration: per-round cost at this scale is pure scheduler overhead,
    and 256 eager rounds at the session default's 32-task shuffles cost
    ~2 s/round for 400 rows — measurement noise, not signal."""
    import time

    corpus = _rich_corpus()
    words = spark.createDataFrame(corpus, "tok string, n long").coalesce(1)

    def run(rounds):
        t0 = time.monotonic()
        got = [
            (r.round, r.left_sym, r.right_sym, r.pair_count, r.merged_sym)
            for r in bpe_merge_table(words, rounds=rounds, min_pair_count=2)
            .orderBy("round")
            .collect()
        ]
        return got, (time.monotonic() - t0) / len(got)

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        got32, per32 = run(32)
        got256, per256 = run(256)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    want = _ref_bpe_early_stop(corpus, 256, 2)
    assert len(want) >= 200, f"corpus must sustain deep training, got {len(want)}"
    assert got256 == want
    assert got32 == want[:32]
    # generous 3x bound: absorbs scheduler noise, catches lineage growth
    assert per256 < 3 * per32, (per32, per256)
