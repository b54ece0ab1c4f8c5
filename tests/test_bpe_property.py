"""Property test: the distributed BPE trainer (textops.bpe_merge_table)
must agree merge-for-merge with a pure-Python reference implementation of
Sennrich-style BPE on arbitrary word multisets — same weighting, same
(count desc, left, right) tie-break, same left-to-right non-overlapping
merge application. The operator's two-space-separator replace() exists
BECAUSE this test falsified the single-space scheme (the shared boundary
space was consumed, skipping every other pair inside an 'aaaa' run)."""

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


def test_bpe_reference_merge_is_leftmost_nonoverlapping():
    # the ' l l l ' convention both engines implement via string replace
    assert _ref_bpe([("lll", 1)], 1)[0][:3] == (1, "l", "l")
    seqs_after = _ref_bpe([("llll", 1)], 2)
    # round 1 merges (l,l) pairwise left-to-right: l l l l </w> -> ll ll </w>
    assert seqs_after[0] == (1, "l", "l", 3, "ll")
    # round 2: (ll,ll) and (ll,</w>) tie at 1; '<' sorts before 'l', so the
    # (count desc, left, right) tie-break picks (ll, </w>)
    assert seqs_after[1][:3] == (2, "ll", "</w>")
