"""SymSpell variant pairs (operators/dedup.dedup_symspell_variants): the
symmetric-delete key construction must find EXACTLY the Levenshtein<=1
vocabulary pairs — proven against a brute-force all-pairs reference on a
synthetic typo'd corpus (the driver's clean vocabulary has only 3 real
pairs, all via part names, so this corpus is what exercises insertions,
deletions, substitutions, and the distance-2 false-positive kill)."""

import pytest
import itertools

from etl_financial_report_spark.operators.dedup import dedup_symspell_variants


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.slow  # opt-in (driver test budget, optimization r15)
def test_symspell_matches_brute_force(spark, tmp_path):
    words = [
        "table", "tabel", "tble", "tables",   # transpose-ish / del / insert
        "spark", "spork", "shark",            # substitution; sharkXspark dist 2
        "row", "rows", "rob", "r",            # short words, '' deletion key
        "merge", "marge", "purge",            # one dist-1, one dist-2
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(words), "t", "en", 1) for i in range(2)],
        "doc_id long, text string, source string, lang string, n_chars int",
    )
    parts = spark.createDataFrame(
        [(1, "tablet widget", "b", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    sf = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    parts.coalesce(1).write.parquet(f"{sf}/part.parquet")

    got = {
        (r.tok_a, r.tok_b, r.dist)
        for r in dedup_symspell_variants(spark, sf).collect()
    }
    vocab = sorted(set(words) | {"tablet", "widget"})
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(vocab, 2)
        if _lev(a, b) <= 1
    }
    assert want, "corpus must contain variant pairs"
    assert got == want
    # the construction surfaced all three edit kinds
    assert ("table", "tables", 1) in got      # insertion
    assert ("marge", "merge", 1) in got       # substitution
    assert ("table", "tble", 1) in got        # deletion
    assert ("table", "tablet", 1) in got      # cross-vocabulary (part name)
    # a transposition is Levenshtein 2 (no Damerau) and must NOT appear,
    # along with every other deletion-key false positive
    assert not any({a, b} == {"tabel", "table"} for a, b, _ in got)
    assert all(d <= 1 for _, _, d in got)
