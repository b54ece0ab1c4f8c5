"""Text-analysis operators over the documents table (north-star surface,
SURVEY.md §2.10): token counting, quality scoring, language-ID heuristic,
fingerprinting. All native Spark expressions — the tokenizer is a split +
higher-order array function, not a UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.topk import topk_per_key
from ..io import load_table
from ..registry import register

#: deterministic marker-word sets for the language-ID heuristic. With real
#: corpora these are character n-gram profiles; the driver's synthetic
#: docs share one vocabulary, so markers are drawn from it — the operator
#: shape (per-lang score -> argmax with stable tie-break) is the real thing.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("window", "sort", "merge"),
    "en": ("the", "fast", "slow"),
    "es": ("a", "table", "row"),
    "fr": ("stream", "batch", "line"),
    "zh": ("spark", "query", "scan"),
}

STOPWORDS = ("the", "a")

#: the oracles' argmax argument list, generated from the SAME sorted
#: LANG_MARKERS the per-language score columns come from — adding or
#: removing a language cannot desynchronize the SQL argmax from the
#: operator's (it used to be a hand-written 5-language literal)
GREATEST_SCORE_SQL = (
    f"greatest({', '.join(f'score_{lang}' for lang in sorted(LANG_MARKERS))})"
)


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def _bigram_structs(ws: Column) -> Column:
    """Adjacent-token (w1, w2) struct array minted executor-side from the
    pre-split token array. Guarded for <2-token docs: Spark's
    ``sequence(1, 0)`` DESCENDS to ``[1, 0]`` (DuckDB's generate_series
    is empty), so ``element_at(ws, 0)`` would throw under ANSI / emit
    null-bigram rows — same hazard, same guard as ``_bpe_chain`` below."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.struct(
            F.element_at(ws, i).alias("w1"),
            F.element_at(ws, i + 1).alias("w2"),
        ),
    )
    return F.when(F.size(ws) >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


@register(
    "text_token_count",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       length(text) AS n_chars_measured,
       (length(text) = n_chars) AS n_chars_consistent
FROM documents
""",
    doc="Token counting: whitespace tokenizer + distinct-token cardinality, all array built-ins.",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars_measured"),
        (F.length("text") == F.col("n_chars")).alias("n_chars_consistent"),
    )


@register(
    "text_quality_score",
    oracle="""
WITH t AS (
    SELECT doc_id, text,
           string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
)
SELECT doc_id,
       n_tokens,
       CAST(length(text) - n_tokens + 1 AS DOUBLE) / n_tokens AS avg_word_len,
       CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(len(list_distinct(toks)) AS DOUBLE) / n_tokens AS ttr,
       (n_tokens >= 20 AND
        CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / n_tokens < 0.3)
           AS passes_quality
FROM t
""",
    doc=(
        "Quality scoring: avg word length, stopword ratio, type-token ratio, "
        "and a pass/fail gate — integer counts divided at the end (deterministic doubles)."
    ),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = stop_hits.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ((F.length("text") - n_tokens + 1).cast("double") / n_tokens).alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tokens).alias("ttr"),
        ((n_tokens >= 20) & (stop_ratio < 0.3)).alias("passes_quality"),
    )


def _lang_score(toks: Column, lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda x: x.isin(*markers)))


@register(
    "text_lang_id",
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang,
           {", ".join(f"len(list_filter(string_split(text, ' '), x -> x IN ({', '.join(repr(m) for m in ms)}))) AS score_{lang}" for lang, ms in sorted(LANG_MARKERS.items()))}
    FROM documents
)
SELECT doc_id,
       CASE {" ".join(f"WHEN score_{lang} >= {GREATEST_SCORE_SQL} THEN '{lang}'" for lang in sorted(LANG_MARKERS))} END AS pred_lang,
       (CASE {" ".join(f"WHEN score_{lang} >= {GREATEST_SCORE_SQL} THEN '{lang}'" for lang in sorted(LANG_MARKERS))} END = lang) AS agrees_with_label
FROM scored
""",
    doc=(
        "Language-ID heuristic: per-language marker-token scores -> argmax with "
        "stable (alphabetical) tie-break; n-gram profile shape without ML deps."
    ),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[_lang_score(toks, lang).alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(F.col(f"score_{sorted(LANG_MARKERS)[0]}") >= best, sorted(LANG_MARKERS)[0])
    for lang in sorted(LANG_MARKERS)[1:]:
        pred = pred.when(F.col(f"score_{lang}") >= best, lang)
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("agrees_with_label"),
    )


@register(
    "text_source_profile",
    oracle="""
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       min(doc_id) AS first_doc
FROM documents
GROUP BY source, lang
""",
    doc="Corpus profiling: per-(source, lang) volume stats — the pipeline-health query.",
)
def text_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "text_regex_tokens",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens,
       len(regexp_extract_all(text, '[0-9]+')) AS n_number_tokens,
       regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9 ]')[1] AS first_token
FROM documents
""",
    doc=(
        "BPE-ish regex tokenizer: lowercase runs / capitalized words / digit "
        "runs / single symbols — regexp_extract_all, no UDF; the token-count "
        "estimator for LLM-pipeline budgeting."
    ),
)
def text_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9 ]"), 0)
    nums = F.regexp_extract_all("text", F.lit(r"[0-9]+"), 0)
    return docs.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(nums).alias("n_number_tokens"),
        # try_element_at: an all-symbol-free doc (empty text, control
        # chars only) has zero tokens — NULL first_token, not an ANSI
        # INVALID_ARRAY_INDEX (tests/test_hostile_corpus.py); DuckDB's
        # list[1] already reads NULL out of bounds
        F.try_element_at(bpe, F.lit(1)).alias("first_token"),
    )


# rolling-hash parameters: base and modulus chosen so acc*B + h stays
# exact in 64-bit in both engines (acc < P=2^31-1, B=131 -> < 2^39)
_RH_B = 131
_RH_P = 2_147_483_647


@register(
    "text_rolling_fingerprint",
    oracle=f"""
SELECT doc_id,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              w -> CAST('0x' || substr(md5(w), 1, 8) AS BIGINT))),
           (acc, h) -> (acc * {_RH_B} + h) % {_RH_P}) AS fingerprint
FROM documents
""",
    doc=(
        "Order-sensitive document fingerprint: polynomial rolling hash over "
        "token hashes (fold, not a set hash — permuted docs get different "
        "fingerprints, unlike minhash/simhash)."
    ),
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hash32

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    fp = F.aggregate(
        F.transform(toks, lambda w: hash32(w)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(_RH_B) + h) % F.lit(_RH_P),
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# ------------------------------------------------------------ UDTF chunker

CHUNK_TOKENS = 32


@register(
    "text_chunk_udtf",
    oracle=f"""
WITH src AS (
    SELECT doc_id, string_split(text, ' ') AS parts
    FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       CAST(t.g AS INTEGER) AS chunk_no,
       array_to_string(list_slice(parts, t.g * {CHUNK_TOKENS} + 1,
                                  least((t.g + 1) * {CHUNK_TOKENS}, len(parts))), ' ') AS chunk,
       CAST(least((t.g + 1) * {CHUNK_TOKENS}, len(parts)) - t.g * {CHUNK_TOKENS} AS INTEGER)
           AS n_tokens
FROM src,
     unnest(generate_series(0, CAST(ceil(len(parts) / {CHUNK_TOKENS}.0) AS BIGINT) - 1)) t(g)
""",
    doc=(
        "Context-window chunking via a Spark 4 Python UDTF (one doc row in, "
        "N chunk rows out) applied with LATERAL — the table-function shape "
        "SURVEY.md §2.9 reserves for 1-in/N-out expansion. Python UDTFs are "
        "the slow path, so the corpus is bounded here; the at-scale twin of "
        "this exact transform is the native slice/posexplode pipeline in "
        "multimodal_frame_sample."
    ),
)
def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType=f"chunk_no int, chunk string, n_tokens int")
    class ChunkDoc:
        def eval(self, text: str):
            toks = text.split(" ")
            for ci in range(0, (len(toks) + CHUNK_TOKENS - 1) // CHUNK_TOKENS):
                window = toks[ci * CHUNK_TOKENS : (ci + 1) * CHUNK_TOKENS]
                yield ci, " ".join(window), len(window)

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100).createOrReplaceTempView(
        "chunk_docs_src"
    )
    return spark.sql(
        "SELECT d.doc_id, c.chunk_no, c.chunk, c.n_tokens "
        "FROM chunk_docs_src d, LATERAL chunk_doc(d.text) c"
    )


#: inverted-index posting-list cap and document-frequency floor: stopword
#: tokens would otherwise accumulate |corpus|-length lists (the classic
#: posting-list skew); rare tokens below the floor are noise for retrieval
POSTINGS_CAP = 10
DF_FLOOR = 5


@register(
    "text_inverted_index",
    oracle=f"""
WITH toks AS (
    SELECT DISTINCT t.tok AS token, doc_id
    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    WHERE length(t.tok) >= 3
)
SELECT token,
       COUNT(*) AS df,
       COALESCE(array_to_string((list_sort(list(doc_id)))[1:{POSTINGS_CAP}], ','), '') AS postings,
       COUNT(*) > {POSTINGS_CAP} AS truncated
FROM toks
GROUP BY token
HAVING COUNT(*) >= {DF_FLOOR}
""",
    doc=(
        "Inverted-index build: tokenize, distinct (token, doc) pairs, then "
        "per token a document frequency plus a sorted, CAPPED posting list "
        "— the retrieval-side dual of text_token_rarity's frequency "
        "broadcast. The cap is the skew defense: stopword tokens hit every "
        "document, and collect_list-then-slice would still buffer "
        "|corpus|-length aggregation state — the single-reducer OOM at "
        "100 TB. Document frequency is a plain groupBy (partial aggs make "
        "the stopword key cheap); the capped posting pick is the salted "
        "two-level top-k (functions/topk.py) — a stopword's postings rank "
        "in n_salt parallel cells, never one window task holding the whole "
        "key — and only then does collect_list run, its state never longer "
        "than the cap."
    ),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("token"), "doc_id")
        .where(F.length("token") >= 3)
        .distinct()
    )
    df_counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= DF_FLOOR)
    )
    # inner join doubles as the DF_FLOOR filter, so sub-floor tokens never
    # enter the ranking; the hot-token probe side is AQE-skew-splittable
    capped = topk_per_key(
        toks.join(df_counts, "token"),
        keys=["token"],
        order=[F.asc("doc_id")],
        k=POSTINGS_CAP,
        tiebreak=F.col("doc_id"),
    )
    from ..functions.canon import csv_longs

    # posting list serializes comma-joined at the output boundary (the
    # driver canonicalizer cannot sort array columns); it is cap-bounded,
    # so the string stays tiny
    return (
        capped.groupBy("token", "df")
        .agg(csv_longs(F.sort_array(F.collect_list("doc_id"))).alias("postings"))
        .select("token", "df", "postings", (F.col("df") > POSTINGS_CAP).alias("truncated"))
    )


@register(
    "text_canonicalize",
    oracle="""
WITH canon AS (
    SELECT doc_id,
           trim(regexp_replace(nfc_normalize(lower(text)), '\\s+', ' ', 'g')) AS ctext,
           text
    FROM documents
)
SELECT doc_id,
       md5(ctext) AS canon_md5,
       length(text) AS n_chars_raw,
       length(ctext) AS n_chars_canon,
       (ctext <> text) AS changed
FROM canon
""",
    doc=(
        "Text canonicalization for dedup keying: lowercase + whitespace "
        "collapse + trim run native (JVM, codegen), and only the one step "
        "built-ins cannot express — unicode NFC composition — drops to an "
        "Arrow-batched pandas UDF. Emits the md5 of the canonical form "
        "(the portable dedup key used upstream of dedup_exact) so the "
        "oracle hash-checks the whole normalization, not just lengths. "
        "UDF discipline per SURVEY.md §2.9: narrowest possible surface, "
        "string in / string out, stateless."
    ),
)
def text_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None else unicodedata.normalize("NFC", t))

    docs = load_table(spark, sf_dir, "documents")
    ctext = F.trim(
        F.regexp_replace(nfc(F.lower(F.col("text"))), r"\s+", " ")
    )
    return docs.select(
        "doc_id",
        F.md5(ctext).alias("canon_md5"),
        F.length("text").alias("n_chars_raw"),
        F.length(ctext).alias("n_chars_canon"),
        (ctext != F.col("text")).alias("changed"),
    )


#: bigram-table floor: pairs seen fewer times are noise for filtering
BIGRAM_FLOOR = 3


@register(
    "text_bigram_lm",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
bigrams AS (
    SELECT ws[i] AS w1, ws[i+1] AS w2
    FROM toks, unnest(generate_series(1, len(ws) - 1)) t(i)
),
pair_counts AS (
    SELECT w1, w2, COUNT(*) AS n_pair FROM bigrams GROUP BY w1, w2
),
ctx_counts AS (
    SELECT w1, SUM(n_pair) AS n_ctx FROM pair_counts GROUP BY w1
)
SELECT p.w1, p.w2, p.n_pair,
       CAST(c.n_ctx AS BIGINT) AS n_ctx,
       CAST(p.n_pair AS DOUBLE) / c.n_ctx AS cond_p
FROM pair_counts p JOIN ctx_counts c ON p.w1 = c.w1
WHERE p.n_pair >= {BIGRAM_FLOOR}
""",
    doc=(
        "Bigram language-model table: corpus-wide (w1, w2) counts, "
        "per-context totals, and the conditional probability as one "
        "integer ratio — the statistics behind perplexity-style corpus "
        "filters and next-token heuristics. Bigrams are minted "
        "executor-side from the pre-split token array (transform over an "
        "index sequence, no self-join of token positions); the context "
        "total is a second-level aggregate OVER pair counts, so the "
        "exchange never carries raw bigrams twice. Counts below the "
        "floor are dropped after counting (exactness preserved)."
    ),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bigrams = (
        docs.select(F.split("text", " ").alias("ws"))
        .select(F.explode(_bigram_structs(F.col("ws"))).alias("bg"))
        .select("bg.w1", "bg.w2")
    )
    pair_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    ctx_counts = pair_counts.groupBy("w1").agg(F.sum("n_pair").alias("n_ctx"))
    return (
        pair_counts.join(ctx_counts, "w1")
        .where(F.col("n_pair") >= BIGRAM_FLOOR)
        .select(
            "w1",
            "w2",
            "n_pair",
            F.col("n_ctx").cast("long").alias("n_ctx"),
            (F.col("n_pair").cast("double") / F.col("n_ctx")).alias("cond_p"),
        )
    )


@register(
    "text_lang_id_eval",
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang,
           {", ".join(f"len(list_filter(string_split(text, ' '), x -> x IN ({', '.join(repr(m) for m in ms)}))) AS score_{lang}" for lang, ms in sorted(LANG_MARKERS.items()))}
    FROM documents
),
pred AS (
    SELECT lang,
           CASE {" ".join(f"WHEN score_{lang} >= {GREATEST_SCORE_SQL} THEN '{lang}'" for lang in sorted(LANG_MARKERS))} END AS pred_lang
    FROM scored
),
cells AS (
    SELECT lang, pred_lang, COUNT(*) AS n_docs FROM pred GROUP BY lang, pred_lang
),
row_tot AS (
    SELECT lang, SUM(n_docs) AS n_actual FROM cells GROUP BY lang
)
SELECT c.lang, c.pred_lang, c.n_docs,
       CAST(r.n_actual AS BIGINT) AS n_actual,
       CAST(c.n_docs AS DOUBLE) / r.n_actual AS frac_of_actual
FROM cells c JOIN row_tot r ON c.lang = r.lang
""",
    doc=(
        "Classifier-eval confusion matrix for the language-ID heuristic "
        "against the labeled ground truth: per (actual, predicted) cell "
        "counts and the per-actual recall fraction — the eval table every "
        "corpus-pipeline classifier needs before its verdicts gate data. "
        "Prediction is the same argmax as text_lang_id; the matrix is one "
        "partial-aggregated groupBy and the per-row totals are a second "
        "two-phase aggregate joined back on the (25-cell-bounded) matrix "
        "frame — no window, no collect."
    ),
)
def text_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    scored = docs.select(
        "lang",
        *[_lang_score(toks, lang).alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(F.col(f"score_{sorted(LANG_MARKERS)[0]}") >= best, sorted(LANG_MARKERS)[0])
    for lang in sorted(LANG_MARKERS)[1:]:
        pred = pred.when(F.col(f"score_{lang}") >= best, lang)
    cells = (
        scored.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    row_tot = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_actual"))
    return cells.join(row_tot, "lang").select(
        "lang",
        "pred_lang",
        "n_docs",
        F.col("n_actual").cast("long").alias("n_actual"),
        (F.col("n_docs").cast("double") / F.col("n_actual")).alias("frac_of_actual"),
    )


#: drift report: ppm-rate scaling and the top-K movers kept
DRIFT_PPM = 1_000_000
DRIFT_TOP_K = 20


@register(
    "corpus_token_drift",
    oracle=f"""
WITH tok AS (
    SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS tok
    FROM documents
),
cnt AS (
    SELECT tok,
           SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_old,
           SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_new
    FROM tok GROUP BY tok
),
tot AS (SELECT SUM(n_old) AS t_old, SUM(n_new) AS t_new FROM cnt),
rated AS (
    SELECT tok, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
           CAST(floor(CAST(n_old * {DRIFT_PPM} AS DOUBLE) / t_old) AS BIGINT) AS ppm_old,
           CAST(floor(CAST(n_new * {DRIFT_PPM} AS DOUBLE) / t_new) AS BIGINT) AS ppm_new
    FROM cnt CROSS JOIN tot
)
SELECT tok, n_old, n_new, ppm_old, ppm_new, ppm_new - ppm_old AS drift_ppm
FROM rated
ORDER BY abs(ppm_new - ppm_old) DESC, tok
LIMIT {DRIFT_TOP_K}
""",
    doc=(
        "Corpus distribution-drift report between two snapshot slices "
        "(deterministic doc_id%2 halves stand in for yesterday/today "
        "crawls): per-token ppm rates in each slice and the signed ppm "
        "drift, top-K movers by |drift| with a total-order tiebreak. One "
        "token-stream pass with conditional partial-aggregated sums, two "
        "scalar totals as a 1-row broadcast, integer ppm rates via the "
        "exact-numerator floor-division grammar — no doubles summed, so "
        "cross-engine parity is exact, and rates (not raw counts) make the "
        "report invariant to slice-size imbalance. The monitoring query a "
        "training-data pipeline runs before accepting a new crawl."
    ),
)
def corpus_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("half"), F.explode(_tokens(F.col("text"))).alias("tok")
    )
    cnt = tok.groupBy("tok").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_new"),
    )
    return token_drift_report(cnt)


def token_drift_report(cnt: DataFrame) -> DataFrame:
    """The drift report over a (tok, n_old, n_new) counts frame — shared by
    the batch query above and the streaming monitor
    (streaming/runtime.run_token_drift_stream), so the two paths are
    rate-for-rate identical by construction."""
    tot = cnt.agg(F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new"))

    def _positive(total: Column, slice_name: str) -> Column:
        # an empty baseline corpus or an all-empty accumulated new slice
        # would otherwise divide by zero -> NULL rates and an arbitrary
        # null-ordered top-K; fail loudly instead (the guard is in the
        # divisor expression itself so column pruning cannot drop it)
        return F.when(total > 0, total).otherwise(
            F.raise_error(
                F.lit(
                    f"token_drift_report: {slice_name} slice has zero tokens"
                    " — drift rates are undefined"
                )
            )
        )

    ppm_old = F.floor(
        (F.col("n_old") * DRIFT_PPM).cast("double") / _positive(F.col("t_old"), "baseline")
    ).cast("long")
    ppm_new = F.floor(
        (F.col("n_new") * DRIFT_PPM).cast("double") / _positive(F.col("t_new"), "new")
    ).cast("long")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.col("n_old").cast("long").alias("n_old"),
            F.col("n_new").cast("long").alias("n_new"),
            ppm_old.alias("ppm_old"),
            ppm_new.alias("ppm_new"),
            (ppm_new - ppm_old).alias("drift_ppm"),
        )
        .orderBy(F.abs(F.col("drift_ppm")).desc(), F.asc("tok"))
        .limit(DRIFT_TOP_K)
    )


#: tokenizer-encoding constants: vocabulary head size, the UNK id, and the
#: training sequence length the id arrays are truncated to
TOKENIZE_VOCAB_K = 1024
UNK_ID = 0
MAX_SEQ_LEN = 64


#: tokenize-encoding CTE block, reused verbatim by the sequence-packing
#: oracle (operators/sampling.pack_token_sequences) — the two queries are
#: token-for-token consistent because they share this SQL
TOKENIZE_IDS_CTES = f"""t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
freq AS (
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
),
vocab AS (
    SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS id
    FROM (SELECT tok, cnt FROM freq ORDER BY cnt DESC, tok LIMIT {TOKENIZE_VOCAB_K})
),
tokpos AS (
    SELECT doc_id, i AS pos, toks[i] AS tok
    FROM t, unnest(generate_series(1, len(toks))) u(i)
),
idtab AS (
    SELECT p.doc_id, p.pos, COALESCE(v.id, {UNK_ID}) AS id
    FROM tokpos p LEFT JOIN vocab v ON p.tok = v.tok
),
tok_docs AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN id = {UNK_ID} THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
           (list(id ORDER BY pos))[1:{MAX_SEQ_LEN}] AS ids
    FROM idtab
    GROUP BY doc_id
)"""


def tokenize_ids_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_unk, ids array<long>) — the composition form
    pack_token_sequences consumes. The registered query serializes the id
    array (the driver canonicalizer cannot sort array columns)."""
    docs = load_table(spark, sf_dir, "documents")
    tokpos = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok")
    )
    freq = tokpos.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    head = freq.orderBy(F.desc("cnt"), F.asc("tok")).limit(TOKENIZE_VOCAB_K)
    # dense ids on the bounded head: pack the <=K rows into ONE sorted array
    # ((-cnt, tok) ascending == (cnt desc, tok asc)), then position = id-1
    vocab = (
        head.agg(
            F.sort_array(
                F.collect_list(F.struct((-F.col("cnt")).alias("negc"), F.col("tok")))
            ).alias("va")
        )
        .select(F.posexplode("va").alias("p", "s"))
        .select(F.col("s.tok").alias("tok"), (F.col("p") + 1).cast("long").alias("id"))
    )
    ids = tokpos.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "pos", F.coalesce(F.col("id"), F.lit(UNK_ID)).alias("id")
    )
    return ids.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("id") == UNK_ID).cast("long")).alias("n_unk"),
        F.slice(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "id"))), lambda s: s["id"]
            ),
            1,
            MAX_SEQ_LEN,
        ).alias("ids"),
    )


@register(
    "text_tokenize_ids",
    oracle=f"""
WITH {TOKENIZE_IDS_CTES}
SELECT doc_id, n_tokens, n_unk,
       COALESCE(array_to_string(ids, ','), '') AS ids
FROM tok_docs
""",
    doc=(
        "Tokenizer encoding — the step that turns cleaned text into the "
        "integer id arrays a trainer consumes: a corpus-derived vocabulary "
        f"(top-{TOKENIZE_VOCAB_K} by frequency, deterministic count-then-"
        "token order, ids dense from 1; everything else maps to UNK=0) "
        f"applied per token, sequences truncated to {MAX_SEQ_LEN}. The "
        "vocabulary head is bounded EXACTLY like text_token_rarity's "
        "broadcast (orderBy+limit is a distributed TakeOrdered, never a "
        "global window); id assignment happens by position on the <=K-row "
        "head via a bounded sort_array, and the token stream joins the "
        "broadcast vocab — the big side never shuffles on token. Per-doc "
        "id order is recovered with a doc_id-partitioned collect over "
        "(pos, id) structs — an entity-bounded group. Output ids are the "
        "comma-serialized form (driver-canonical); tokenize_ids_frame is "
        "the array-typed composition surface."
    ),
)
def text_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.canon import csv_longs

    return tokenize_ids_frame(spark, sf_dir).select(
        "doc_id", "n_tokens", "n_unk", csv_longs("ids").alias("ids")
    )


#: BPE trainer rounds for the REGISTERED query (fixed so the oracle can
#: unroll one CTE stage per merge). Real tokenizers run tens of
#: thousands of merges; the trainer reaches that via the
#: BPE_CHECKPOINT_EVERY lineage truncation below — plan size is bounded
#: per checkpoint window, not per total rounds (proven at 32 rounds by
#: tests/test_bpe_property.py against the pure-Python reference)
BPE_ROUNDS = 3


def _bpe_pairs_sql(seq_cte: str) -> str:
    """Adjacent-symbol pair stream of one BPE round, weighted by word count."""
    return f"""
    SELECT s.l AS l, s.r AS r, SUM(n) AS cnt
    FROM (
        SELECT n, unnest(list_transform(
                   generate_series(1, len(sy) - 1),
                   i -> struct_pack(l := sy[i], r := sy[i + 1]))) AS s
        FROM (SELECT n, string_split(trim(seq), '  ') AS sy FROM {seq_cte})
    )
    GROUP BY s.l, s.r
    """


def _bpe_ctes() -> str:
    # TWO-space separators: the merge pattern ' l  r ' consumes only ONE
    # of r's two trailing spaces, so the next adjacent pair keeps its
    # leading-space anchor and a single replace() pass merges runs
    # left-to-right greedily — textbook BPE (a single-space scheme eats
    # the shared boundary and skips every other pair in a run; caught by
    # tests/test_bpe_property.py against the pure-Python reference).
    ctes = [
        r"""seq0 AS (
    SELECT tok, COUNT(*) AS n,
           ' ' || regexp_replace(tok, '(.)', '\1  ', 'g') || '</w>  ' AS seq
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
)"""
    ]
    for r in range(1, BPE_ROUNDS + 1):
        ctes.append(f"best{r} AS (SELECT l, r, cnt FROM ({_bpe_pairs_sql(f'seq{r - 1}')}) ORDER BY cnt DESC, l, r LIMIT 1)")
        ctes.append(
            f"seq{r} AS (SELECT tok, n, replace(seq, ' ' || b.l || '  ' || b.r || ' ', "
            f"' ' || b.l || b.r || ' ') AS seq FROM seq{r - 1} CROSS JOIN best{r} b)"
        )
    return ",\n".join(ctes)


def _bpe_oracle() -> str:
    selects = [
        f"SELECT {r} AS round, l AS left_sym, r AS right_sym, CAST(cnt AS BIGINT) AS pair_count, l || r AS merged_sym FROM best{r}"
        for r in range(1, BPE_ROUNDS + 1)
    ]
    return "WITH " + _bpe_ctes() + "\n" + "\nUNION ALL\n".join(selects)


@register(
    "text_bpe_merges",
    oracle=_bpe_oracle(),
    doc=(
        f"Byte-pair-encoding tokenizer training, {BPE_ROUNDS} merge rounds "
        "(Sennrich et al. 2016): words become space-delimited character "
        "sequences with an end-of-word symbol; each round counts adjacent "
        "symbol pairs weighted by word frequency (partial-aggregated "
        "groupBy over the DISTINCT-word table, whose size is vocabulary- "
        "not corpus-bounded), takes the argmax with a total-order "
        "tiebreak (a distributed TakeOrdered-1, broadcast back), and "
        "applies the merge as a literal left-to-right non-overlapping "
        "string replace — semantics verified identical in Spark and "
        "DuckDB, so the oracle unrolls the same rounds as CTE stages. "
        "Returns the merge table (round, pair, weighted count, merged "
        "symbol) — the artifact a tokenizer ships. At 100 TB the word-"
        "frequency table is the ONLY corpus-sized pass; every round after "
        "runs on the vocabulary."
    ),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return bpe_merge_table(words)


def bpe_merge_table(
    words: DataFrame, rounds: int = BPE_ROUNDS, min_pair_count: int | None = None
) -> DataFrame:
    """The BPE trainer over any (tok, n) word-frequency frame —
    text_bpe_merges binds it to the documents table; the property test
    (tests/test_bpe_property.py) pins it against a pure-Python reference
    on arbitrary word multisets. ``min_pair_count`` enables the
    production early-stop (see _bpe_chain)."""
    merges, _seq = _bpe_chain(words, rounds, min_pair_count=min_pair_count)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def bpe_final_sequences(
    words: DataFrame, rounds: int = BPE_ROUNDS, min_pair_count: int | None = None
) -> DataFrame:
    """(tok, n, seq) after all merge rounds — the encoded state
    text_bpe_encode exposes as subword segmentations."""
    _merges, seq = _bpe_chain(words, rounds, min_pair_count=min_pair_count)
    return seq


def bpe_corpus_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard (tok, n) word-frequency frame over the documents
    table — the one corpus-sized pass every BPE consumer starts from."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_corpus_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, n, seq) under the default training geometry, memoized per
    (session, corpus snapshot) — the persisted-tokenizer pattern: five
    registered queries (encode, doc-ids, packing, round-trip, fertility)
    consume the SAME trained state, and a real pipeline trains once and
    ships the artifact rather than re-running the merge chain per
    query. Non-default geometries keep calling bpe_final_sequences."""
    from ..io import memo_checkpoint

    return memo_checkpoint(
        spark,
        sf_dir,
        "documents",
        "bpe_sequences",
        lambda: bpe_final_sequences(bpe_corpus_words(spark, sf_dir)),
        extra_key=(BPE_ROUNDS,),
    )


#: lineage truncation cadence for the BPE trainer: every K merge rounds
#: the (1-row) winning pair and the rewritten sequence frame are pinned
#: with localCheckpoint, so plan depth is bounded by K no matter how many
#: merges run — a real tokenizer is ~32k merges, which a stacked
#: replace()-chain plan cannot reach (depth explosion + re-execution of
#: the whole prefix each round). Below the cadence (the registered
#: 3-round query) nothing is pinned and construction stays fully lazy.
BPE_CHECKPOINT_EVERY = 8


def _bpe_chain(
    words: DataFrame,
    rounds: int,
    checkpoint_every: int = BPE_CHECKPOINT_EVERY,
    min_pair_count: int | None = None,
):
    """``min_pair_count`` (VERDICT r5 item 4) switches the trainer into
    the WINDOW-BATCHED eager mode a real tokenizer run uses: rounds are
    built lazily in windows of ``checkpoint_every``, ONE collect per
    window evaluates all of the window's winning pairs (amortizing the
    driver round trip — the per-action floor dominates tiny per-round
    jobs), training STOPS at the first round whose best count falls
    below the threshold (or whose pairs exhaust), trimming the window to
    exactly the reference stop point, and the window's sequence state is
    rebuilt from the collected winners as LITERAL rewrites off the last
    checkpoint — so plan depth AND per-round cost stay flat in the round
    number no matter how many thousand merges run
    (tests/test_bpe_property.py pins both at 256 rounds). None (the
    default, the registered 3-round query) keeps the fully lazy chain
    with identical results."""
    # two-space separators so a single literal replace() merges runs
    # left-to-right greedily (see _bpe_oracle's note)
    seq = words.select(
        "tok",
        "n",
        F.concat(
            F.lit(" "), F.regexp_replace("tok", "(.)", "$1  "), F.lit("</w>  ")
        ).alias("seq"),
    )
    def _pair_structs(frame):
        # NOTE: transform's lambda must stay single-parameter (a second
        # python arg would be read as the index variable by Spark)
        sy = F.split(F.trim(F.col("seq")), "  ")
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(sy) - 1),
            lambda i: F.struct(
                F.element_at(sy, i).alias("l"), F.element_at(sy, i + 1).alias("r")
            ),
        )
        # a fully-merged word is ONE symbol: sequence(1, 0) DESCENDS in
        # Spark (DuckDB's generate_series is empty) and element_at(2)
        # would throw under ANSI — guard to an empty pair list
        # (tests/test_bpe_property.py's single-char-word corpora hit this)
        return F.when(F.size(sy) >= 2, pairs).otherwise(
            F.array().cast("array<struct<l:string,r:string>>")
        )

    def _best_of(frame):
        return (
            frame.select("n", F.explode(_pair_structs(frame)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
        )

    def _rewrite(frame, best):
        return frame.crossJoin(F.broadcast(best)).select(
            "tok",
            "n",
            F.expr(
                "replace(seq, ' ' || l || '  ' || r || ' ', ' ' || l || r || ' ')"
            ).alias("seq"),
        )

    def _merge_row(best, r):
        return best.select(
            F.lit(r).alias("round"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            F.col("cnt").cast("long").alias("pair_count"),
            F.concat("l", "r").alias("merged_sym"),
        )

    if min_pair_count is not None:
        spark = words.sparkSession
        win = max(checkpoint_every, 1)
        merges = []
        r = 1
        while r <= rounds:
            window = list(range(r, min(r + win, rounds + 1)))
            # build the window lazily, then ONE collect evaluates every
            # winner in it (tagged by round — union order is not row order)
            wseq, bests = seq, []
            for wr in window:
                # lazy checkpoints: Spark unions execute branches without
                # common-subtree reuse, so branch k would re-run rounds
                # 1..k-1's aggregates (O(win^2) stages per window); the
                # deferred cache makes each branch reuse its predecessor
                b = _best_of(wseq).localCheckpoint(eager=False)
                bests.append(b.select(F.lit(wr).alias("wr"), "l", "r", "cnt"))
                wseq = _rewrite(wseq, b).localCheckpoint(eager=False)
            allb = bests[0]
            for b in bests[1:]:
                allb = allb.unionByName(b)
            rows = {row["wr"]: row for row in allb.collect()}
            kept = []
            for wr in window:
                row = rows.get(wr)
                if row is None or row["cnt"] < min_pair_count:
                    break  # below-threshold merges are noise — stop here
                kept.append(row)
            # replay ONLY the kept winners as literal rewrites off the
            # window base, so the stopped state never contains a merge
            # past the stop point; pin it as the next window's base
            for row in kept:
                lit = spark.createDataFrame(
                    [(row["l"], row["r"], row["cnt"])],
                    "l string, r string, cnt long",
                )
                merges.append(_merge_row(lit, row["wr"]))
                seq = _rewrite(seq, lit)
            if len(kept) < len(window):
                break
            r += len(kept)
            if r <= rounds:
                seq = seq.localCheckpoint()
        return merges, seq

    merges = []
    for r in range(1, rounds + 1):
        best = _best_of(seq)
        # lineage truncation at the cadence: pin the 1-row winner (so the
        # merge table and every later round hang off a leaf, not the full
        # prefix chain) and the rewritten corpus state
        ckpt = checkpoint_every > 0 and r % checkpoint_every == 0 and r < rounds
        if ckpt:
            best = best.localCheckpoint()
        merges.append(_merge_row(best, r))
        seq = _rewrite(seq, best)
        if ckpt:
            seq = seq.localCheckpoint()
    return merges, seq


#: a bigram is "surprising" when its conditional probability under the
#: corpus LM is below this per-mille threshold (25 = 2.5%; the synthetic
#: 31-word vocabulary puts typical cond_p near 1/31 ~ 3.2%, so the gate
#: BINDS: ~90% of docs carry at least one rare bigram at sf0.01)
RARE_BIGRAM_PER_MILLE = 25


@register(
    "text_lm_novelty",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
bigrams AS (
    SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
    FROM toks, unnest(generate_series(1, len(ws) - 1)) t(i)
),
pair_counts AS (
    SELECT w1, w2, COUNT(*) AS n_pair FROM bigrams GROUP BY w1, w2
),
ctx_counts AS (
    SELECT w1, SUM(n_pair) AS n_ctx FROM pair_counts GROUP BY w1
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN p.n_pair * 1000 < c.n_ctx * {RARE_BIGRAM_PER_MILLE}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       CAST(SUM(CASE WHEN p.n_pair * 1000 < c.n_ctx * {RARE_BIGRAM_PER_MILLE}
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty_frac
FROM bigrams b
JOIN pair_counts p ON b.w1 = p.w1 AND b.w2 = p.w2
JOIN ctx_counts c ON b.w1 = c.w1
GROUP BY b.doc_id
""",
    doc=(
        "Perplexity-proxy document scoring under the corpus's own bigram "
        "LM (the CCNet filter shape, log-free): per doc, the fraction of "
        "its bigrams whose conditional probability is below "
        f"{RARE_BIGRAM_PER_MILLE}/1000. The rarity test is the exact "
        "integer cross-multiplication n_pair*1000 < n_ctx*K — no log(), "
        "whose last-ulp behavior differs across engines, and no float "
        "sums. The doc's bigram stream re-joins the (vocabulary^2-"
        "bounded) LM table on the bigram key — a groupBy-built dimension "
        "joined back, never a window over content keys; high-novelty "
        "docs are the incoherent/ungrammatical tail a perplexity gate "
        "drops, low-novelty the boilerplate head."
    ),
)
def text_lm_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bigrams = (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .select("doc_id", F.explode(_bigram_structs(F.col("ws"))).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
    )
    pair_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    ctx_counts = pair_counts.groupBy("w1").agg(F.sum("n_pair").alias("n_ctx"))
    rare = (F.col("n_pair") * 1000 < F.col("n_ctx") * RARE_BIGRAM_PER_MILLE).cast("long")
    return (
        bigrams.join(pair_counts, ["w1", "w2"])
        .join(ctx_counts, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(rare).alias("n_rare"),
            (F.sum(rare).cast("double") / F.count(F.lit(1))).alias("novelty_frac"),
        )
    )


#: head sizes the coverage curve reports — the vocab-size sizing question
COVERAGE_KS = (16, 64, 256, 1024)


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH freq AS (
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
),
tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_vocab FROM freq),
head AS (
    SELECT list(cnt ORDER BY cnt DESC, tok) AS arr
    FROM (SELECT tok, cnt FROM freq ORDER BY cnt DESC, tok LIMIT {max(COVERAGE_KS)})
)
{" UNION ALL ".join(
    f"SELECT {k} AS vocab_k, "
    f"CAST(list_aggregate(arr[1:{k}], 'sum') AS BIGINT) AS covered_tokens, "
    f"CAST(t.total AS BIGINT) AS total_tokens, "
    f"CAST(t.n_vocab AS BIGINT) AS n_vocab, "
    f"CAST(list_aggregate(arr[1:{k}], 'sum') * 1000000 // t.total AS BIGINT) AS coverage_ppm "
    f"FROM head CROSS JOIN tot t"
    for k in COVERAGE_KS)}
""",
    doc=(
        "Vocabulary coverage curve: what fraction (integer ppm) of the "
        "corpus token stream the top-{16,64,256,1024} frequency head "
        "covers — the sizing question behind text_tokenize_ids' vocab cap "
        "and every UNK-rate budget. One token-stream aggregate; the "
        "ranked head is a bounded TakeOrdered collected to ONE row whose "
        "prefix sums answer all K at once — the corpus is read once and "
        "nothing unbounded is sorted or broadcast."
    ),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = freq.agg(F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_vocab"))
    head = (
        freq.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(max(COVERAGE_KS))
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct((-F.col("cnt")).alias("negc"), "tok"))
                ),
                lambda s: -s["negc"],
            ).alias("arr")
        )
    )
    covered = {
        k: F.aggregate(
            F.slice(F.col("arr"), 1, k), F.lit(0).cast("long"), lambda a, x: a + x
        )
        for k in COVERAGE_KS
    }
    rows = F.array(
        *[
            F.struct(F.lit(k).alias("vocab_k"), covered[k].alias("covered_tokens"))
            for k in COVERAGE_KS
        ]
    )
    return (
        head.crossJoin(F.broadcast(tot))
        .select(F.explode(rows).alias("c"), "total", "n_vocab")
        .select(
            F.col("c.vocab_k").alias("vocab_k"),
            F.col("c.covered_tokens").alias("covered_tokens"),
            F.col("total").cast("long").alias("total_tokens"),
            F.col("n_vocab").cast("long").alias("n_vocab"),
            F.expr("CAST(c.covered_tokens * 1000000 DIV total AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
    )


def _bpe_encode_oracle() -> str:
    # the same trainer CTE chain; the encoding IS the final seq state
    return f"""WITH {_bpe_ctes()}
SELECT tok,
       CAST(n AS BIGINT) AS n_occurrences,
       COALESCE(array_to_string(string_split(trim(seq), '  '), ' '), '') AS subwords,
       CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_subwords
FROM seq{BPE_ROUNDS}
"""


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    doc=(
        f"BPE ENCODING — the other half of the tokenizer: every distinct "
        f"word segmented into subword units under the {BPE_ROUNDS} merges "
        "text_bpe_merges learns (same training chain, so the segmentation "
        "is exactly what that merge table produces; at serving time the "
        "merge table is the persisted artifact and only the replace chain "
        "runs). Output is vocabulary-bounded — one row per distinct word "
        "with its occurrence weight, subword list, and subword count (the "
        "corpus fertility statistic: total subwords = sum n * n_subwords). "
        "Subwords serialize space-joined (tokens are whitespace-split, so "
        "no subword contains a space — lossless; driver-canonical)."
    ),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.canon import joined_strings

    seq = bpe_corpus_sequences(spark, sf_dir)
    subwords = F.split(F.trim(F.col("seq")), "  ")
    return seq.select(
        "tok",
        F.col("n").cast("long").alias("n_occurrences"),
        joined_strings(subwords, " ").alias("subwords"),
        F.size(subwords).cast("long").alias("n_subwords"),
    )


#: doc-level BPE encoding CTE block: the trainer chain -> per-word
#: subword-id arrays -> per-document id sequences. Shared verbatim by
#: text_bpe_doc_ids and the BPE sequence-packing oracle
#: (operators/sampling.pack_bpe_sequences), so the packed artifact is
#: token-for-token the doc encoding
BPE_DOC_IDS_CTES = f"""{_bpe_ctes()},
wseg AS (
    SELECT tok, string_split(trim(seq), '  ') AS subs FROM seq{BPE_ROUNDS}
),
subvocab AS (
    SELECT sub, row_number() OVER (ORDER BY sub) AS id
    FROM (SELECT DISTINCT unnest(subs) AS sub FROM wseg)
),
wpos AS (
    SELECT tok, i, subs[i] AS sub
    FROM wseg, unnest(generate_series(1, len(subs))) u(i)
),
wids AS (
    SELECT p.tok, list(CAST(v.id AS BIGINT) ORDER BY p.i) AS wid
    FROM wpos p JOIN subvocab v ON v.sub = p.sub
    GROUP BY p.tok
),
docpos AS (
    SELECT doc_id, i AS pos, toks[i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         , unnest(generate_series(1, len(toks))) u(i)
),
bpe_docs AS (
    SELECT doc_id,
           CAST(len(all_ids) AS BIGINT) AS n_subword_tokens,
           all_ids[1:{MAX_SEQ_LEN}] AS ids
    FROM (
        SELECT d.doc_id, flatten(list(w.wid ORDER BY d.pos)) AS all_ids
        FROM docpos d JOIN wids w ON w.tok = d.tok
        GROUP BY d.doc_id
    )
)"""


def bpe_word_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, wid) — every distinct word's subword-ID array under the
    learned merges: the final trainer state segments each word, the
    subword inventory (chars + merged symbols + </w>, vocabulary-bounded)
    gets dense lexicographic ids via the one-sorted-array pattern (no
    global window), and each word's segmentation maps through the
    broadcast id table position-by-position."""
    wseg = bpe_corpus_sequences(spark, sf_dir).select(
        "tok", F.split(F.trim(F.col("seq")), "  ").alias("subs")
    )
    subvocab = (
        wseg.select(F.explode("subs").alias("sub"))
        .distinct()
        .agg(F.sort_array(F.collect_list("sub")).alias("va"))
        .select(F.posexplode("va").alias("p", "sub"))
        .select("sub", (F.col("p") + 1).cast("long").alias("id"))
    )
    return (
        wseg.select("tok", F.posexplode("subs").alias("i", "sub"))
        .join(F.broadcast(subvocab), "sub")
        .groupBy("tok")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "id"))), lambda s: s["id"]
            ).alias("wid")
        )
    )


def bpe_doc_ids_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_subword_tokens, ids array<long>) — the composition form
    pack_bpe_sequences consumes; the registered query serializes ids."""
    docs = load_table(spark, sf_dir, "documents")
    tokpos = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok")
    )
    per_doc = (
        tokpos.join(F.broadcast(bpe_word_ids(spark, sf_dir)), "tok")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "wid"))),
                    lambda s: s["wid"],
                )
            ).alias("all_ids")
        )
    )
    return per_doc.select(
        "doc_id",
        F.size("all_ids").cast("long").alias("n_subword_tokens"),
        F.slice("all_ids", 1, MAX_SEQ_LEN).alias("ids"),
    )


@register(
    "text_bpe_doc_ids",
    oracle=f"""WITH {BPE_DOC_IDS_CTES}
SELECT doc_id, n_subword_tokens,
       COALESCE(array_to_string(ids, ','), '') AS ids
FROM bpe_docs
""",
    doc=(
        "Document-level BPE encoding — the VERDICT r4 bridge from trainer "
        "to trainer-ready data: every document's token stream maps through "
        "the per-word subword segmentations the SAME merge chain as "
        "text_bpe_merges produces (one shared training pass; at serving "
        "time the merge table is the persisted artifact), yielding the "
        "subword-id arrays a real tokenizer emits — not the word-level "
        f"top-{TOKENIZE_VOCAB_K} vocab ids. The corpus-sized side only "
        "ever joins the broadcast (vocabulary-bounded) word->ids table "
        "and regroups per doc_id (entity-bounded); sequences truncate to "
        f"{MAX_SEQ_LEN} like text_tokenize_ids. Output ids serialize "
        "comma-joined (driver-canonical); bpe_doc_ids_frame is the "
        "array-typed composition surface."
    ),
)
def text_bpe_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.canon import csv_longs

    return bpe_doc_ids_frame(spark, sf_dir).select(
        "doc_id", "n_subword_tokens", csv_longs("ids").alias("ids")
    )





# -------------------------------------------------- count-min sketch

#: count-min sketch geometry: CMS_D independent hash rows of CMS_W
#: counters — 1 KB of state summarizes an unbounded token stream with
#: one-sided error <= 2N/CMS_W per estimate at confidence 1-(1/2)^CMS_D
CMS_D = 4
CMS_W = 256
#: production counter width (VERDICT r5 item 2): 2^16 counters per row —
#: the geometry a 1e9-distinct-key corpus wants (error <= 2N/65536 per
#: estimate, still only 4 x 64 KiB of mergeable long counters). The
#: sketch/probe plan is width-independent: counter traffic is bounded by
#: DISTINCT tokens, so the wide sketch costs the same corpus pass
CMS_W_WIDE = 65536
#: heavy hitters the eval interrogates the sketch about
CMS_TOP_K = 16


def _cms_bucket(base: Column, j: int, width: int) -> Column:
    """Row-j counter index: the universal-hash family (A_j*h32 + B_j) mod P
    folded onto the counter width — exact 64-bit in both engines
    (functions/hashing's MinHash constants, A < 2^20, h32 < 2^32)."""
    from ..functions.hashing import MINHASH_A, MINHASH_B, MINHASH_P

    return ((F.lit(MINHASH_A[j]) * base + F.lit(MINHASH_B[j])) % F.lit(MINHASH_P)) % F.lit(width)


def _cms_bucket_sql(base_expr: str, j: int, width: int) -> str:
    from ..functions.hashing import MINHASH_A, MINHASH_B, MINHASH_P

    return f"((({MINHASH_A[j]} * {base_expr} + {MINHASH_B[j]}) % {MINHASH_P}) % {width})"


def _cms_oracle(width: int) -> str:
    from ..functions.hashing import hash32_sql

    base = hash32_sql("tok")
    rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {_cms_bucket_sql('base', j, width)} AS b, n FROM toks"
        for j in range(CMS_D)
    )
    return f"""
WITH toks AS (
    SELECT tok, {hash32_sql("tok")} AS base, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
),
cms AS (
    SELECT j, b, SUM(n) AS cnt FROM ({rows}) GROUP BY j, b
),
top AS (
    SELECT tok, base, n FROM toks ORDER BY n DESC, tok LIMIT {CMS_TOP_K}
),
probes AS (
    {" UNION ALL ".join(f"SELECT tok, n, {j} AS j, {_cms_bucket_sql('base', j, width)} AS b FROM top" for j in range(CMS_D))}
)
SELECT p.tok,
       CAST(p.n AS BIGINT) AS exact_n,
       CAST(MIN(c.cnt) AS BIGINT) AS est_n,
       (MIN(c.cnt) >= p.n) AS never_underestimates,
       CAST(floor(CAST((MIN(c.cnt) - p.n) * 1000000 AS DOUBLE) / p.n) AS BIGINT) AS err_ppm
FROM probes p JOIN cms c ON c.j = p.j AND c.b = p.b
GROUP BY p.tok, p.n
"""


def cms_heavy_hitters(spark: SparkSession, sf_dir: str, width: int) -> DataFrame:
    """Width-parameterized CMS sketch/probe (shared by the demo-geometry
    and production-geometry registrations below). The plan is identical
    at any width: counter traffic is bounded by DISTINCT tokens (each
    contributes CMS_D (j,b,n) rows), so widening 256 -> 2^16+ changes
    collision rates, not cost."""
    from ..functions.hashing import hash32

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("base", hash32(F.col("tok")))
    )
    buckets = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_bucket(F.col("base"), j, width).alias("b")
            )
            for j in range(CMS_D)
        ]
    )
    cms = (
        toks.select("n", F.explode(buckets).alias("r"))
        .groupBy("r.j", "r.b")
        .agg(F.sum("n").alias("cnt"))
    )
    return cms_probe_report(toks, cms, width)


def cms_probe_report(toks: DataFrame, cms: DataFrame, width: int) -> DataFrame:
    """The heavy-hitter probe stage, shared between the batch operator
    and streaming/runtime.run_cms_report_stream (VERDICT r5 item 6) so
    both surfaces emit identical report rows: the exact top-K tokens of
    ``toks`` (tok, n, base) interrogate the ``cms`` (j, b, cnt) sketch —
    row-minimum estimate, one-sided guarantee, collision error in ppm."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_bucket(F.col("base"), j, width).alias("b")
            )
            for j in range(CMS_D)
        ]
    )
    top = toks.orderBy(F.desc("n"), F.asc("tok")).limit(CMS_TOP_K)
    probes = top.select("tok", "n", F.explode(buckets).alias("r")).select(
        "tok", "n", F.col("r.j").alias("j"), F.col("r.b").alias("b")
    )
    est = (
        probes.join(F.broadcast(cms), ["j", "b"])
        .groupBy("tok", "n")
        .agg(F.min("cnt").alias("est_n"))
    )
    return est.select(
        "tok",
        F.col("n").cast("long").alias("exact_n"),
        F.col("est_n").cast("long").alias("est_n"),
        (F.col("est_n") >= F.col("n")).alias("never_underestimates"),
        F.floor(((F.col("est_n") - F.col("n")) * 1_000_000).cast("double") / F.col("n"))
        .cast("long")
        .alias("err_ppm"),
    )


@register(
    "text_cms_heavy_hitters",
    oracle=_cms_oracle(CMS_W),
    doc=(
        f"Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005): "
        f"the token stream folds into a {CMS_D}x{CMS_W} integer counter "
        "matrix through the engine's portable universal-hash family (ONE "
        "md5 per distinct token, affine derivations — the MinHash "
        f"construction), and the exact top-{CMS_TOP_K} tokens interrogate "
        "the sketch: per token, the row-minimum estimate, the one-sided "
        "overestimate guarantee (pinned: CMS can never undercount), and "
        "the collision error in integer ppm. The sketch is 1 KB of "
        "mergeable state no matter the corpus size — the scale story is "
        "that per-partition sketches SUM (counter-wise) into the global "
        "sketch, a map-side-combinable groupBy here. Unlike the HLL path "
        "this sketch is deterministic given the hash family, so the whole "
        "pipeline — sketch, probe, error — is oracle-exact, not rows-only. "
        "The deliberately narrow 256-counter width keeps collisions "
        "OBSERVABLE at test scale; text_cms_wide_heavy_hitters is the "
        "production geometry."
    ),
)
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_heavy_hitters(spark, sf_dir, CMS_W)


@register(
    "text_cms_wide_heavy_hitters",
    oracle=_cms_oracle(CMS_W_WIDE),
    doc=(
        f"Production-geometry CMS (VERDICT r5 item 2): the SAME sketch/"
        f"probe pipeline at {CMS_D}x{CMS_W_WIDE} counters — the width a "
        "1e9-distinct-key corpus needs (error <= 2N/65536 per estimate, "
        "4 x 64 KiB of mergeable longs). Because counter traffic is "
        "bounded by distinct tokens, not width, this costs the same "
        "corpus pass as the 256-wide demo; at test scale collisions all "
        "but vanish (err_ppm ~ 0), which the oracle verifies exactly — "
        "tests/test_cms.py pins wide-estimate error <= narrow-estimate "
        "error token-for-token."
    ),
)
def text_cms_wide_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_heavy_hitters(spark, sf_dir, CMS_W_WIDE)


# ------------------------------------------------ vocabulary growth

#: corpus prefixes (by doc_id) the growth curve samples — the Heaps'-law
#: shape answers "how fast does the vocabulary still grow", i.e. how much
#: NEW content marginal crawling buys
HEAPS_NS = (32, 128, 512)


@register(
    "text_vocab_growth",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
first_seen AS (
    SELECT w, MIN(doc_id) AS first_doc FROM tok GROUP BY w
),
per_doc AS (
    SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
)
{" UNION ALL ".join(
    f"SELECT CAST({n} AS BIGINT) AS n_docs_prefix, "
    f"CAST((SELECT COALESCE(SUM(n), 0) FROM per_doc WHERE doc_id < {n}) AS BIGINT) AS total_tokens, "
    f"CAST((SELECT COUNT(*) FROM first_seen WHERE first_doc < {n}) AS BIGINT) AS distinct_tokens, "
    f"CAST(floor(CAST((SELECT COUNT(*) FROM first_seen WHERE first_doc < {n}) * 1000000 AS DOUBLE) "
    f"     / greatest((SELECT COALESCE(SUM(n), 0) FROM per_doc WHERE doc_id < {n}), 1)) AS BIGINT) AS ttr_ppm"
    for n in HEAPS_NS)}
""",
    doc=(
        "Vocabulary growth curve (Heaps'-law diagnostic): distinct-token "
        f"and total-token counts after the first {HEAPS_NS} docs, with "
        "the prefix type/token ratio in integer ppm — the corpus-health "
        "number that says whether more crawling still buys new content "
        "or only repeats the head (a flattening curve is the saturation "
        "signal dedup budgets key on). ONE token pass: each token's "
        "FIRST document (a partial-aggregated min) answers every prefix "
        "at once via conditional counts — no per-prefix rescan, no "
        "distinct-per-prefix shuffle; per-doc token totals aggregate the "
        "same way."
    ),
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("w"))
    first_seen = tok.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    firsts = first_seen.agg(
        *[
            F.sum((F.col("first_doc") < n).cast("long")).alias(f"d{n}")
            for n in HEAPS_NS
        ]
    )
    totals = per_doc.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("doc_id") < n, F.col("n"))), F.lit(0)
            ).alias(f"t{n}")
            for n in HEAPS_NS
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(n).cast("long").alias("n_docs_prefix"),
                F.col(f"t{n}").cast("long").alias("total_tokens"),
                F.col(f"d{n}").cast("long").alias("distinct_tokens"),
            )
            for n in HEAPS_NS
        ]
    )
    return (
        firsts.crossJoin(F.broadcast(totals))
        .select(F.explode(rows).alias("r"))
        .select(
            "r.n_docs_prefix",
            "r.total_tokens",
            "r.distinct_tokens",
            F.floor(
                (F.col("r.distinct_tokens") * 1000000).cast("double")
                / F.greatest(F.col("r.total_tokens"), F.lit(1))
            )
            .cast("long")
            .alias("ttr_ppm"),
        )
    )


# ------------------------------------------------ BPE round-trip contract


@register(
    "text_bpe_roundtrip_check",
    oracle=f"""WITH {_bpe_ctes()},
wseg AS (SELECT tok, string_split(trim(seq), '  ') AS subs FROM seq{BPE_ROUNDS})
SELECT tok,
       CAST(len(subs) AS BIGINT) AS n_subwords,
       TRUE AS roundtrip_ok
FROM wseg
""",
    doc=(
        "Tokenizer ROUND-TRIP contract — the invariant a serving stack "
        "must never break: every distinct word encodes to subword ids "
        "(the SAME broadcast id table text_bpe_doc_ids uses) and the ids "
        "DECODE back through the inverse table to exactly the original "
        "word (concat subwords, strip the </w> end marker). The Spark "
        "side performs the real encode->decode->compare; the oracle "
        "supplies the expected verdict as a literal TRUE plus the "
        "independently derived subword count — the same "
        "contract-as-literal grammar as the sketch accuracy gates. "
        "Vocabulary-bounded end to end: one trainer chain, two broadcast "
        "joins, per-word groups."
    ),
)
def text_bpe_roundtrip_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    wseg = bpe_corpus_sequences(spark, sf_dir).select(
        "tok", F.split(F.trim(F.col("seq")), "  ").alias("subs")
    )
    subvocab = (
        wseg.select(F.explode("subs").alias("sub"))
        .distinct()
        .agg(F.sort_array(F.collect_list("sub")).alias("va"))
        .select(F.posexplode("va").alias("p", "sub"))
        .select("sub", (F.col("p") + 1).cast("long").alias("id"))
    ).localCheckpoint()  # one id table feeds BOTH directions below
    # encode: word -> ordered subword ids (text_bpe_doc_ids' exact shape)
    wids = (
        wseg.select("tok", F.posexplode("subs").alias("i", "sub"))
        .join(F.broadcast(subvocab), "sub")
        .groupBy("tok")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "id"))), lambda s: s["id"]
            ).alias("wid")
        )
    )
    # decode: ids -> subwords via the INVERSE broadcast, reassemble, strip
    decoded = (
        wids.select("tok", F.posexplode("wid").alias("i", "id"))
        .join(F.broadcast(subvocab), "id")
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_subwords"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "sub"))),
                    lambda s: s["sub"],
                ),
                "",
            ).alias("joined"),
        )
    )
    return decoded.select(
        "tok",
        "n_subwords",
        (F.replace(F.col("joined"), F.lit("</w>"), F.lit("")) == F.col("tok")).alias(
            "roundtrip_ok"
        ),
    )


# ------------------------------------------------ tokenizer vocab churn

#: head size for the churn monitor — small enough that slice-to-slice
#: count differences can move the boundary (membership churn), unlike
#: the full TOKENIZE_VOCAB_K head which swallows this corpus whole
VOCAB_CHURN_K = 16


def _churn_head_sql(src: str) -> str:
    return f"""
    SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rk
    FROM (
        SELECT tok, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM {src})
        GROUP BY tok
        ORDER BY cnt DESC, tok
        LIMIT {VOCAB_CHURN_K}
    )
    """


@register(
    "tokenizer_vocab_churn",
    oracle=f"""
WITH old_v AS ({_churn_head_sql("(SELECT * FROM documents WHERE doc_id % 10 <> 7)")}),
new_v AS ({_churn_head_sql("documents")})
SELECT COALESCE(o.tok, n.tok) AS tok,
       CAST(o.rk AS BIGINT) AS old_rank,
       CAST(n.rk AS BIGINT) AS new_rank,
       CASE WHEN o.tok IS NULL THEN 'entered'
            WHEN n.tok IS NULL THEN 'left'
            WHEN o.rk <> n.rk THEN 'shifted'
            ELSE 'stable' END AS status
FROM old_v o FULL OUTER JOIN new_v n ON n.tok = o.tok
""",
    doc=(
        f"Tokenizer vocabulary CHURN monitor — the retrain trigger a "
        "serving stack watches (corpus_token_drift tracks distribution "
        "drift in ppm; this tracks the thing that actually breaks "
        f"deployments: top-{VOCAB_CHURN_K} MEMBERSHIP and RANK changes, "
        "because a retrained vocabulary reassigns ids and invalidates "
        "every cached encoding). Yesterday's corpus (minus the daily "
        "batch slice, the dedup_incremental convention) vs today's: per "
        "token a verdict entered / left / shifted / stable with both "
        "ranks. Each head is a bounded TakeOrdered (never a global "
        "window over the token stream); the diff is a full-outer join of "
        f"two {VOCAB_CHURN_K}-row frames. The engineered-churn test "
        "(tests/test_vocab_churn.py) proves every verdict class fires."
    ),
)
def tokenizer_vocab_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return vocab_churn_frames(
        docs.where(F.col("doc_id") % 10 != 7), docs
    )


def vocab_churn_frames(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """The churn diff over any two document frames (the registered query
    binds the incremental slice convention; the engineered test feeds
    corpora where every verdict class fires)."""

    def head(docs: DataFrame, rank_name: str) -> DataFrame:
        freq = (
            docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("tok"))
            .limit(VOCAB_CHURN_K)
        )
        return (
            freq.agg(
                F.sort_array(
                    F.collect_list(F.struct((-F.col("cnt")).alias("negc"), F.col("tok")))
                ).alias("va")
            )
            .select(F.posexplode("va").alias("p", "s"))
            .select(
                F.col("s.tok").alias("tok"),
                (F.col("p") + 1).cast("long").alias(rank_name),
            )
        )

    old_v = head(old_docs, "old_rank").withColumnRenamed("tok", "old_tok")
    new_v = head(new_docs, "new_rank").withColumnRenamed("tok", "new_tok")
    joined = old_v.join(new_v, old_v["old_tok"] == new_v["new_tok"], "full_outer")
    return joined.select(
        F.coalesce("old_tok", "new_tok").alias("tok"),
        "old_rank",
        "new_rank",
        F.when(F.col("old_tok").isNull(), "entered")
        .when(F.col("new_tok").isNull(), "left")
        .when(F.col("old_rank") != F.col("new_rank"), "shifted")
        .otherwise("stable")
        .alias("status"),
    )


# ------------------------------------------- trained language-ID (r13)

#: hashed-unigram feature buckets for the trained lang-id — same
#: hashing-trick geometry as the quality classifier (quality.QC_NF)
LID_NF = 4096
#: hashed char-n-gram buckets (r14, the fastText/CLD recipe: language
#: identity lives in character n-grams, not word identity — VERDICT r13
#: item 1); they occupy the DISJOINT range [LID_NF, LID_NF + LID_NC) so
#: word and char features never collide in one weight table
LID_NC = 4096
#: char-n-gram widths (3- and 4-grams, fastText's default band)
LID_CG_WIDTHS = (3, 4)
#: unrolled one-vs-rest batch-perceptron epochs (no convergence loop —
#: the oracle must not be data-dependent; see quality.QC_ROUNDS)
LID_ROUNDS = 3
#: held-out slice: doc_id % LID_EVAL_MOD == 0 contributes no gradient
LID_EVAL_MOD = 5

#: DECIMAL dot product against the broadcast weight table (the
#: quality._QC_DOT overflow discipline: c * w can cross int64 under hot
#: buckets long before any doc is mis-scored)
_LID_DOT = "SUM(CAST(c AS DECIMAL(20,0)) * w)"


def _lid_lab(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        "lang",
        ((F.col("doc_id") % LID_EVAL_MOD) == 0).alias("held_out"),
    )


#: per-task gram->hash32 memo ceiling for the Arrow feature kernel:
#: grams repeat heavily (natural-language char n-grams), so md5 runs
#: once per DISTINCT gram per task; the effective cap is sized per
#: worker from spark.python.worker.memory (session.arrow_memo_cap), and
#: this constant is only its audited upper bound. A capped miss just
#: recomputes the hash.
_LID_MEMO_CAP = 1 << 22


def _lid_feat_kernel(chargrams: bool, memo_cap: int = _LID_MEMO_CAP):
    """mapInArrow kernel for :func:`_lid_feats` (optimization r14, guide
    §4.2): the old expression pipeline exploded ~n_chars rows per doc and
    paid an interpreted ``substring`` + md5 + hex-conv per GRAM inside
    whole-stage-codegen-hostile lambdas (measured 4.8 s warm at sf0.1 for
    the chargram variant); this kernel slides the windows in C-backed
    Python, memoizes hash32 per distinct gram per task (§4.5: heavy init
    once, amortized over every batch), and emits the per-doc (f, c)
    Counter directly — so the JVM never sees the raw gram stream at all
    (measured 0.6-0.9 s warm, identical output row multiset). Exactness:
    hash32(s) = int(md5(utf8(s)).hexdigest()[:8], 16) — the same bytes
    DuckDB and the old expression path hash; Python str.split(' ') and
    slicing match F.split / substring codepoint semantics."""
    widths = LID_CG_WIDTHS if chargrams else ()

    def gen(batches):
        import hashlib
        from collections import Counter

        import pyarrow as pa

        memo: dict = {}

        def bucket(s: str, base: int, mod: int) -> int:
            v = memo.get(s)
            if v is None:
                v = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                if len(memo) < memo_cap:
                    memo[s] = v
            return base + v % mod

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            od: list[int] = []
            of: list[int] = []
            oc: list[int] = []
            for did, txt in zip(ids, texts):
                if txt is None:
                    # NULL text: the old explode(split(...)) path emitted
                    # zero feature rows (the bias row still arrives via
                    # the union outside the kernel) — ADVICE r14
                    continue
                cnt: Counter = Counter()
                for tk in txt.split(" "):
                    cnt[bucket(tk, 0, LID_NF)] += 1
                for w in widths:
                    for i in range(len(txt) - w + 1):
                        cnt[bucket(txt[i : i + w], LID_NF, LID_NC)] += 1
                od.extend([did] * len(cnt))
                of.extend(cnt.keys())
                oc.extend(cnt.values())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(od, pa.int64()),
                    pa.array(of, pa.int64()),
                    pa.array(oc, pa.int64()),
                ],
                names=["doc_id", "f", "c"],
            )

    return gen


def _lid_scatter(spark: SparkSession, sf_dir: str) -> int | None:
    """io.scan_scatter over the documents table (see there)."""
    from ..io import scan_scatter

    return scan_scatter(spark, sf_dir, "documents")


def _lid_feats(
    docs: DataFrame, chargrams: bool = False, scatter: int | None = None
) -> DataFrame:
    """(doc_id, f, c): hashed-unigram counts plus the bias feature at
    f = -1 (every doc) — one weight table per class carries the model.
    With ``chargrams``, hashed char-3/4-gram counts join the stream in
    their own disjoint bucket range. The whole gram stream lives inside
    one Arrow kernel (:func:`_lid_feat_kernel`) — the shuffle-facing
    output is already the per-doc (f, c) count table, <= LID_NF + LID_NC
    rows per doc. ``scatter`` (from :func:`_lid_scatter`) redistributes
    a too-small-to-split local scan before the kernel."""
    src = docs.select("doc_id", "text")
    if scatter:
        src = src.repartition(scatter)
    from ..session import arrow_memo_cap

    base = src.mapInArrow(
        _lid_feat_kernel(chargrams, arrow_memo_cap(docs.sparkSession)),
        "doc_id long, f long, c long",
    )
    return base.unionByName(
        docs.select(
            "doc_id",
            F.lit(-1).cast("long").alias("f"),
            F.lit(1).cast("long").alias("c"),
        )
    )


def _lid_weights_build(
    spark: SparkSession, sf_dir: str, chargrams: bool = False
) -> DataFrame:
    """One-vs-rest multi-class batch perceptron over the labeled corpus —
    the quality classifier's _qc_weights_from loop lifted to a class
    dimension: every (doc, class) pair carries y = +1/-1, misclassified
    pairs fold count-weighted labels into the (class, f) weight table,
    margins stay exact integer (DECIMAL dots). The weight table is
    <= |classes| * (LID_NF + 1) rows — always broadcast; each round is
    one map-side join + one (class, f) aggregation over the hashed-count
    stream, never a corpus shuffle beyond the count aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    lab = _lid_lab(docs)
    classes = docs.select(F.col("lang").alias("cls")).distinct()
    dc = (
        lab.where(~F.col("held_out"))
        .crossJoin(F.broadcast(classes))
        .select(
            "doc_id",
            "cls",
            F.when(F.col("lang") == F.col("cls"), 1).otherwise(-1).alias("y"),
        )
        .localCheckpoint()  # consumed 2x per round (update + miss check)
    )
    fb = _lid_feats(
        docs, chargrams, scatter=_lid_scatter(spark, sf_dir)
    ).localCheckpoint()
    mis = dc  # round 1: w = 0 misclassifies every (doc, class) pair
    w = None
    for r in range(1, LID_ROUNDS + 1):
        up = (
            fb.join(mis, "doc_id")
            .groupBy("cls", "f")
            .agg(F.sum(F.col("c") * F.col("y")).cast("long").alias("dw"))
        )
        if w is None:
            w = up.select("cls", "f", F.col("dw").alias("w"))
        else:
            w = (
                w.select("cls", "f", F.col("w").alias("x"))
                .unionByName(up.select("cls", "f", F.col("dw").alias("x")))
                .groupBy("cls", "f")
                .agg(F.sum("x").cast("long").alias("w"))
            )
        # classes * (NF+1)-bounded rows; pinning per round keeps the next
        # round's margin pass from re-executing the whole training prefix
        w = w.localCheckpoint()
        if r < LID_ROUNDS:
            m = (
                fb.join(F.broadcast(w), "f")
                .groupBy("doc_id", "cls")
                .agg(F.expr(_LID_DOT).alias("dot"))
            )
            mis = (
                dc.join(m, ["doc_id", "cls"])
                .where(F.col("y") * F.col("dot") <= 0)
                .select("doc_id", "cls", "y")
            )
    return w


def _lid_weights(
    spark: SparkSession, sf_dir: str, chargrams: bool = False
) -> DataFrame:
    """Trained per-class weight table (cls, f, w) — memoized and
    PERSISTED through the index store like the quality classifier's
    (train once per corpus snapshot; scoring sessions read it back).
    The word-only and word+chargram models are separate store families."""
    from ..io import memo_checkpoint

    return memo_checkpoint(
        spark,
        sf_dir,
        "documents",
        "lang_id_w_cg" if chargrams else "lang_id_w",
        lambda: _lid_weights_build(spark, sf_dir, chargrams),
        extra_key=(LID_NF, LID_ROUNDS, LID_EVAL_MOD)
        + ((LID_NC, LID_CG_WIDTHS) if chargrams else ()),
    )


def _lid_scored(
    spark: SparkSession, sf_dir: str, chargrams: bool = False
) -> DataFrame:
    """(doc_id, lang, held_out, pred_lang, margin): argmax-class scoring
    against the persisted weights. The argmax is a two-phase groupBy
    min(struct(-margin, cls)) — largest margin, smallest class on ties
    (the lexicon baseline's tie-break convention) — never a corpus-keyed
    window."""
    docs = load_table(spark, sf_dir, "documents")
    m = (
        _lid_feats(docs, chargrams, scatter=_lid_scatter(spark, sf_dir))
        .join(F.broadcast(_lid_weights(spark, sf_dir, chargrams)), "f")
        .groupBy("doc_id", "cls")
        .agg(F.expr(_LID_DOT).cast("long").alias("margin"))
    )
    best = m.groupBy("doc_id").agg(
        F.min(
            F.struct(
                (-F.col("margin")).alias("nm"), F.col("cls").alias("cl")
            )
        ).alias("b")
    )
    return _lid_lab(docs).join(best, "doc_id").select(
        "doc_id",
        "lang",
        "held_out",
        F.col("b.cl").alias("pred_lang"),
        (-F.col("b.nm")).cast("long").alias("margin"),
    )


def _lid_ctes(p: str = "l", chargrams: bool = False) -> str:
    """Unrolled one-vs-rest training + scoring CTE chain (the oracle twin
    of _lid_weights_build + _lid_scored) — ends in ``{p}pred`` with
    rk = 1 rows being each doc's argmax class. ``p`` prefixes every CTE
    name so two model variants (word-only vs word+chargram) can coexist
    in one WITH clause; ``chargrams`` adds the hashed char-3/4-gram
    feature rows (DuckDB's generate_series is empty below the gram
    width, matching the Spark side's short-doc guard)."""
    from ..functions.hashing import hash32_sql

    feat_src = (
        f"SELECT doc_id, {hash32_sql('tok')} % {LID_NF} AS f "
        "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)"
    )
    if chargrams:
        for wd in LID_CG_WIDTHS:
            feat_src += (
                f" UNION ALL SELECT doc_id, {LID_NF} + {hash32_sql('g')} % {LID_NC} AS f "
                "FROM (SELECT doc_id, "
                f"unnest(list_transform(generate_series(1, len(text) - {wd - 1}), "
                f"i -> substring(text, i, {wd}))) AS g FROM documents)"
            )
    parts = [
        f"{p}cls AS (SELECT DISTINCT lang AS cls FROM documents)",
        f"{p}lab AS (SELECT doc_id, lang, (doc_id % {LID_EVAL_MOD} = 0) AS held_out FROM documents)",
        f"{p}fb AS MATERIALIZED (SELECT doc_id, f, COUNT(*) AS c "
        f"FROM ({feat_src}) GROUP BY 1, 2 "
        "UNION ALL SELECT doc_id, -1 AS f, 1 AS c FROM documents)",
        f"{p}dc AS MATERIALIZED (SELECT l.doc_id, c.cls, "
        "CASE WHEN l.lang = c.cls THEN 1 ELSE -1 END AS y "
        f"FROM {p}lab l CROSS JOIN {p}cls c WHERE NOT l.held_out)",
        f"{p}mis0 AS (SELECT doc_id, cls, y FROM {p}dc)",
    ]
    for r in range(1, LID_ROUNDS + 1):
        parts.append(
            f"{p}up{r} AS (SELECT m.cls, fb.f, CAST(SUM(fb.c * m.y) AS BIGINT) AS dw "
            f"FROM {p}fb fb JOIN {p}mis{r - 1} m USING (doc_id) GROUP BY 1, 2)"
        )
        if r == 1:
            parts.append(f"{p}w1 AS MATERIALIZED (SELECT cls, f, dw AS w FROM {p}up1)")
        else:
            parts.append(
                f"{p}w{r} AS MATERIALIZED (SELECT cls, f, CAST(SUM(x) AS BIGINT) AS w FROM "
                f"(SELECT cls, f, w AS x FROM {p}w{r - 1} "
                f"UNION ALL SELECT cls, f, dw AS x FROM {p}up{r}) GROUP BY cls, f)"
            )
        if r < LID_ROUNDS:
            parts.append(
                f"{p}m{r} AS (SELECT fb.doc_id, w.cls, SUM(fb.c::HUGEINT * w.w) AS dot "
                f"FROM {p}fb fb JOIN {p}w{r} w ON w.f = fb.f GROUP BY 1, 2)"
            )
            parts.append(
                f"{p}mis{r} AS (SELECT t.doc_id, t.cls, t.y FROM {p}dc t "
                f"JOIN {p}m{r} m ON m.doc_id = t.doc_id AND m.cls = t.cls "
                "WHERE t.y * m.dot <= 0)"
            )
    parts.append(
        f"{p}sc AS (SELECT fb.doc_id, w.cls, CAST(SUM(fb.c::HUGEINT * w.w) AS BIGINT) AS margin "
        f"FROM {p}fb fb JOIN {p}w{LID_ROUNDS} w ON w.f = fb.f GROUP BY 1, 2)"
    )
    parts.append(
        f"{p}pred AS (SELECT doc_id, cls, margin, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY margin DESC, cls ASC) AS rk "
        f"FROM {p}sc)"
    )
    return ",\n".join(parts)


@register(
    "text_lang_id_train",
    oracle=f"""
WITH {_lid_ctes()}
SELECT l.doc_id, l.lang, l.held_out,
       p.cls AS pred_lang,
       p.margin,
       (p.cls = l.lang) AS agrees_with_label
FROM llab l JOIN lpred p ON p.doc_id = l.doc_id AND p.rk = 1
""",
    doc=(
        "TRAINED language-ID (VERDICT r12 item 3 — the learned upgrade "
        "of the text_lang_id lexicon heuristic): one-vs-rest hashed-"
        f"unigram batch perceptrons ({LID_NF} buckets + bias, "
        f"{LID_ROUNDS} unrolled epochs, doc_id % {LID_EVAL_MOD} == 0 "
        "held out of every gradient) against the labeled documents.lang, "
        "reusing the quality classifier's exact-integer machinery: "
        "count-weighted ±1 updates in int64, margins in DECIMAL (Spark) "
        "/ HUGEINT (DuckDB), ties misclassify deterministically, argmax "
        "prediction breaks margin ties toward the alphabetically "
        "smallest class (the lexicon baseline's convention). Scale "
        "shape: the weight table is <= |classes| x (NF + 1) rows — "
        "every training round and the scoring pass are map-side "
        "broadcast joins + one aggregation; weights persist through the "
        "index store so later sessions classify without retraining; the "
        "argmax is a two-phase min(struct), never a corpus-keyed window."
    ),
)
def text_lang_id_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lid_scored(spark, sf_dir).select(
        "doc_id",
        "lang",
        "held_out",
        "pred_lang",
        "margin",
        (F.col("pred_lang") == F.col("lang")).alias("agrees_with_label"),
    )


@register(
    "text_lang_id_train_cg",
    oracle=f"""
WITH {_lid_ctes("g", chargrams=True)}
SELECT l.doc_id, l.lang, l.held_out,
       p.cls AS pred_lang,
       p.margin,
       (p.cls = l.lang) AS agrees_with_label
FROM glab l JOIN gpred p ON p.doc_id = l.doc_id AND p.rk = 1
""",
    doc=(
        "Char-n-gram trained language-ID (VERDICT r13 item 1 — the "
        "fastText/CLD inductive-bias fix): the same one-vs-rest exact-"
        "integer perceptron, but the feature stream adds hashed char-3/"
        f"4-grams ({LID_NC} buckets in a range disjoint from the "
        f"{LID_NF} word buckets) — language identity lives in character "
        "n-grams, so this model should dominate the word-unigram one on "
        "held-out accuracy (text_lang_id_train_eval measures all three "
        "side by side). Scale shape: the gram explode is ~n_chars rows "
        "per doc but partial-aggregates map-side to <= NF + NC buckets "
        "per doc before any shuffle; the weight table stays <= |classes|"
        " x (NF + NC + 1) rows — always broadcast; weights persist as "
        "their own index-store family (lang_id_w_cg)."
    ),
)
def text_lang_id_train_cg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lid_scored(spark, sf_dir, chargrams=True).select(
        "doc_id",
        "lang",
        "held_out",
        "pred_lang",
        "margin",
        (F.col("pred_lang") == F.col("lang")).alias("agrees_with_label"),
    )


@register(
    "text_lang_id_train_eval",
    oracle=f"""
WITH {_lid_ctes()},
{_lid_ctes("g", chargrams=True)},
ltr AS (
    SELECT l.lang, p.cls AS pred_lang
    FROM llab l JOIN lpred p ON p.doc_id = l.doc_id AND p.rk = 1
    WHERE l.held_out
),
gtr AS (
    SELECT l.lang, p.cls AS pred_lang
    FROM glab l JOIN gpred p ON p.doc_id = l.doc_id AND p.rk = 1
    WHERE l.held_out
),
llex AS (
    SELECT lang,
           CASE {" ".join(f"WHEN score_{lang} >= {GREATEST_SCORE_SQL} THEN '{lang}'" for lang in sorted(LANG_MARKERS))} END AS pred_lang
    FROM (
        SELECT doc_id, lang,
               {", ".join(f"len(list_filter(string_split(text, ' '), x -> x IN ({', '.join(repr(m) for m in ms)}))) AS score_{lang}" for lang, ms in sorted(LANG_MARKERS.items()))}
        FROM documents
    )
    WHERE doc_id % {LID_EVAL_MOD} = 0
),
lboth AS (
    SELECT 'trained' AS model, lang, pred_lang FROM ltr
    UNION ALL
    SELECT 'trained_cg' AS model, lang, pred_lang FROM gtr
    UNION ALL
    SELECT 'lexicon' AS model, lang, pred_lang FROM llex
),
lcells AS (
    SELECT model, lang, pred_lang, COUNT(*) AS n_docs
    FROM lboth GROUP BY 1, 2, 3
),
ltot AS (
    SELECT model, lang, SUM(n_docs) AS n_actual FROM lcells GROUP BY 1, 2
)
SELECT c.model, c.lang, c.pred_lang, c.n_docs,
       CAST(t.n_actual AS BIGINT) AS n_actual,
       CAST(c.n_docs * 1000000 // t.n_actual AS BIGINT) AS cell_ppm
FROM lcells c JOIN ltot t ON t.model = c.model AND t.lang = c.lang
ORDER BY c.model, c.lang, c.pred_lang
""",
    doc=(
        "Held-out confusion matrices for THREE language-ID models side "
        "by side — lexicon baseline / word-unigram perceptron / word+"
        "char-n-gram perceptron (the r14 three-way comparison VERDICT "
        f"r13 item 1 asks for; same doc_id % {LID_EVAL_MOD} == 0 slice, "
        "no model saw a gradient from it): per (model, actual, "
        "predicted) cell counts and per-actual-class recall in exact "
        "integer ppm, the text_quality_classifier_eval shape with a "
        "model dimension so a data card reads all classifiers "
        "identically. A curation run promotes the best model by its "
        "held-out diagonal."
    ),
)
def text_lang_id_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    trained = (
        _lid_scored(spark, sf_dir)
        .where("held_out")
        .select(F.lit("trained").alias("model"), "lang", "pred_lang")
    )
    trained_cg = (
        _lid_scored(spark, sf_dir, chargrams=True)
        .where("held_out")
        .select(F.lit("trained_cg").alias("model"), "lang", "pred_lang")
    )
    docs = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") % LID_EVAL_MOD) == 0
    )
    toks = _tokens(F.col("text"))
    scored = docs.select(
        "lang",
        *[
            _lang_score(toks, lang).alias(f"score_{lang}")
            for lang in sorted(LANG_MARKERS)
        ],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(
        F.col(f"score_{sorted(LANG_MARKERS)[0]}") >= best, sorted(LANG_MARKERS)[0]
    )
    for lang in sorted(LANG_MARKERS)[1:]:
        pred = pred.when(F.col(f"score_{lang}") >= best, lang)
    lexicon = scored.select(
        F.lit("lexicon").alias("model"), "lang", pred.alias("pred_lang")
    )
    cells = (
        trained.unionByName(trained_cg)
        .unionByName(lexicon)
        .groupBy("model", "lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = cells.groupBy("model", "lang").agg(F.sum("n_docs").alias("n_actual"))
    return (
        cells.join(tot, ["model", "lang"])
        .select(
            "model",
            "lang",
            "pred_lang",
            "n_docs",
            F.col("n_actual").cast("long").alias("n_actual"),
            F.expr("n_docs * 1000000 DIV n_actual").cast("long").alias("cell_ppm"),
        )
        .orderBy("model", "lang", "pred_lang")
    )
