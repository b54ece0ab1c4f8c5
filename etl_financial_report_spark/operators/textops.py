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


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


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
       CASE {" ".join(f"WHEN score_{lang} >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN '{lang}'" for lang in sorted(LANG_MARKERS))} END AS pred_lang,
       (CASE {" ".join(f"WHEN score_{lang} >= greatest(score_de, score_en, score_es, score_fr, score_zh) THEN '{lang}'" for lang in sorted(LANG_MARKERS))} END = lang) AS agrees_with_label
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
        F.element_at(bpe, 1).alias("first_token"),
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
       (list_sort(list(doc_id)))[1:{POSTINGS_CAP}] AS postings,
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
    return (
        capped.groupBy("token", "df")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
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
    ws = F.col("ws")
    bigrams = (
        docs.select(F.split("text", " ").alias("ws"))
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - 1),
                    lambda i: F.struct(
                        F.element_at(ws, i).alias("w1"),
                        F.element_at(ws, i + 1).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
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
