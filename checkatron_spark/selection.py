"""Training-data SELECTION operators: relevance retrieval, graded
contamination policy, and importance weighting.

These are the ops a pretraining pipeline runs between curation (corpus.py)
and mixing (sampling.py) to decide WHICH documents feed the model:

- ``bm25_topk``: Okapi BM25 retrieval of the corpus documents most relevant
  to a fixed query-term set — the standard lexical scorer behind
  "select training docs similar to the target domain" pipelines (and the
  retrieval half of RAG data prep). Plan: tokenize + explode, filter to the
  query terms BEFORE the aggregate (so the per-(doc, term) shuffle carries
  only matching postings, not the corpus), tiny df/corpus-stats sides
  broadcast, global top-k via sort+limit (TakeOrderedAndProject — no
  single-reducer window at corpus scale).
- ``contamination_frac``: the graded form of benchmark decontamination
  (operators/dedup.py decontaminate gives the binary form): per corpus doc,
  the FRACTION of its distinct word n-grams that appear in the eval set,
  with the GPT-3-style thresholded verdict (clean / flag / drop). A binary
  "shares any gram" rule drops a 10k-word doc for one quoted sentence; the
  graded policy is what production hygiene actually ships.
- ``dsir_importance``: hashed-bigram importance weights from DSIR ("Data
  Selection for Language Models via Importance Resampling", Xie et al.
  2023): estimate target vs raw unigram-pair distributions over B hashed
  feature buckets, score every raw doc by its summed log-likelihood ratio.
  Plan: one explode + ONE (bucket)-keyed aggregate (B=256 rows out,
  map-side combined), log-ratio table broadcast back over a second gram
  scan, per-doc integer aggregate (shuffle volume = |docs|, map-side
  combined because explode preserves row locality). No corpus-sized
  shuffle on the gram key at any point.

Engine-parity contract (the module's invariant): every cross-engine
comparison or ranking happens on MICRO-UNIT BIGINTs — each per-term /
per-bucket double score is rounded to 1e-6 ONCE, cast to BIGINT, and all
downstream sums/ranks are exact integer arithmetic, immune to
floating-point summation order on either engine. The score expressions
themselves are rendered from ONE shared template string per operator
(``_BM25_SCORE_TMPL`` / ``_DSIR_LR_TMPL``) evaluated by both Spark and
DuckDB, so the arithmetic trees are textually identical; the only residual
cross-engine risk is a libm-vs-JVM ``ln()`` ULP landing exactly on a
0.5-micro rounding boundary (measure-zero; the tfidf_top_terms precedent).
Hash parity uses the md5-hex-prefix construction from sampling.hash_uniform.
Tokenization follows the round-10 whitespace contract
(functions/text.py WS_CLASS, explicit ``[ \\t\\n\\r\\f]``).

Reference parity note: the reference (simbo1905/checkatron) has no
selection operators — this module belongs to the large-scale-training-data
mandate layered on top of the diff-engine surface.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from checkatron_spark.functions.text import WS_CLASS
from checkatron_spark.sources.tables import load_table

__all__ = [
    "bm25_topk",
    "bm25_multiquery",
    "contamination_frac",
    "dsir_importance",
    "semdedup",
    "token_count_bpe",
    "BM25_TERMS",
    "BM25_QUERY_PROFILES",
    "SUBWORD_VOCAB",
    "QUERIES",
    "oracles",
]

# Fixed query-term set for the declared bm25_topk query: mid-frequency
# content words present in the fixture vocabulary.
BM25_TERMS = ("hash", "join", "vector", "stream")

# Per-domain query profiles for the declared bm25_multiquery query: three
# target "domains" spelled in the fixture vocabulary, with one term
# ("join") shared across two profiles so the posting fan-out is exercised.
BM25_QUERY_PROFILES = {
    "analytics": ("scan", "filter", "agg"),
    "retrieval": ("hash", "join", "vector"),
    "streaming": ("stream", "window", "join"),
}

_DUCK_TOKS = r"string_split_regex(trim(coalesce(text, '')), '[ \t\n\r\f]+')"


def _tokens(text_col: Column) -> Column:
    """SQL-trimmed whitespace-split tokens; NULL text behaves like ''
    (the [''] sentinel, matching the oracle's coalesce)."""
    return F.split(F.trim(F.coalesce(text_col, F.lit(""))), WS_CLASS + "+")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

# The per-(doc, term) BM25 contribution in micro-units, over columns
# tf/df/dl/n_docs/sum_dl (all BIGINT). idf is the Lucene/Robertson
# ln(1 + (N - df + 0.5)/(df + 0.5)) variant (always positive); avgdl is
# spelled sum_dl/n_docs INSIDE the template so both engines divide the
# same exact integers. Evaluated verbatim by Spark (expr) and DuckDB.
_BM25_SCORE_TMPL = (
    "CAST(round("
    "ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
    " / (CAST(df AS DOUBLE) + 0.5))"
    " * ((CAST(tf AS DOUBLE) * ({k1} + 1.0))"
    " / (CAST(tf AS DOUBLE) + {k1} * (1.0 - {b} + {b}"
    " * CAST(dl AS DOUBLE)"
    " / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    " * 1000000.0) AS BIGINT)"
)


def bm25_topk(
    docs: DataFrame,
    query_terms=BM25_TERMS,
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus documents by Okapi BM25 against ``query_terms``.

    Returns (doc_id, score_micro, rnk): score in exact 1e-6 units
    (BIGINT — see the module parity contract), rank dense from 1 with
    the total tie-break (score DESC, doc_id ASC).

    100 TB plan: the ``isin`` filter lands BEFORE the (doc, term)
    aggregate, so the only corpus-sized shuffle carries matching postings
    (|terms| is a handful — the map-side combine collapses each partition
    to ~|docs-with-hits| rows). df (|terms| rows) and the corpus stats
    (1 row) broadcast; the final top-k is sort+limit, which Spark executes
    as TakeOrderedAndProject — per-partition heaps, no global window."""
    toks = _tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        toks.alias("_w"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("_w").alias("token"))
        .filter(F.col("token").isin(*query_terms))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    # persisted: BOTH the dfreq broadcast build and the per_doc probe
    # consume tf — broadcast exchanges materialize independently, so an
    # unpersisted tf would re-run the corpus scan + explode + aggregate
    # (the dup_ngram_profile precedent)
    from checkatron_spark.session import scratch_persist

    tf = scratch_persist(tf)
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    score_u = _BM25_SCORE_TMPL.format(k1=repr(float(k1)), b=repr(float(b)))
    per_doc = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.expr(score_u).alias("score_u"))
        .groupBy("doc_id")
        .agg(F.sum("score_u").cast("bigint").alias("score_micro"))
    )
    topk = per_doc.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(k)
    # rank over the <= k survivors only — a bounded single partition
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id",
        "score_micro",
        F.row_number().over(w).cast("int").alias("rnk"),
    )


def bm25_topk_sql(
    query_terms=BM25_TERMS, *, k: int = 20, k1: float = 1.2, b: float = 0.75
) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    score_u = _BM25_SCORE_TMPL.format(k1=repr(float(k1)), b=repr(float(b)))
    return f"""
WITH base AS (
    SELECT doc_id, len({_DUCK_TOKS}) AS dl, {_DUCK_TOKS} AS w FROM documents
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS sum_dl FROM base
),
tf AS (
    SELECT doc_id, dl, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, dl, unnest(w) AS token FROM base)
    WHERE token IN ({terms})
    GROUP BY doc_id, dl, token
),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
per_doc AS (
    SELECT doc_id, CAST(SUM({score_u}) AS BIGINT) AS score_micro
    FROM tf JOIN dfreq USING (token) CROSS JOIN stats
    GROUP BY doc_id
)
SELECT doc_id, score_micro, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rnk
    FROM per_doc
)
WHERE rnk <= {k}
"""


def _dedup_profiles(profiles: dict[str, tuple]) -> dict[str, tuple]:
    """Validate + canonicalize query profiles (ADVICE r11): a term listed
    twice inside one profile would emit duplicate (query_id, token) qmap
    rows and silently DOUBLE-COUNT that term's score; empty profiles made
    ``isin(*[])`` raise a confusing TypeError. Terms de-duplicate per
    profile (sorted, so qmap row order is deterministic); empty input is
    a clear ValueError."""
    if not profiles:
        raise ValueError("bm25_multiquery: profiles must be non-empty")
    out = {q: tuple(sorted(set(ts))) for q, ts in profiles.items()}
    if not any(out.values()):
        raise ValueError(
            "bm25_multiquery: every profile has an empty term set"
        )
    return out


def bm25_multiquery(
    docs: DataFrame,
    profiles: dict[str, tuple] = None,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-query-profile BM25 top-``k`` in ONE corpus scan (VERDICT r10
    #4): real domain-targeted selection scores N query profiles — one
    term set per target domain — not one fixed list. ``profiles`` maps
    query_id -> term tuple (default :data:`BM25_QUERY_PROFILES`).

    Returns (query_id, doc_id, score_micro, rnk): score in exact 1e-6
    units summed per (query, doc) — the module's micro-unit BIGINT
    parity contract — rnk dense from 1 per query with the total
    tie-break (score DESC, doc_id ASC).

    100 TB plan: identical posting discipline to :func:`bm25_topk` — the
    union of all profiles' terms filters BEFORE the (doc, term)
    aggregate, so the one corpus-sized pass carries only matching
    postings no matter how many profiles score; df and corpus stats are
    per-TERM/corpus-global (computed once, broadcast once); the tiny
    (query_id, term) map joins broadcast, fanning each posting out only
    to the profiles that want it. The per-query top-k is TWO-PHASE so no
    single reducer ever sees a query's full posting list: phase 1 keeps
    k per (query, input partition) — any partitioning yields a superset
    of the global per-query top-k — and phase 2 ranks the <= k x P
    survivors per query (a bounded window)."""
    if profiles is None:
        profiles = BM25_QUERY_PROFILES
    from pyspark.sql import Window

    profiles = _dedup_profiles(profiles)
    all_terms = sorted({t for ts in profiles.values() for t in ts})
    toks = _tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        toks.alias("_w"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("_w").alias("token"))
        .filter(F.col("token").isin(*all_terms))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    from checkatron_spark.session import scratch_persist

    tf = scratch_persist(tf)  # consumed by dfreq AND the scoring pass
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    qmap = docs.sparkSession.createDataFrame(
        [(q, t) for q, ts in sorted(profiles.items()) for t in ts],
        ["query_id", "token"],
    )
    score_u = _BM25_SCORE_TMPL.format(k1=repr(float(k1)), b=repr(float(b)))
    per_doc = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", F.expr(score_u).alias("score_u"))
        .join(F.broadcast(qmap), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score_u").cast("bigint").alias("score_micro"))
    )
    order = [F.col("score_micro").desc(), F.col("doc_id").asc()]
    local = Window.partitionBy(
        "query_id", F.spark_partition_id()
    ).orderBy(*order)
    survivors = (
        per_doc.withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .drop("_lrn")
    )
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn(
            "rnk", F.row_number().over(final).cast("int")
        )
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score_micro", "rnk")
    )


def bm25_multiquery_sql(
    profiles: dict[str, tuple] = None,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    if profiles is None:
        profiles = BM25_QUERY_PROFILES
    profiles = _dedup_profiles(profiles)
    all_terms = sorted({t for ts in profiles.values() for t in ts})
    terms = ", ".join(f"'{t}'" for t in all_terms)
    qvals = ", ".join(
        f"('{q}', '{t}')" for q, ts in sorted(profiles.items()) for t in ts
    )
    score_u = _BM25_SCORE_TMPL.format(k1=repr(float(k1)), b=repr(float(b)))
    return f"""
WITH base AS (
    SELECT doc_id, len({_DUCK_TOKS}) AS dl, {_DUCK_TOKS} AS w FROM documents
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS sum_dl FROM base
),
tf AS (
    SELECT doc_id, dl, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, dl, unnest(w) AS token FROM base)
    WHERE token IN ({terms})
    GROUP BY doc_id, dl, token
),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
qmap(query_id, token) AS (VALUES {qvals}),
per_doc AS (
    SELECT query_id, doc_id, CAST(SUM(score_u) AS BIGINT) AS score_micro
    FROM (
        SELECT doc_id, token, {score_u} AS score_u
        FROM tf JOIN dfreq USING (token) CROSS JOIN stats
    ) s JOIN qmap USING (token)
    GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, score_micro, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score_micro DESC, doc_id
    ) AS rnk
    FROM per_doc
)
WHERE rnk <= {k}
"""


# ---------------------------------------------------------------------------
# graded contamination
# ---------------------------------------------------------------------------

def contamination_frac(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    flag_pct: float = 20.0,
    drop_pct: float = 70.0,
) -> DataFrame:
    """Graded benchmark contamination: for EVERY corpus document, the
    share of its distinct word ``n``-grams that appear anywhere in the
    benchmark set, plus the thresholded policy verdict — 'drop' at
    >= ``drop_pct`` percent overlap, 'flag' at >= ``flag_pct``, else
    'clean' (the GPT-3 appendix-C shape: graded overlap, not binary
    membership).

    Returns (doc_id, n_grams, n_matched, pct_matched, verdict) for every
    corpus doc (zero-overlap docs report 0 / 'clean'). pct_matched is ONE
    IEEE division of two exact integers, rounded to 4 places on both
    engines; the verdict compares that exact rounded value, so the policy
    is engine-portable by construction.

    Plan: same broadcast shape as operators/dedup.py decontaminate — the
    benchmark's distinct gram set broadcasts, the corpus side is one scan
    + shingle explode + per-doc counts; the broadcast LEFT join keeps
    non-overlapping docs without a second corpus pass."""
    from checkatron_spark.operators.dedup import shingles

    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), n)).alias("s"),
    )
    bench_sh = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        doc_sh.join(F.broadcast(bench_sh), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count("_hit").cast("bigint").alias("n_matched"),
        )
    )
    pct = F.expr(
        "round(100.0 * CAST(n_matched AS DOUBLE)"
        " / CAST(n_grams AS DOUBLE), 4)"
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_matched",
        pct.alias("pct_matched"),
        F.when(pct >= F.lit(drop_pct), F.lit("drop"))
        .when(pct >= F.lit(flag_pct), F.lit("flag"))
        .otherwise(F.lit("clean"))
        .alias("verdict"),
    )


def contamination_frac_sql(
    *, n: int = 3, flag_pct: float = 20.0, drop_pct: float = 70.0
) -> str:
    """DuckDB twin. The sh CTE mirrors operators/dedup.py shingles():
    distinct grams, whole-doc fallback below n words (DECONTAMINATE_SQL
    precedent, pipelines.py)."""
    from checkatron_spark.sampling import _duck_uniform

    u = _duck_uniform("doc_id", "bench-v1")
    pct = (
        "round(100.0 * CAST(n_matched AS DOUBLE)"
        " / CAST(n_grams AS DOUBLE), 4)"
    )
    return f"""
WITH w AS (
    SELECT doc_id, {_DUCK_TOKS} AS w FROM documents
),
sh AS (
    SELECT doc_id,
        CASE WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
             ELSE list_distinct(list_transform(range(1, len(w) - {n} + 2),
                  i -> array_to_string(w[i:i+{n - 1}], ' ')))
        END AS sh
    FROM w
),
u AS (SELECT doc_id, {u} AS u FROM documents),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
bench AS (SELECT DISTINCT s FROM ex JOIN u USING (doc_id) WHERE u < 0.05),
corpus AS (SELECT ex.doc_id, ex.s FROM ex JOIN u USING (doc_id) WHERE u >= 0.05),
per_doc AS (
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(b.s) AS BIGINT) AS n_matched
    FROM corpus c LEFT JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id
)
SELECT doc_id, n_grams, n_matched, {pct} AS pct_matched,
       CASE WHEN {pct} >= {drop_pct} THEN 'drop'
            WHEN {pct} >= {flag_pct} THEN 'flag'
            ELSE 'clean' END AS verdict
FROM per_doc
"""


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

# Per-bucket Laplace-smoothed log-likelihood ratio in micro-units, over
# columns ct/cr (target/raw bucket counts) and tt/tr (side totals), all
# BIGINT; {nb} is the bucket count. Evaluated verbatim by both engines.
_DSIR_LR_TMPL = (
    "CAST(round("
    "(ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + {nb}.0))"
    " - ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + {nb}.0)))"
    " * 1000000.0) AS BIGINT)"
)


def _bigram_pairs(text_col: Column) -> Column:
    """array<struct<a,b>> of adjacent word pairs via NATIVE array ops:
    arrays_zip over two slices — ordinary expressions, no interpreted
    per-element lambda (transform() would re-enter interpreted
    evaluation for every element, the exact cost the JVM gram kernel
    exists to avoid). slice(w, 2, size-1) is safe at the [''] sentinel:
    split('') is [''] so size >= 1 always, the length arg is >= 0, and
    both slices are [] on docs with fewer than 2 tokens."""
    w = _tokens(text_col)
    n1 = F.size(w) - F.lit(1)
    return F.arrays_zip(
        F.slice(w, F.lit(1), n1).alias("a"),
        F.slice(w, F.lit(2), n1).alias("b"),
    )


def _md5_bucket(gram: Column, n_buckets: int) -> Column:
    """Codegen digest: int(md5(gram)[:8hex], 16) % B via md5/substring/
    conv — the hash_uniform construction, byte-identical to hashlib.md5
    and to DuckDB's ('0x' || substring(md5(g),1,8))::BIGINT on UTF-8."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")
        % F.lit(int(n_buckets))
    )


def _bigram_buckets_arrow(text_col: Column, n_buckets: int) -> Column:
    """array<bigint> of hashed word-bigram feature buckets, one entry per
    bigram OCCURRENCE — the round-10 Arrow-batched pandas-UDF kernel
    (hashlib.md5 per occurrence in a Python loop). Superseded as the
    default by the JVM path (explode native bigram pairs, then the
    digest in whole-stage codegen — ``_bigram_pairs`` + ``_md5_bucket``):
    measured within noise at 50k docs, but structurally preferable at
    100 TB — no Python workers or Arrow text transfer in the per-token
    hot path (VERDICT r10 #2; SCALE.md "Selection module"). Kept as the
    pinned-equivalent twin (tests/test_selection.py) and the escape
    hatch for engines without 8-hex-digit conv()."""
    ws_re = re.compile(WS_CLASS + "+")

    @F.pandas_udf(ArrayType(LongType()))
    def _bk(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = ws_re.split((t or "").strip(" "))
            out.append(
                [
                    int(
                        hashlib.md5(
                            (words[i] + " " + words[i + 1]).encode("utf-8")
                        ).hexdigest()[:8],
                        16,
                    )
                    % n_buckets
                    for i in range(len(words) - 1)
                ]
            )
        return pd.Series(out)

    return _bk(text_col)


def dsir_importance(
    docs: DataFrame,
    is_target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    gram_kernel: str = "jvm",
) -> DataFrame:
    """DSIR hashed-bigram importance weights (Xie et al. 2023): treat the
    rows where ``is_target`` holds as the high-quality target corpus,
    estimate target vs raw bigram-feature distributions over
    ``n_buckets`` hashed buckets with +1 smoothing, and weight every RAW
    document by the summed log-likelihood ratio of its bigram occurrences
    — the score importance resampling then draws against.

    Returns (doc_id, n_grams, weight_micro) for every raw doc with at
    least one bigram; weight_micro = sum over occurrences of the
    per-bucket micro-unit log-ratio (exact integer arithmetic — see the
    module parity contract).

    100 TB plan: grams are never shuffled on the gram key — the count
    pass groups by (bucket) into <= B rows (map-side combined), the
    log-ratio table (B rows) broadcasts back over a second gram scan,
    and the per-doc aggregate's shuffle volume is |docs| because explode
    preserves row locality for the map-side combine. (A zero-shuffle
    variant — collect the B-row table into a MAP literal and F.aggregate
    the bucket array per row, the bloom-mask precedent — saves the
    |docs| shuffle; kept declarative here because the doc_id aggregate
    is already combine-collapsed.)

    ``gram_kernel='jvm'`` (default) hashes each bigram in whole-stage
    codegen (explode native arrays_zip pairs, then md5/conv — no Python
    in the per-token hot path); ``'arrow'`` is the round-10 pandas-UDF
    twin, pinned bit-identical. Measured head-to-head on the 50k-doc
    realistic corpus the gram stages are within noise of each other
    (~3.0 s vs ~3.2 s, min-of-3); the JVM path is the default for the
    structural 100 TB reasons — zero Python workers and zero Arrow text
    transfer in the per-token path — not a local[32] speedup claim
    (VERDICT r10 #2; SCALE.md "Selection module"). The big lever this
    round was the grams persist above: the r10 shape recomputed the
    whole gram scan for each of its two consumers."""
    from checkatron_spark.session import scratch_persist

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("_t"),
        F.col(text_col).alias("_txt"),
    )
    if gram_kernel == "jvm":
        raw_grams = base.select(
            "doc_id",
            "_t",
            F.explode(_bigram_pairs(F.col("_txt"))).alias("_p"),
        ).select(
            "doc_id",
            "_t",
            _md5_bucket(
                F.concat(F.col("_p.a"), F.lit(" "), F.col("_p.b")), n_buckets
            ).alias("bucket"),
        )
    elif gram_kernel == "arrow":
        raw_grams = base.select(
            "doc_id",
            "_t",
            F.explode(
                _bigram_buckets_arrow(F.col("_txt"), n_buckets)
            ).alias("bucket"),
        )
    else:
        raise ValueError(f"unknown dsir gram kernel {gram_kernel!r}")
    # persisted: BOTH the bucket-count pass (the broadcast log-ratio
    # build) and the raw-side scoring pass consume grams — broadcast
    # exchanges materialize independently, so an unpersisted grams would
    # re-run the corpus scan + bigram hashing twice (the bm25_topk tf
    # precedent; ADVICE r10)
    grams = scratch_persist(raw_grams)
    counts = grams.groupBy("bucket").agg(
        F.coalesce(
            F.sum(F.when(F.col("_t"), F.lit(1))), F.lit(0)
        ).cast("bigint").alias("ct"),
        F.coalesce(
            F.sum(F.when(~F.col("_t"), F.lit(1))), F.lit(0)
        ).cast("bigint").alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").cast("bigint").alias("tt"),
        F.sum("cr").cast("bigint").alias("tr"),
    )
    lr_u = _DSIR_LR_TMPL.format(nb=int(n_buckets))
    lr = (
        counts.crossJoin(F.broadcast(totals))
        .select("bucket", F.expr(lr_u).alias("lr_u"))
    )
    return (
        grams.filter(~F.col("_t"))
        .join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("lr_u").cast("bigint").alias("weight_micro"),
        )
    )


def dsir_importance_sql(*, n_buckets: int = 256) -> str:
    from checkatron_spark.sampling import _duck_uniform

    u = _duck_uniform("doc_id", "bench-v1")
    lr_u = _DSIR_LR_TMPL.format(nb=int(n_buckets))
    return f"""
WITH w AS (
    SELECT doc_id, {_DUCK_TOKS} AS w FROM documents
),
g AS (
    SELECT doc_id, unnest(
        CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
             ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        END) AS gram
    FROM w
),
u AS (SELECT doc_id, ({u} < 0.05) AS is_t FROM documents),
sides AS (
    SELECT g.doc_id, is_t,
           ('0x' || substring(md5(gram), 1, 8))::BIGINT % {n_buckets} AS bucket
    FROM g JOIN u USING (doc_id)
),
counts AS (
    SELECT bucket,
           CAST(COALESCE(SUM(CASE WHEN is_t THEN 1 END), 0) AS BIGINT) AS ct,
           CAST(COALESCE(SUM(CASE WHEN NOT is_t THEN 1 END), 0) AS BIGINT) AS cr
    FROM sides GROUP BY bucket
),
tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr FROM counts),
lr AS (SELECT bucket, {lr_u} AS lr_u FROM counts CROSS JOIN tot)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(lr_u) AS BIGINT) AS weight_micro
FROM (SELECT doc_id, bucket FROM sides WHERE NOT is_t) r
JOIN lr USING (bucket)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

def _semdedup_drop_kernel(threshold: float, id_field, max_cluster_rows: int):
    """Per-cluster Arrow kernel for the SemDeDup pair stage: marks every
    vector with a LOWER-id clustermate at cosine >= threshold.

    FP determinism: norms come from the SHARED sequential-fold helper
    (operators/similarity.py seq_fold_norms — bit-identical to Catalyst
    ``aggregate`` and DuckDB ``list_reduce``), dots accumulate with the
    same one-vectorized-add-per-dimension fold, and the threshold compare
    goes through nan_ge so NaN cosines count as hits exactly like Spark's
    and DuckDB's NaN-is-largest ordering (round-10 review finding — raw
    numpy ``>=`` would silently keep NaN twins the join kernel drops).
    Row-tiled so peak memory is TILE x |cluster| doubles."""
    import numpy as np

    from checkatron_spark.operators.similarity import nan_ge, seq_fold_norms
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    integral = isinstance(
        id_field.dataType, (ByteType, ShortType, IntegerType, LongType)
    )
    out_schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("cluster_id", IntegerType()),
            StructField("kept", BooleanType()),
        ]
    )

    def fn(pdf):
        import pandas as pd

        if len(pdf) > max_cluster_rows:
            # the kernel materializes TILE x |cluster| double dots per
            # step and |cluster|^2 pair work overall — a runaway cluster
            # must fail FAST on the worker, not OOM it (VERDICT r10 #3;
            # the k ∝ corpus lever is what keeps clusters bounded)
            raise ValueError(
                f"semdedup arrow kernel: cluster of {len(pdf)} rows "
                f"exceeds max_cluster_rows={max_cluster_rows}; raise k "
                "(or pass k=None to derive it from the corpus size), "
                "raise max_cluster_rows if the workers have headroom, "
                "or use kernel='join' (memory-unbounded streaming pairs)"
            )
        ids = pdf["_kid"].to_numpy(
            dtype=np.int64 if integral else object
        )
        vals = pdf["_kv"].tolist()
        if len({len(v) for v in vals}) > 1:
            # mixed dims would need zip_with's NULL-padding semantics —
            # fail fast like decontaminate_semantic's zero-norm guard.
            # Do NOT recommend kernel='join' here: the join kernel's
            # zip_with/aggregate dot yields NULL cosine on ragged pairs,
            # which the >= threshold filter silently scores as
            # not-a-duplicate — the escape hatch would mis-score the very
            # input this guard rejects (ADVICE r10)
            raise ValueError(
                "semdedup arrow kernel saw mixed embedding dimensions; "
                "run embedding_audit and fix the corpus first"
            )
        V = np.array(vals, dtype=np.float64)
        n = len(ids)
        d = V.shape[1]
        norm = seq_fold_norms(V)
        dropped = np.zeros(n, dtype=bool)
        tile = 2048
        for lo in range(0, n, tile):
            hi = min(lo + tile, n)
            dots = np.zeros((hi - lo, n))
            for j in range(d):
                dots = dots + V[lo:hi, j][:, None] * V[:, j][None, :]
            cos = dots / (norm[lo:hi][:, None] * norm[None, :])
            mask = nan_ge(cos, threshold) & (ids[None, :] < ids[lo:hi, None])
            dropped[lo:hi] |= mask.any(axis=1)
        return pd.DataFrame(
            {
                id_field.name: pdf["_kid"],
                "cluster_id": pdf["_kc"],
                "kept": ~dropped,
            }
        )

    return fn, out_schema


def semdedup(
    emb: DataFrame,
    *,
    k: int | None = 8,
    iters: int = 3,
    scale: int = 10000,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
    target_cluster_rows: int = 2048,
    max_cluster_rows: int = 200_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication restricted to
    k-means clusters — cluster the embeddings, compare pairs ONLY within a
    cluster, and drop every vector whose cosine similarity to a
    LOWER-id clustermate reaches ``threshold`` (keep-first, the same
    deterministic winner rule as the text dedup family).

    Returns (vec_id, cluster_id, kept) for every comparable vector —
    zero-norm/NULL embeddings are excluded BEFORE clustering (cosine is
    undefined on them, and a NULL seed vector makes the Lloyd argmin
    engine-divergent; the module-wide degenerate-embedding contract). On
    degenerate-free input — every driver fixture — the clustering matches
    the declared kmeans_domains assignment bit-for-bit.

    100 TB plan: clustering IS the scale lever — pair work is
    sum(|cluster|^2), so k grows with the corpus to keep clusters bounded
    (the paper runs k~11k on LAION; the declared query's k=8 matches the
    kmeans_domains contract at fixture scale). ``k=None`` MECHANIZES the
    lever (VERDICT r10 #3): k is derived as
    ceil(n_comparable / target_cluster_rows), so a 100x corpus gets 100x
    the clusters and expected pair work stays ~n * target instead of
    n^2/k — the one count() this costs is a bounded scalar. The pair
    stage never leaves the cluster: ``kernel='arrow'`` (default) runs one
    applyInPandas group per cluster — a row-tiled numpy kernel whose
    per-dimension accumulation IS the sequential fold (bit-identical to
    the oracle's list_reduce; the exact-kmeans Arrow-kernel precedent,
    measured ~3.5x over the interpreted higher-order fold at 20k vectors)
    and needs each CLUSTER (not the corpus) to fit a worker — enforced,
    not assumed: a cluster past ``max_cluster_rows`` RAISES on the worker
    with the remediation (raise k / k=None / kernel='join') instead of
    silently OOMing it. ``kernel='join'`` keeps the pure-DataFrame
    cluster-equality hash self-join: memory-unbounded streaming pairs,
    any cluster size, same output bit-for-bit (equivalence
    pytest-pinned). Exactness under BOTH kernels: cosine compared
    UNROUNDED on both engines — the neardup_embedding_cosine
    precedent."""
    import math

    from checkatron_spark.operators.kmeans import kmeans_assign
    from checkatron_spark.operators.similarity import _safe_div, dot, l2_norm
    from checkatron_spark.session import scratch_persist

    ok = emb.filter(
        F.col(vec_col).isNotNull() & (l2_norm(F.col(vec_col)) > 0.0)
    )
    if k is None:
        # derive the paper's k ∝ corpus lever from the comparable count;
        # the count() is one bounded job (returns a scalar, the kmeans
        # seed scan reads the same cached parquet right after)
        n_ok = ok.count()
        k = max(1, math.ceil(n_ok / max(target_cluster_rows, 1)))
    assign = kmeans_assign(ok, k=k, iters=iters, scale=scale).select(
        id_col, "cluster_id"
    )
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if kernel == "arrow":
        grouped = ok.select(
            F.col(id_col).alias("_kid"),
            dv.alias("_kv"),
        ).join(assign.withColumnRenamed(id_col, "_kid"), "_kid").withColumn(
            "_kc", F.col("cluster_id").cast("int")
        )
        fn, out_schema = _semdedup_drop_kernel(
            threshold, emb.schema[id_col], max_cluster_rows
        )
        return grouped.groupBy("_kc").applyInPandas(fn, out_schema)
    if kernel != "join":
        raise ValueError(f"unknown semdedup kernel {kernel!r}")
    v = scratch_persist(
        ok.select(
            F.col(id_col),
            dv.alias("_v"),
            l2_norm(F.col(vec_col)).alias("_n"),
        ).join(assign, id_col)
    )
    a = v.select(
        F.col(id_col).alias("_ida"),
        "cluster_id",
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = v.select(
        F.col(id_col).alias("_idb"),
        "cluster_id",
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    dropped = (
        a.join(b, "cluster_id")
        .filter(F.col("_idb") < F.col("_ida"))
        .filter(
            _safe_div(
                dot(F.col("_va"), F.col("_vb")),
                F.col("_na") * F.col("_nb"),
            )
            >= F.lit(threshold)
        )
        .select(F.col("_ida").alias(id_col))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    return v.select(id_col, "cluster_id").join(dropped, id_col, "left").select(
        id_col, "cluster_id", F.col("_d").isNull().alias("kept")
    )


def semdedup_sql(
    *, k: int = 8, iters: int = 3, scale: int = 10000, threshold: float = 0.3
) -> str:
    """DuckDB twin: the unrolled Lloyd chain from pipelines._kmeans_sql as
    a subquery, the same _EMB_OK degenerate filter, the same unrounded
    list_reduce cosine."""
    from checkatron_spark.pipelines import _EMB_OK, _cos_sql, _kmeans_sql

    km = _kmeans_sql(k=k, iters=iters, scale=scale, src="emb_ok")
    return f"""
WITH emb_ok AS (SELECT * FROM embeddings WHERE {_EMB_OK}),
assign AS (SELECT vec_id, cluster_id FROM (WITH {km.removeprefix('WITH ')}) t),
v AS (
    SELECT e.vec_id, e.embedding, a.cluster_id
    FROM emb_ok e JOIN assign a USING (vec_id)
),
dropped AS (
    SELECT DISTINCT a.vec_id
    FROM v a JOIN v b ON a.cluster_id = b.cluster_id AND b.vec_id < a.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {threshold}
)
SELECT v.vec_id, v.cluster_id, (d.vec_id IS NULL) AS kept
FROM v LEFT JOIN dropped d ON v.vec_id = d.vec_id
"""


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------

def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load_table(spark, "documents", sf_dir))


def q_bm25_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_multiquery(load_table(spark, "documents", sf_dir))


def q_contamination_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same 5%-eval-draw split as decontaminate_corpus (salt 'bench-v1'),
    graded instead of binary."""
    from checkatron_spark.sampling import hash_uniform

    docs = load_table(spark, "documents", sf_dir)
    u = hash_uniform(F.col("doc_id"), "bench-v1")
    return contamination_frac(
        docs.filter(u >= 0.05), docs.filter(u < 0.05), "text", "doc_id"
    )


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 5% 'bench-v1' draw plays the DSIR target distribution; every
    other document is raw and gets a weight."""
    from checkatron_spark.sampling import hash_uniform

    docs = load_table(spark, "documents", sf_dir)
    return dsir_importance(
        docs, hash_uniform(F.col("doc_id"), "bench-v1") < 0.05
    )


# ---------------------------------------------------------------------------
# greedy-subword token counting (VERDICT r11 #8 stretch)
# ---------------------------------------------------------------------------

# A small PUBLIC subword vocabulary: the high-frequency English character
# units every published BPE/WordPiece merge table learns first (classic
# merge outcomes — 'th'+'e', 'in'+'g', 'a'+'tion', ...). Fixed and
# deterministic, so tokenization is exactly reproducible in ANSI SQL; a
# production deployment swaps in its model's real merge vocabulary and the
# operator/plan are unchanged.
SUBWORD_VOCAB: tuple[str, ...] = (
    "ation", "ther", "tion", "ing", "ent", "ion", "and", "the", "ed",
    "er", "es", "re", "ti", "in", "on", "st", "en", "at", "nd", "or",
    "te", "of", "ar", "to", "an", "al", "is", "it", "ou", "as", "ha",
    "se", "le", "ve", "me", "co", "de", "hi", "ri", "ro", "ic", "ne",
    "ea", "ra", "ce", "li", "ch", "ll",
)


def token_count_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: tuple[str, ...] = SUBWORD_VOCAB,
) -> DataFrame:
    """Greedy longest-match subword token counts — the BPE/WordPiece
    INFERENCE rule (at each position, consume the longest vocabulary unit
    that prefixes the remaining word; no match consumes one character as
    its own token) over a fixed public merge vocabulary. This is what
    makes token budgets (pack_sequences_budget, mix_budget_plan)
    meaningful in LLM terms instead of whitespace terms: the subword
    count, not the word count, is what fills a context window.

    Returns one row per input document: (id_col, n_words,
    n_subword_tokens) — blank/NULL text counts (0, 0). Words lowercase
    before matching; greedy longest-match is deterministic, so the DuckDB
    oracle reproduces it exactly with a recursive CTE (one chain per
    DISTINCT word, longest matching prefix via max(len)).

    100 TB plan: the Arrow kernel runs per DISTINCT lowercased word, not
    per occurrence — zipf economics make the distinct-word table orders
    of magnitude smaller than the corpus token stream. One shuffle builds
    it (groupBy word), the per-word counts join back on the word key
    (broadcast when small, AQE decides), and the per-doc rollup is a
    map-side-combined sum of exact BIGINTs. The vocabulary rides the
    task closure (bytes, like the Bloom masks)."""
    by_first: dict[str, list[str]] = {}
    for t in sorted(vocab, key=len, reverse=True):
        by_first.setdefault(t[0], []).append(t)

    @F.pandas_udf(LongType())
    def _bpe_n(ws: pd.Series) -> pd.Series:
        out = []
        for w in ws:
            p, n, L = 0, 0, len(w)
            while p < L:
                for t in by_first.get(w[p], ()):
                    if w.startswith(t, p):
                        p += len(t)
                        break
                else:
                    p += 1
                n += 1
            out.append(n)
        return pd.Series(out, dtype="int64")

    words = (
        docs.select(
            F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("_w")
        )
        .filter(F.col("_w") != "")
        .select(id_col, F.lower(F.col("_w")).alias("_w"))
    )
    counts = (
        words.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .withColumn("_n", _bpe_n(F.col("_w")))
    )
    perdoc = (
        words.join(counts.select("_w", "_n"), "_w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("_n").cast("bigint").alias("n_subword_tokens"),
        )
    )
    return (
        docs.select(id_col)
        .join(perdoc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0)).cast("bigint").alias(
                "n_words"
            ),
            F.coalesce(F.col("n_subword_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_subword_tokens"),
        )
    )


def token_count_bpe_sql(vocab: tuple[str, ...] = SUBWORD_VOCAB) -> str:
    vals = ", ".join(f"('{t}', {len(t)})" for t in vocab)
    return f"""
WITH RECURSIVE
vocab(tok, len) AS (VALUES {vals}),
words AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS word FROM documents
),
dw AS (SELECT DISTINCT lower(word) AS w FROM words WHERE word <> ''),
steps(w, rest, cnt) AS (
  SELECT w, w, 0 FROM dw
  UNION ALL
  SELECT s.w,
         substr(s.rest, 1 + coalesce((SELECT max(v.len) FROM vocab v
                                      WHERE substr(s.rest, 1, v.len) = v.tok),
                                     1)),
         s.cnt + 1
  FROM steps s WHERE s.rest <> ''
),
counts AS (SELECT w, max(cnt) AS n FROM steps WHERE rest = '' GROUP BY w),
perdoc AS (
  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(c.n) AS BIGINT) AS n_subword_tokens
  FROM words w JOIN counts c ON lower(w.word) = c.w
  WHERE w.word <> ''
  GROUP BY w.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(p.n_subword_tokens, 0) AS BIGINT) AS n_subword_tokens
FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count_bpe(load_table(spark, "documents", sf_dir))


def bpe_learn_segment(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 6,
    top_words: int = 500,
    top_out: int = 50,
) -> DataFrame:
    """LEARN a BPE merge table from the corpus — the tokenizer-TRAINING
    counterpart of :func:`token_count_bpe`'s inference (Sennrich et al.
    2016, the algorithm behind GPT/Llama vocabularies): start from
    characters, repeatedly count adjacent symbol pairs weighted by word
    frequency and merge the most frequent pair, ``n_merges`` times.
    Returns the ``top_out`` most frequent words with their learned
    segmentation: (word, freq, tokens, n_tokens).

    Distributed shape (the kmeans/PQ iterative contract): ONE corpus-wide
    word-count pass (explode + groupBy — the only corpus-scale work),
    then every Lloyd-style round runs on the PERSISTED ``top_words``-row
    head-vocabulary table (pair counts = a slice/arrays_zip explode over
    <=top_words short arrays; the argmax collect is ONE row). At 100 TB
    the corpus contributes exactly one aggregate; merge learning is
    corpus-size-independent — the standard practice of training the
    tokenizer on the vocabulary head, made an explicit, deterministic
    contract (ties: count DESC, then pair lexicographic; words admitted
    by ``^[a-z0-9]+$`` after lowercasing — a fixed alphabet keeps every
    engine's regex/case semantics identical; cutoff ties: freq DESC,
    word).

    Exactly replayable in SQL: symbols are encoded ``" tok|"`` (each
    token carries its OWN leading space and trailing pipe, so replacing
    ``" a| b|"`` with ``" ab|"`` never consumes a neighbour's delimiter —
    adjacent occurrences like a·b·a·b merge to ab·ab in one pass, the
    classic space-separated-BPE overlap bug avoided by construction),
    and every merge step is one string replace both engines apply
    left-to-right non-overlapping."""
    from checkatron_spark.session import scratch_persist

    wc = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("_w"))
        .filter(F.col("_w") != "")
        .select(F.lower(F.col("_w")).alias("_w"))
        .filter(F.col("_w").rlike("^[a-z0-9]+$"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("_w").asc())
        .limit(top_words)
        .withColumn("_sym", F.regexp_replace("_w", "(.)", " $1|"))
        .transform(scratch_persist)
    )
    cur = wc
    syms = F.expr("filter(split(_sym, '[|]'), x -> x <> '')")
    for _ in range(n_merges):
        s = syms.alias("_s")
        n1 = F.size(F.col("_s")) - F.lit(1)
        pairs = (
            cur.select("freq", s)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("_s"), F.lit(1), n1).alias("a"),
                        F.slice(F.col("_s"), F.lit(2), n1).alias("b"),
                    )
                ).alias("_p"),
            )
            .select(
                F.ltrim(F.col("_p.a")).alias("a"),
                F.ltrim(F.col("_p.b")).alias("b"),
                "freq",
            )
        )
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word is a single symbol already
        a, b = top[0].a, top[0].b
        cur = cur.withColumn(
            "_sym",
            F.expr(f"replace(_sym, ' {a}| {b}|', ' {a}{b}|')"),
        )
    return (
        cur.select(
            F.col("_w").alias("word"),
            F.col("freq").cast("bigint").alias("freq"),
            F.trim(F.expr("replace(_sym, '|', '')")).alias("tokens"),
            F.size(syms).cast("int").alias("n_tokens"),
        )
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(top_out)
    )


def bpe_learn_sql(
    *, n_merges: int = 6, top_words: int = 500, top_out: int = 50
) -> str:
    """Unrolled oracle twin of :func:`bpe_learn_segment`: one CTE triple
    (symbol table, argmax merge, replace) per merge step — compile-time
    n_merges, the _kmeans_sql/pq_adc_sql contract."""
    parts = [
        f"""toks AS (
  SELECT lower(t.w) AS w
  FROM (SELECT unnest({_DUCK_TOKS}) AS w FROM documents) t
  WHERE t.w <> ''
),
wc AS (
  SELECT w, COUNT(*) AS freq FROM toks
  WHERE regexp_matches(w, '^[a-z0-9]+$')
  GROUP BY w ORDER BY freq DESC, w LIMIT {top_words}
),
s0 AS (SELECT w, freq, regexp_replace(w, '(.)', ' \\1|', 'g') AS sym
       FROM wc)"""
    ]
    for i in range(n_merges):
        parts.append(f"""ss{i} AS (
  SELECT w, freq, sym,
         list_filter(string_split(sym, '|'), x -> x <> '') AS syms
  FROM s{i}
),
m{i} AS (
  SELECT a, b FROM (
    SELECT ltrim(syms[u.i]) AS a, ltrim(syms[u.i + 1]) AS b,
           SUM(freq) AS c
    FROM ss{i}, UNNEST(range(1, len(syms))) AS u(i)
    GROUP BY 1, 2
  ) q ORDER BY c DESC, a, b LIMIT 1
),
mt{i} AS (
  -- total twin of m{i} (round 14, ADVICE r13): when every head word is
  -- already a single symbol the argmax is EMPTY — the Python side breaks
  -- and keeps the segmentation, but a cross join with an empty m{i}
  -- would annihilate every row. The sentinel ('','') renders the replace
  -- pattern ' | |', unmatchable against non-empty [a-z0-9]+ symbols, so
  -- the merge becomes the identity — same semantics as the break.
  SELECT a, b FROM m{i}
  UNION ALL
  SELECT '' AS a, '' AS b WHERE NOT EXISTS (SELECT 1 FROM m{i})
),
s{i + 1} AS (
  SELECT w, freq,
         replace(sym, ' ' || m.a || '| ' || m.b || '|',
                 ' ' || m.a || m.b || '|') AS sym
  FROM ss{i}, mt{i} m
)""")
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT w AS word, CAST(freq AS BIGINT) AS freq,
       trim(replace(sym, '|', '')) AS tokens,
       CAST(len(list_filter(string_split(sym, '|'), x -> x <> ''))
            AS INTEGER) AS n_tokens
FROM s{n_merges} ORDER BY freq DESC, word LIMIT {top_out}
"""


def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_learn_segment(load_table(spark, "documents", sf_dir))


def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table, on the SAME clustering contract
    as kmeans_domains (k=8, 3 rounds, 1e4 grid). threshold=0.3 is
    fixture-tuned (the synthetic embeddings top out near 0.51
    within-cluster; a production near-dup bar sits at 0.9+), the
    decontaminate_semantic precedent."""
    return semdedup(load_table(spark, "embeddings", sf_dir))


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "bm25_multiquery": q_bm25_multiquery,
    "contamination_frac": q_contamination_frac,
    "dsir_importance": q_dsir_importance,
    "semdedup_prune": q_semdedup_prune,
    "token_count_bpe": q_token_count_bpe,
    "bpe_train_segment": q_bpe_learn,
}


def oracles() -> dict[str, str]:
    return {
        "bm25_topk": bm25_topk_sql(),
        "bm25_multiquery": bm25_multiquery_sql(),
        "contamination_frac": contamination_frac_sql(),
        "dsir_importance": dsir_importance_sql(),
        "semdedup_prune": semdedup_sql(),
        "token_count_bpe": token_count_bpe_sql(),
        "bpe_train_segment": bpe_learn_sql(),
    }
