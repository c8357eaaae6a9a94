"""Corpus-level curation operators for LLM training-data pipelines.

These are the whole-corpus text passes a pretraining data pipeline runs
between raw ingest and tokenization — complementing the per-document stats
in ``functions/text.py`` and the pairwise dedup in ``operators/dedup.py``
with signals that need a GLOBAL aggregation over the corpus:

- ``dup_ngram_profile``: per-document fraction of word n-grams that occur
  in other documents too (the RefinedWeb/Gopher-style "duplicated n-gram"
  quality signal; the corpus-wide analog of C4's duplicated-line filter,
  adapted to the fixtures' single-line documents). Plan: explode distinct
  shingles (one shuffle on shingle to count document frequency), join back,
  re-aggregate per document (one shuffle on doc_id). Both shuffles are on
  high-cardinality keys — the layout that survives 100 TB; nothing is
  collected, no all-pairs work.
- ``chunk_documents``: fixed-size character windows with overlap (RAG /
  context-shard prep). Pure per-row explode of a computed offset sequence —
  narrow, zero shuffles, scan-speed at any scale.
- ``repetition_profile``: per-document repetition signals (unique-word
  ratio, top-word fraction, top-bigram fraction) used by Gopher-style
  quality filters. Per-document aggregation only — shuffle on doc_id.
- ``corpus_card``: the dataset-card composition rollup (per source x lang:
  docs, chars, words) a pipeline publishes with every corpus snapshot.

Every operator is deterministic and engine-portable: counts stay integral,
each emitted fraction is ONE IEEE-double division of two exact integers
(bit-identical across Spark and DuckDB), rounded to 6 places on both sides.

Reference parity note: the reference (simbo1905/checkatron) has no corpus
operators — this module belongs to the large-scale-training-data mandate
layered on top of the diff-engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from checkatron_spark.functions.text import NON_WS_CLASS, WS_CLASS
from checkatron_spark.sources.tables import load_table

__all__ = [
    "dup_ngram_profile",
    "chunk_documents",
    "repetition_profile",
    "vocab_coverage",
    "strip_boilerplate",
    "strip_repeated_sentences",
    "dedup_spans_keep_first",
    "gopher_quality_profile",
    "corpus_card",
    "token_heavy_hitters_cms",
    "lm_bigram_coverage",
    "cms_merge",
    "quality_floor_by_source",
    "quality_floor_kept",
    "novelty_profile",
    "ccnet_ppl_buckets",
    "QUERIES",
    "oracles",
]


def _word_ngrams(words_col: str, n: int):
    """Array of space-joined word n-grams from an array-of-words column
    (1-based slice over [1 .. size-n+1]).

    The short-document case needs an explicit guard: Spark's
    ``sequence(1, 0)`` yields the DESCENDING array [1, 0] (step is inferred
    as -1 when start > stop), not an empty sequence."""
    return F.expr(
        f"CASE WHEN size({words_col}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({words_col}) - {n - 1}), "
        f"i -> array_join(slice({words_col}, i, {n}), ' ')) END"
    )


def dup_ngram_profile(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-n-gram fraction against the WHOLE corpus.

    A shingle (word n-gram) is "duplicated" when it appears in at least
    ``min_docs`` distinct documents; each document reports the fraction of
    its distinct shingles that are duplicated. High fractions flag
    boilerplate/templated/near-copied documents — the filterable signal
    behind corpus-level dedup policies.

    Returns (doc_id, n_shingles, n_dup, dup_fraction) — one row per
    document that has at least one shingle."""
    from checkatron_spark.session import scratch_persist

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_w"),
    )
    # persisted because BOTH the docfreq aggregation and the join probe
    # consume it — one scan+explode+distinct, not two
    shingles = (
        words.select("doc_id", F.explode(_word_ngrams("_w", n)).alias("shingle"))
        .distinct()  # document frequency, not occurrence frequency
        .transform(scratch_persist)
    )
    # Document frequency via groupBy + join-back, NOT count-over-window:
    # a window partitioned on shingle sends every posting of a hot shingle
    # (boilerplate n-grams at corpus scale) to ONE reducer with no partial
    # aggregation. The groupBy combines map-side, and the join is a
    # standard equi-join AQE can skew-split.
    docfreq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    return (
        shingles.join(docfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("_df") >= min_docs, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.round(
                F.col("n_dup").cast("double") / F.col("n_shingles").cast("double"),
                6,
            ).alias("dup_fraction"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Split each document into fixed-size character chunks with overlap.

    Chunk i covers [i*stride, i*stride + size) with stride = size -
    overlap; the last chunk may be short. Narrow per-row explode — no
    shuffle, chunking 100 TB is a scan. Returns (doc_id, chunk_idx,
    chunk_start, chunk_text, chunk_len)."""
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    stride = size - overlap
    starts = F.expr(
        f"sequence(0, greatest(length({text_col}) - 1, 0), {stride})"
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        # sequence() always yields start=0, even for empty text; drop the
        # empty chunk an empty document would produce
        .withColumn(
            "chunk_text",
            F.expr(f"substring(_t, chunk_start + 1, {size})"),
        )
        .filter(F.length("chunk_text") > 0)
        .select(
            "doc_id",
            "chunk_idx",
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            "chunk_text",
            F.length("chunk_text").cast("bigint").alias("chunk_len"),
        )
    )


def repetition_profile(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition signals (Gopher-style quality features):
    unique-word ratio, most-frequent-word fraction, most-frequent-bigram
    fraction. One shuffle on (doc, term) then one on doc — scales as a
    plain double aggregation. Returns (doc_id, n_words, n_unique_words,
    unique_ratio, top_word_fraction, top_bigram_fraction)."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_w"),
    )

    wstats = (
        words.select("doc_id", F.explode("_w").alias("_t"))
        .groupBy("doc_id", "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc_id")
        .agg(
            F.sum("_c").alias("n_words"),
            F.count(F.lit(1)).alias("n_unique_words"),
            F.max("_c").alias("_top_w"),
        )
    )
    bstats = (
        words.select("doc_id", F.explode(_word_ngrams("_w", 2)).alias("_b"))
        .groupBy("doc_id", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc_id")
        .agg(F.sum("_c").alias("_n_bigrams"), F.max("_c").alias("_top_b"))
    )
    return (
        wstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "n_unique_words",
            F.round(
                F.col("n_unique_words").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("unique_ratio"),
            F.round(
                F.col("_top_w").cast("double") / F.col("n_words").cast("double"),
                6,
            ).alias("top_word_fraction"),
            F.round(
                F.col("_top_b").cast("double")
                / F.col("_n_bigrams").cast("double"),
                6,
            ).alias("top_bigram_fraction"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Per-document out-of-vocabulary profile against the corpus's own
    top-``top_n`` token vocabulary — the OOV-rate signal a tokenizer/vocab
    decision is checked with. Vocabulary selection is deterministic
    (occurrence count desc, token asc) via a distributed top-N
    (TakeOrdered), NOT a single-partition window — the ranked input is the
    aggregated token table, and the chosen vocab is small enough to
    broadcast back against the token stream. One shuffle on token, one on
    doc_id. Returns (doc_id, n_tokens, n_oov, oov_fraction)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("tok").asc())
        .limit(top_n)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("oov_fraction"),
        )
    )


def _tiled_chunks(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text): NON-overlapping ``k``-word tiles.

    Two load-bearing details. (1) NULL text folds to '' — posexplode of a
    NULL tile array would silently DROP the document, which a cleaning pass
    must never do. (2) ``split`` runs ONCE per row into a materialized
    array column: inlining it in the transform lambda re-evaluates the
    split for EVERY tile (higher-order lambdas are interpreted, no CSE
    across the lambda boundary), O(words x tiles) per document — measured
    5.8s -> 1.1s for the bare explode over the 50k-doc probe corpus.
    (3) The result is scratch-persisted: both consumers (the chunk-text
    frequency aggregate and the join-back probe side) read it, so the
    scan+split+explode runs once, not twice; the contract wrapper /
    scratch_cache() releases it after the query drains."""
    from checkatron_spark.session import scratch_persist

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("_words"),
    )
    tiles = F.expr(
        f"transform(sequence(0, CAST((size(_words) - 1) / {k} AS INT)), "
        f"i -> array_join(slice(_words, i * {k} + 1, {k}), ' '))"
    )
    return words.select(
        "doc_id", F.posexplode(tiles).alias("chunk_idx", "chunk_text")
    ).transform(scratch_persist)


def strip_boilerplate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """C4/CCNet-style cross-document boilerplate removal, adapted to the
    fixtures' single-line documents: tile each document into NON-overlapping
    ``k``-word chunks, count in how many distinct documents each chunk text
    occurs, strip every chunk occurring in ≥ ``min_docs`` documents, and
    reassemble the surviving chunks in order. (C4 does this at line level
    with "lines seen in ≥3 pages"; the unit here is the word tile because
    the corpus has no line structure.) Non-overlapping tiles make the
    rebuild well-defined — every word belongs to exactly one chunk.

    Plan: chunking is a narrow per-row transform; document frequency is one
    map-side-combining groupBy on chunk text (high cardinality — no hot
    reducer). The join back carries ONLY the boilerplate set (chunks with
    df >= min_docs, filtered BEFORE the join): the overwhelming majority of
    chunks are unique, so the build side collapses from every-distinct-chunk
    to just the repeated ones, and a LEFT join (null = keep) lets AQE pick a
    broadcast when the set is small — at the 50k-doc probe this removed the
    full-corpus string-key shuffle join and cut runtime ~2x. When boilerplate
    is genuinely huge AQE falls back to a shuffle join, still over the
    filtered set. Rebuild is one shuffle on doc_id. Nothing collected — the
    shape that survives 100 TB. Returns (doc_id, clean_text, n_chunks,
    n_removed); a fully-boilerplate document yields clean_text = ''."""
    chunks = _tiled_chunks(docs, id_col, text_col, k)
    boiler = (
        chunks.groupBy("chunk_text")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("chunk_text", F.lit(True).alias("_boiler"))
    )
    return (
        chunks.join(boiler, "chunk_text", "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(CASE WHEN _boiler "
                    "IS NULL THEN struct(chunk_idx, chunk_text) END)), "
                    "s -> s.chunk_text)"
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(
                F.when(F.col("_boiler"), F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias("n_removed"),
        )
    )


def gopher_quality_profile(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100000,
    stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is"),
) -> DataFrame:
    """Gopher-style per-document quality rule bundle: word-count bounds,
    mean word length in [3, 10], ≥80% of words containing an alphabetic
    character, and ≥2 stop words — each emitted as its own flag plus the
    combined keep decision, so a pipeline can report WHY documents were
    dropped, not just how many.

    Every flag is derived from integer comparisons only (mean-word-length
    ∈ [3,10] is checked as ``3·n ≤ Σlen ≤ 10·n``, the 80% alpha rule as
    ``5·n_alpha ≥ 4·n``), so the booleans are bit-identical on any engine
    — no float threshold can flip on a rounding difference. All signals
    are array-lambda expressions over the split text (whole-stage codegen,
    no explode, no UDF): a zero-shuffle scan at any scale."""
    stops = ", ".join(f"'{s}'" for s in stopwords)
    # NULL text folds to '' so every flag is a definite boolean (a NULL
    # keep would silently vanish from a .filter("keep") gate)
    t = f"coalesce({text_col}, '')"
    n_words = F.expr(f"size(split({t}, ' '))")
    sum_len = F.expr(
        f"aggregate(split({t}, ' '), 0L, (acc, x) -> acc + length(x))"
    )
    n_alpha = F.expr(
        f"size(filter(split({t}, ' '), x -> x rlike '[a-zA-Z]'))"
    )
    n_stop = F.expr(
        f"size(filter(split({t}, ' '), "
        f"x -> array_contains(array({stops}), x)))"
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("bigint").alias("n_words"),
        sum_len.cast("bigint").alias("sum_word_chars"),
        n_alpha.cast("bigint").alias("n_alpha_words"),
        n_stop.cast("bigint").alias("n_stopwords"),
    )
    flag_count = (F.col("n_words") >= min_words) & (
        F.col("n_words") <= max_words
    )
    flag_mwl = (
        F.col("sum_word_chars") >= 3 * F.col("n_words")
    ) & (F.col("sum_word_chars") <= 10 * F.col("n_words"))
    flag_alpha = 5 * F.col("n_alpha_words") >= 4 * F.col("n_words")
    flag_stop = F.col("n_stopwords") >= 2
    return d.select(
        "doc_id",
        "n_words",
        "sum_word_chars",
        "n_alpha_words",
        "n_stopwords",
        flag_count.alias("flag_word_count"),
        flag_mwl.alias("flag_mean_word_len"),
        flag_alpha.alias("flag_alpha_words"),
        flag_stop.alias("flag_stopwords"),
        (flag_count & flag_mwl & flag_alpha & flag_stop).alias("keep"),
    )


def corpus_card(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source", "lang"),
) -> DataFrame:
    """Dataset-card composition rollup: per group, document count, total
    characters, total words, average document length. The summary a corpus
    snapshot ships with. One partial-aggregated shuffle on the (tiny)
    group key space."""
    n_words = F.size(F.split(F.col(text_col), " "))
    return (
        docs.groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(text_col)).cast("bigint").alias("total_chars"),
            F.sum(n_words).cast("bigint").alias("total_words"),
        )
        .select(
            *group_cols,
            "n_docs",
            "total_chars",
            "total_words",
            F.round(
                F.col("total_chars").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("avg_chars_per_doc"),
        )
    )


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    """The flagship diff operator applied to the corpus table: compare two
    deterministic snapshots of ``documents`` keyed on doc_id, producing the
    reference diff-result shape (per-column status codes + _row_status) over
    training data. This is the regression check a corpus pipeline runs
    between dataset versions — which documents were added, dropped, had text
    edited, or lost metadata — using the same single full-outer null-safe
    join that survives 100 TB.

    Snapshot perturbations (same style as workloads.orders_before/after):
    before drops doc_id % 17 == 2; after drops doc_id % 29 == 5, rewrites
    text for doc_id % 13 == 0 and nulls lang for doc_id % 31 == 0."""
    from checkatron_spark import diff

    docs = load_table(spark, "documents", sf_dir)
    before = docs.filter(F.col("doc_id") % 17 != 2)
    after = (
        docs.filter(F.col("doc_id") % 29 != 5)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text")),
        )
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 31 == 0, F.lit(None).cast("string"))
            .otherwise(F.col("lang")),
        )
    )
    return diff(before, after, ["doc_id"], **kw)


_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
_DOCS_BEFORE_SQL = "(SELECT * FROM documents WHERE doc_id % 17 <> 2) b_src"
_DOCS_AFTER_SQL = (
    "(SELECT doc_id, "
    "CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS text, "
    "CASE WHEN doc_id % 31 = 0 THEN NULL ELSE lang END AS lang, "
    "source, n_chars "
    "FROM documents WHERE doc_id % 29 <> 5) a_src"
)


def corpus_snapshot_diff_oracle_sql() -> str:
    from checkatron_spark.plans.sqlgen import render_diff_sql

    return render_diff_sql(
        _DOCS_BEFORE_SQL, _DOCS_AFTER_SQL, ["doc_id"], _DOC_COLS, _DOC_COLS
    )


_CORPUS_DRIFT_SPECS = {"doc_id": 1.0, "n_chars": 1.0}


def corpus_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cheap pre-diff gate over the same corpus snapshots: column-level
    drift profile (count/nulls/exact sum/min/max per column, before vs
    after) in two single-row aggregate scans, no join (operators/drift.py).
    At 100 TB this answers "did the dataset move at all, and where?" before
    paying for the row-level corpus_snapshot_diff."""
    from checkatron_spark.operators.drift import drift_profile

    docs = load_table(spark, "documents", sf_dir)
    before = docs.filter(F.col("doc_id") % 17 != 2)
    after = docs.filter(F.col("doc_id") % 29 != 5)
    return drift_profile(before, after, _CORPUS_DRIFT_SPECS)


def corpus_snapshot_drift_oracle_sql() -> str:
    before_src = "(SELECT * FROM documents WHERE doc_id % 17 <> 2) b_src"
    after_src = "(SELECT * FROM documents WHERE doc_id % 29 <> 5) a_src"

    def side(src: str, c: str, scale: float) -> str:
        sc = f"CAST(floor(CAST({c} AS DOUBLE) * {scale} + 0.5) AS BIGINT)"
        return (
            f"SELECT COUNT(*) AS n, "
            f"COUNT(*) FILTER (WHERE {c} IS NULL) AS nulls, "
            f"CAST(SUM({sc}) AS BIGINT) AS s, "
            f"MIN({sc}) AS mn, MAX({sc}) AS mx "
            f"FROM {src}"
        )

    arms = []
    for c, scale in _CORPUS_DRIFT_SPECS.items():
        arms.append(
            f"SELECT '{c}' AS column_name, "
            f"b.n AS n_before, a.n AS n_after, "
            f"b.nulls AS nulls_before, a.nulls AS nulls_after, "
            f"b.s AS sum_before, a.s AS sum_after, "
            f"b.mn AS min_before, a.mn AS min_after, "
            f"b.mx AS max_before, a.mx AS max_after "
            f"FROM ({side(before_src, c, scale)}) b, "
            f"({side(after_src, c, scale)}) a"
        )
    return "\nUNION ALL\n".join(arms)


# ---------------------------------------------------------------------------
# declared queries + DuckDB oracles
# ---------------------------------------------------------------------------

def q_dup_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_ngram_profile(load_table(spark, "documents", sf_dir), n=5)


DUP_NGRAM_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
starts AS (
  SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS i
  FROM words
),
shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, CAST(i AS INTEGER),
                                    CAST(i AS INTEGER) + 4), ' ') AS shingle
  FROM starts
),
docfreq AS (
  SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       round(CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_fraction
FROM shingles s JOIN docfreq d USING (shingle)
GROUP BY s.doc_id
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        load_table(spark, "documents", sf_dir), size=100, overlap=20
    )


CHUNK_SQL = """
WITH starts AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(length(text) - 1, 0) + 1, 80)) AS i
  FROM documents
)
SELECT doc_id,
       CAST(i // 80 AS INTEGER) AS chunk_idx,
       CAST(i AS BIGINT) AS chunk_start,
       substring(text, CAST(i AS INTEGER) + 1, 100) AS chunk_text,
       CAST(length(substring(text, CAST(i AS INTEGER) + 1, 100)) AS BIGINT)
         AS chunk_len
FROM starts
WHERE length(substring(text, CAST(i AS INTEGER) + 1, 100)) > 0
"""


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_profile(load_table(spark, "documents", sf_dir))


REPETITION_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
exploded AS (
  SELECT doc_id, unnest(w) AS t FROM words
),
wcounts AS (
  SELECT doc_id, t, COUNT(*) AS c FROM exploded GROUP BY doc_id, t
),
wstats AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_unique_words,
         MAX(c) AS top_w
  FROM wcounts GROUP BY doc_id
),
bstarts AS (
  SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
  FROM words
),
bigrams AS (
  SELECT doc_id,
         array_to_string(list_slice(w, CAST(i AS INTEGER),
                                    CAST(i AS INTEGER) + 1), ' ') AS b
  FROM bstarts
),
bcounts AS (
  SELECT doc_id, b, COUNT(*) AS c FROM bigrams GROUP BY doc_id, b
),
bstats AS (
  SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_b
  FROM bcounts GROUP BY doc_id
)
SELECT w.doc_id, w.n_words, w.n_unique_words,
       round(CAST(w.n_unique_words AS DOUBLE) / CAST(w.n_words AS DOUBLE), 6)
         AS unique_ratio,
       round(CAST(w.top_w AS DOUBLE) / CAST(w.n_words AS DOUBLE), 6)
         AS top_word_fraction,
       round(CAST(b.top_b AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE), 6)
         AS top_bigram_fraction
FROM wstats w LEFT JOIN bstats b USING (doc_id)
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage(load_table(spark, "documents", sf_dir), top_n=30)


VOCAB_COVERAGE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
counts AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (ORDER BY c DESC, tok ASC) AS r FROM counts
  ) WHERE r <= 30
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_fraction
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
"""


def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_card(load_table(spark, "documents", sf_dir))


CORPUS_CARD_SQL = """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
       round(CAST(SUM(length(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS avg_chars_per_doc
FROM documents
GROUP BY source, lang
"""


def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return strip_boilerplate(
        load_table(spark, "documents", sf_dir), k=3, min_docs=2
    )


def dedup_spans_keep_first(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
) -> DataFrame:
    """C4's actual span-dedup semantics — "remove all but ONE occurrence of
    any span occurring more than once in the dataset" — as opposed to
    ``strip_boilerplate``, which removes EVERY occurrence of a frequent
    chunk. Each document is tiled into non-overlapping ``k``-word chunks;
    for every distinct chunk text the GLOBAL winner is the occurrence with
    the smallest (doc_id, chunk_idx), which keeps its copy; every other
    occurrence is dropped and the survivors are reassembled in order.

    Plan: the winner per chunk text is one map-side-combining groupBy with
    ``min(struct(doc_id, chunk_idx))`` — NOT a row_number window partitioned
    on chunk (a hot boilerplate chunk would funnel every posting to one
    reducer with no partial aggregation; min(struct) combines on the map
    side, so a chunk occurring a billion times costs one struct per input
    partition). Only CONTESTED chunks (count >= 2) join back: a unique
    chunk's sole occurrence is trivially its own winner, so the build side
    shrinks from every-distinct-chunk to just the duplicated ones and a
    LEFT join (null = uncontested = keep) lets AQE broadcast it when small
    and skew-split it when not. Then one shuffle on doc_id to rebuild.
    Work ∝ corpus tokens, nothing collected — survives 100 TB.

    Returns (doc_id, clean_text, n_chunks, n_kept); a document whose every
    chunk lost its race yields clean_text = ''."""
    chunks = _tiled_chunks(docs, id_col, text_col, k)
    winners = (
        chunks.groupBy("chunk_text")
        .agg(
            F.min(F.struct("doc_id", "chunk_idx")).alias("_w"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 2)
        .select("chunk_text", "_w")
    )
    kept = F.col("_w").isNull() | (
        F.col("_w.doc_id").eqNullSafe(F.col("doc_id"))
        & F.col("_w.chunk_idx").eqNullSafe(F.col("chunk_idx"))
    )
    return (
        chunks.join(winners, "chunk_text", "left")
        .select("doc_id", "chunk_idx", "chunk_text", kept.alias("_keep"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(CASE WHEN _keep "
                    "THEN struct(chunk_idx, chunk_text) END)), "
                    "s -> s.chunk_text)"
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


def q_dedup_spans_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_spans_keep_first(load_table(spark, "documents", sf_dir), k=4)


DEDUP_SPANS_SQL = """
WITH words AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents
),
starts AS (
  SELECT doc_id, w, unnest(range(0, (len(w) - 1) // 4 + 1)) AS i
  FROM words
),
chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS cid,
         array_to_string(list_slice(w, CAST(i * 4 + 1 AS INTEGER),
                                    CAST(i * 4 + 4 AS INTEGER)), ' ')
           AS chunk
  FROM starts
),
ranked AS (
  SELECT doc_id, cid, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cid) AS rn
  FROM chunks
)
SELECT doc_id,
       COALESCE(string_agg(chunk, ' ' ORDER BY cid)
                  FILTER (WHERE rn = 1), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM ranked
GROUP BY doc_id
"""


def strip_repeated_sentences(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """WITHIN-document self-repetition strip (the C4/Gopher post-processing
    pass that drops consecutively duplicated lines): split into trimmed
    non-empty '.'-sentences, drop each sentence equal to its immediate
    predecessor, rejoin. Purely per-row array algebra — zero shuffles,
    scrubbing 100 TB is a scan.

    The predecessor comparison avoids Spark's index-0 ``element_at`` trap
    by zipping the sentence array against a null-prepended shifted copy
    (``zip_with`` pads the shorter side, so empty docs fall out clean).
    NULL folds to '' per the cleaning-never-yields-NULL rule."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    sents = F.filter(
        F.transform(F.split(t, r"\."), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    prev = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(sents, 1, F.greatest(F.size(sents) - 1, F.lit(0))),
    )
    kept = F.filter(
        F.zip_with(sents, prev, lambda c, p: F.when(p.isNull() | (c != p), c)),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        F.col(id_col),
        F.size(sents).alias("n_sentences"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, ". ").alias("clean_text"),
    )


def q_strip_repeated_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return strip_repeated_sentences(load_table(spark, "documents", sf_dir))


STRIP_REPEATED_SQL = """
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(coalesce(text, ''), '.'),
                                    x -> trim(x)), x -> x <> '') AS sents
  FROM documents
),
k AS (
  SELECT doc_id, sents,
         list_filter(sents,
                     (x, i) -> i = 1 OR x IS DISTINCT FROM sents[i-1]) AS kept
  FROM s
)
SELECT doc_id, CAST(len(sents) AS INTEGER) AS n_sentences,
       CAST(len(kept) AS INTEGER) AS n_kept,
       array_to_string(kept, '. ') AS clean_text
FROM k
"""


def strip_boilerplate_ctes(source: str, k: int = 3) -> str:
    """The tile/docfreq CTE block of the strip_boilerplate oracle,
    parameterized by source relation so the curation-funnel oracle reuses
    it verbatim instead of carrying a drift-prone copy. coalesce(text,'')
    mirrors the operator's NULL fold — string_split(NULL) would otherwise
    silently DROP NULL-text documents from the oracle."""
    return f"""words AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM {source}
),
starts AS (
  SELECT doc_id, w, unnest(range(0, (len(w) - 1) // {k} + 1)) AS i
  FROM words
),
chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS cid,
         array_to_string(list_slice(w, CAST(i * {k} + 1 AS INTEGER),
                                    CAST(i * {k} + {k} AS INTEGER)), ' ')
           AS chunk
  FROM starts
),
docfreq AS (
  SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk
)"""


STRIP_BOILERPLATE_SQL = f"""
WITH {strip_boilerplate_ctes("documents")}
SELECT c.doc_id,
       COALESCE(string_agg(c.chunk, ' ' ORDER BY c.cid)
                  FILTER (WHERE d.df < 2), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM chunks c JOIN docfreq d USING (chunk)
GROUP BY c.doc_id
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality_profile(load_table(spark, "documents", sf_dir))


GOPHER_QUALITY_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(string_split(coalesce(text, ''), ' '),
                                      x -> length(x))) AS BIGINT)
           AS sum_word_chars,
         CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              x -> regexp_matches(x, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x IN ('the','a','of','and','to','in','is')))
              AS BIGINT) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_words, sum_word_chars, n_alpha_words, n_stopwords,
       (n_words >= 20 AND n_words <= 100000) AS flag_word_count,
       (sum_word_chars >= 3 * n_words AND sum_word_chars <= 10 * n_words)
         AS flag_mean_word_len,
       (5 * n_alpha_words >= 4 * n_words) AS flag_alpha_words,
       (n_stopwords >= 2) AS flag_stopwords,
       ((n_words >= 20 AND n_words <= 100000)
        AND (sum_word_chars >= 3 * n_words AND sum_word_chars <= 10 * n_words)
        AND (5 * n_alpha_words >= 4 * n_words)
        AND (n_stopwords >= 2)) AS keep
FROM base
"""


def _cms_cell(tok_col, seed: int, width: int):
    h = F.substring(F.md5(F.concat(tok_col, F.lit(f"#{seed}"))), 1, 8)
    return F.conv(h, 16, 10).cast("bigint") % width


def cms_sketch(
    counts: DataFrame, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch cells (row, cell, cnt) from a (tok, c) count frame.
    Built from per-token counts rather than raw occurrences so the md5
    runs once per DISTINCT token, not once per instance. Cells merge by
    addition: union two sketches and re-sum to get the sketch of the
    combined corpus exactly (pinned in tests/test_corpus.py)."""
    cells = None
    for d in range(depth):
        part = counts.select(
            F.lit(d).alias("row"),
            _cms_cell(F.col("tok"), d, width).alias("cell"),
            F.col("c"),
        )
        cells = part if cells is None else cells.unionAll(part)
    return cells.groupBy("row", "cell").agg(F.sum("c").alias("cnt"))


def lm_bigram_coverage(
    target: DataFrame,
    reference: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style reference-LM quality signal, in EXACT arithmetic: score
    each target document by how well a reference corpus's bigram
    statistics "explain" it. CCNet buckets documents by Wikipedia-LM
    perplexity; summing per-token log-probs is float-order-dependent and
    libm-divergent across engines, so this formulation keeps the same
    signal shape with integers — per bigram INSTANCE (frequency-weighted,
    like a real LM):

    - ``known_frac``: fraction of the doc's bigram instances that occur in
      the reference at all (integer counts, ONE final double division);
    - ``band_sum``/``mean_band``: each known bigram contributes its
      reference-frequency band floor(log4(count)) capped at 5 — computed
      by exact CASE thresholds (4/16/64/256/1024), never a float log — so
      common-English-like text scores high and gibberish scores 0, the
      head/middle/tail ordering CCNet derives from perplexity.

    Plan: reference bigram counts are one groupBy; the target side
    explodes instances and joins on the bigram value — work ∝ corpus
    tokens, the dup_ngram_profile shuffle shape. At 100 TB prune the
    reference to a top-K vocabulary and broadcast it (the vocab_coverage
    pattern); the full join stays the exact/oracle-able formulation.

    Returns (id_col, n_bigrams, n_known, known_frac, band_sum, mean_band)
    for EVERY target doc (docs under 2 words score 0 across the board).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(t), WS_CLASS + "+")

    def bigrams(df):
        return df.select(
            F.col(id_col), words.alias("_w")
        ).select(F.col(id_col), F.explode(_word_ngrams("_w", 2)).alias("bg"))

    ref_counts = (
        bigrams(reference).groupBy("bg").agg(F.count(F.lit(1)).alias("_c"))
    )
    band = (
        F.when(F.col("_c") >= 1024, 5)
        .when(F.col("_c") >= 256, 4)
        .when(F.col("_c") >= 64, 3)
        .when(F.col("_c") >= 16, 2)
        .when(F.col("_c") >= 4, 1)
        .when(F.col("_c") >= 1, 0)
    )
    scored = (
        bigrams(target)
        .join(ref_counts, "bg", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.count("_c").cast("bigint").alias("n_known"),
            F.coalesce(F.sum(band), F.lit(0)).cast("bigint").alias("band_sum"),
        )
    )
    # left join back so bigram-less docs (<2 words) still report zeros
    return (
        target.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("n_known", F.lit(0)).cast("bigint").alias("n_known"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.col("n_known").cast("double")
                / F.col("n_bigrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("known_frac"),
            F.coalesce("band_sum", F.lit(0)).cast("bigint").alias("band_sum"),
            F.when(
                F.coalesce("n_known", F.lit(0)) > 0,
                F.col("band_sum").cast("double")
                / F.col("n_known").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_band"),
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches (cells add): union + re-sum per (row,
    cell). This IS the 100 TB rollup primitive — per-snapshot sketches are
    built independently and folded in any order/grouping; the algebra
    (associative, commutative, merge-of-parts == rebuild-of-whole across
    arbitrary snapshot chains) is property-pinned in
    tests/test_properties.py."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "cell").agg(F.sum("cnt").alias("cnt"))


def token_heavy_hitters_cms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    top_n: int = 20,
) -> DataFrame:
    """Count-Min-sketch token frequency estimation, audited against exact
    counts for the corpus's true top-``top_n`` tokens.

    The sketch is the 100 TB shape for frequency estimation: a
    ``depth × width`` counter grid where each token increments one
    md5-derived cell per row. Building it is ONE map-side-combining groupBy
    over at most depth·width keys (4096 cells at the defaults) no matter
    how many distinct tokens the corpus has — counters merge by addition
    across any partitioning, so the sketch is also the mergeable artifact
    an incremental pipeline unions across snapshots. Estimation is
    ``min`` over the token's depth cells; collisions only ever ADD, so
    ``cms_estimate >= exact_count`` is a hard guarantee (pinned in
    tests/test_properties.py).

    Like every portable operator here the cell index is the md5 primitive
    (first 8 hex chars mod width), so the DuckDB oracle rebuilds the
    identical sketch — including identical collisions — bit for bit.

    Returns (token, exact_count, cms_estimate) for the exact top-``top_n``
    tokens (ties broken by token text), estimates from the sketch."""
    from checkatron_spark.session import scratch_persist

    toks = docs.select(
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
        .alias("tok")
    )
    # persisted: the counts frame feeds all `depth` sketch branches PLUS
    # the top-N probe, and `top` feeds `depth` probe branches — without
    # the persists the corpus token aggregation re-executes ~depth+1
    # times inside one query (the exact multi-branch-union trap the
    # funnel's stage persists document)
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    ).transform(scratch_persist)
    sketch = cms_sketch(counts, depth=depth, width=width)

    def _cell(tok_col, seed: int):
        return _cms_cell(tok_col, seed, width)

    top = (
        counts.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(top_n)
        .select("tok", F.col("c").alias("exact_count"))
        .transform(scratch_persist)
    )
    probes = None
    for d in range(depth):
        p = top.select(
            "tok", "exact_count",
            F.lit(d).alias("row"), _cell(F.col("tok"), d).alias("cell"),
        )
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy("tok", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            F.col("tok").alias("token"),
            F.col("exact_count").cast("bigint").alias("exact_count"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        )
    )


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_heavy_hitters_cms(load_table(spark, "documents", sf_dir))


def _cms_cell_sql(tok: str, seed: int, width: int = 1024) -> str:
    return (
        f"(('0x' || substring(md5({tok} || '#{seed}'), 1, 8))::BIGINT "
        f"% {width})"
    )


def cms_sketch_ctes() -> str:
    """counts/cells/sketch CTE block shared by the heavy-hitters oracle
    and the streaming sketch's batch-parity oracle."""
    return f"""counts AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(string_split(coalesce(text, ''), ' ')) AS tok
        FROM documents
    ) GROUP BY tok
),
cells AS (
    SELECT 0 AS row, {_cms_cell_sql("tok", 0)} AS cell, c FROM counts
    UNION ALL SELECT 1, {_cms_cell_sql("tok", 1)}, c FROM counts
    UNION ALL SELECT 2, {_cms_cell_sql("tok", 2)}, c FROM counts
    UNION ALL SELECT 3, {_cms_cell_sql("tok", 3)}, c FROM counts
),
sketch AS (
    SELECT row, cell, CAST(SUM(c) AS BIGINT) AS cnt
    FROM cells GROUP BY row, cell
)"""


TOKEN_CMS_SQL = f"""
WITH {cms_sketch_ctes()},
top AS (
    SELECT tok, c AS exact_count FROM counts
    ORDER BY c DESC, tok ASC LIMIT 20
),
probes AS (
    SELECT tok, exact_count, 0 AS row, {_cms_cell_sql("tok", 0)} AS cell FROM top
    UNION ALL SELECT tok, exact_count, 1, {_cms_cell_sql("tok", 1)} FROM top
    UNION ALL SELECT tok, exact_count, 2, {_cms_cell_sql("tok", 2)} FROM top
    UNION ALL SELECT tok, exact_count, 3, {_cms_cell_sql("tok", 3)} FROM top
)
SELECT p.tok AS token, p.exact_count,
       CAST(MIN(s.cnt) AS BIGINT) AS cms_estimate
FROM probes p JOIN sketch s ON p.row = s.row AND p.cell = s.cell
GROUP BY p.tok, p.exact_count
"""




def q_lm_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-LM coverage score (round 6, lm_bigram_coverage): a 10%
    hash draw of the corpus plays the reference LM (CCNet uses Wikipedia);
    every other document is scored by known-bigram fraction and exact
    frequency bands — the perplexity-bucket signal with no float logs."""
    from checkatron_spark.sampling import hash_uniform

    docs = load_table(spark, "documents", sf_dir)
    u = hash_uniform(F.col("doc_id"), "lm-ref-v1")
    return lm_bigram_coverage(
        docs.filter(u >= 0.1), docs.filter(u < 0.1)
    )


_LM_REF_U = (
    "CAST(('0x' || substring(md5('lm-ref-v1' || ':' || "
    "CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) / 4294967296.0"
)

LM_BIGRAM_SQL = rf"""
WITH u AS (SELECT doc_id, {_LM_REF_U} AS u FROM documents),
w AS (
    SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '[ \t\n\r\f]+') AS w
    FROM documents
),
bg AS (
    SELECT doc_id, unnest(
        CASE WHEN len(w) < 2 THEN []::VARCHAR[]
             ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        END) AS bg
    FROM w
),
ref AS (
    SELECT bg.bg, COUNT(*) AS c
    FROM bg JOIN u USING (doc_id) WHERE u < 0.1 GROUP BY bg.bg
),
tgt AS (SELECT bg.doc_id, bg.bg FROM bg JOIN u USING (doc_id) WHERE u >= 0.1),
scored AS (
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(COUNT(r.c) AS BIGINT) AS n_known,
           CAST(coalesce(SUM(CASE WHEN r.c >= 1024 THEN 5
                         WHEN r.c >= 256 THEN 4
                         WHEN r.c >= 64 THEN 3
                         WHEN r.c >= 16 THEN 2
                         WHEN r.c >= 4 THEN 1
                         WHEN r.c >= 1 THEN 0 END), 0) AS BIGINT) AS band_sum
    FROM tgt t LEFT JOIN ref r USING (bg)
    GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.n_known, 0) AS BIGINT) AS n_known,
       CASE WHEN coalesce(s.n_bigrams, 0) > 0
            THEN CAST(s.n_known AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE)
            ELSE 0.0 END AS known_frac,
       CAST(coalesce(s.band_sum, 0) AS BIGINT) AS band_sum,
       CASE WHEN coalesce(s.n_known, 0) > 0
            THEN CAST(s.band_sum AS DOUBLE) / CAST(s.n_known AS DOUBLE)
            ELSE 0.0 END AS mean_band
FROM (SELECT doc_id FROM documents JOIN u USING (doc_id) WHERE u >= 0.1) d
LEFT JOIN scored s USING (doc_id)
"""

def pmi_collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus-level collocation mining by pointwise mutual information:
    PMI(a,b) = ln( P(ab) / (P(a)·P(b)) ) over whitespace bigrams — the
    classic "new york"/"et al" detector every tokenizer-vocabulary and
    phrase-merge pipeline runs before training. All probabilities are
    ratios of EXACT integer counts; the single ``ln`` is applied to one
    double ratio and rounded to 6 places (the tfidf_top_terms precedent
    for absorbing last-bit libm differences across engines).

    Plan: two corpus passes (unigram and bigram explode→count, both
    map-side combined), then the min_count-filtered pair table — tiny
    relative to the corpus, frequency filters are Zipf guillotines — joins
    the unigram counts twice and broadcast-crosses the two 1-row totals.
    At 100 TB nothing here funnels: counts shuffle by token value, and the
    expensive joins happen only above the frequency floor.

    Returns (bigram, n_pair, n_left, n_right, pmi), one row per bigram
    with n_pair >= min_count.
    """
    from checkatron_spark.session import scratch_persist

    # NULL/whitespace-only docs are dropped BEFORE tokenizing (ADVICE r8):
    # splitting an empty/whitespace-only string yields phantom ''
    # unigrams that inflate n_uni and thus every PMI value. The predicate
    # is "contains a non-whitespace char" (rlike \S) rather than trim():
    # trim strips only 0x20 spaces, so a tab/newline-only doc would slip
    # through and inject TWO phantom tokens (review r9). The oracle
    # applies the identical regex, so parity never depended on the bug;
    # the statistic did.
    t = F.coalesce(F.col(text_col), F.lit(""))
    # regex trim, not trim(): leading '\t'/'\n' would survive trim (space-
    # only semantics in BOTH engines) and split into a phantom '' token.
    # EXPLICIT whitespace class, not \s (ADVICE r9): Java's \s includes
    # \x0B (vertical tab), RE2's does not — a \x0B-padded doc would
    # tokenize differently across engines. [ \t\n\r\f] means the same
    # thing in both; PMI_COLLOCATIONS_SQL uses the identical class.
    stripped = F.regexp_replace(t, f"^{WS_CLASS}+|{WS_CLASS}+$", "")
    words = F.split(stripped, f"{WS_CLASS}+")
    w = docs.filter(t.rlike(NON_WS_CLASS)).select(words.alias("_w"))
    uni = scratch_persist(
        w.select(F.explode("_w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tok"))
    )
    pairs = scratch_persist(
        w.select(F.explode(_word_ngrams("_w", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    # totals are computed over the UNfiltered tables: PMI's denominators
    # are corpus probabilities, not surviving-pair probabilities
    n_uni = uni.agg(F.sum("n_tok").cast("bigint").alias("_n_uni"))
    n_bi = pairs.agg(F.sum("n_pair").cast("bigint").alias("_n_bi"))

    parts = F.split(F.col("bigram"), " ")
    u1 = uni.select(
        F.col("tok").alias("_t1"), F.col("n_tok").alias("n_left")
    )
    u2 = uni.select(
        F.col("tok").alias("_t2"), F.col("n_tok").alias("n_right")
    )
    joined = (
        pairs.filter(F.col("n_pair") >= min_count)
        .withColumn("_t1", parts.getItem(0))
        .withColumn("_t2", parts.getItem(1))
        .join(u1, "_t1")
        .join(u2, "_t2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n_pair") * d("_n_uni") * d("_n_uni")
    den = d("n_left") * d("n_right") * d("_n_bi")
    return joined.select(
        "bigram",
        "n_pair",
        "n_left",
        "n_right",
        F.round(F.log(num / den), 6).alias("pmi"),
    )


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_collocations(load_table(spark, "documents", sf_dir))


PMI_COLLOCATIONS_SQL = r"""
WITH w AS (
    SELECT string_split_regex(
        regexp_replace(coalesce(text, ''),
                       '^[ \t\n\r\f]+|[ \t\n\r\f]+$', '', 'g'),
        '[ \t\n\r\f]+') AS w
    FROM documents
    WHERE regexp_matches(coalesce(text, ''), '[^ \t\n\r\f]')
),
uni AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok
    FROM (SELECT unnest(w) AS tok FROM w) GROUP BY tok
),
pairs AS (
    SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_pair
    FROM (
        SELECT unnest(
            CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                 ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
            END) AS bg
        FROM w
    ) GROUP BY bg
),
nuni AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS n_uni FROM uni),
nbi AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n_bi FROM pairs)
SELECT p.bg AS bigram, p.n_pair,
       u1.n_tok AS n_left, u2.n_tok AS n_right,
       round(ln((CAST(p.n_pair AS DOUBLE) * CAST(n_uni AS DOUBLE)
                 * CAST(n_uni AS DOUBLE))
                / (CAST(u1.n_tok AS DOUBLE) * CAST(u2.n_tok AS DOUBLE)
                   * CAST(n_bi AS DOUBLE))), 6) AS pmi
FROM pairs p
JOIN uni u1 ON u1.tok = string_split(p.bg, ' ')[1]
JOIN uni u2 ON u2.tok = string_split(p.bg, ' ')[2]
CROSS JOIN nuni CROSS JOIN nbi
WHERE p.n_pair >= 5
"""



def _score_by_source(docs: DataFrame) -> DataFrame:
    from checkatron_spark.functions.text import quality_score

    # NULL text is explicitly un-scoreable (q NULL): quality_score alone
    # would give it 0.75 — least()/greatest() SKIP NULLs on both engines,
    # so every NULL-driven component collapses to its cap — and a quality
    # GATE must not pass documents it cannot read. The oracle CTE carries
    # the identical CASE.
    return docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("text").isNotNull(), quality_score(F.col("text"))
        ).alias("_q"),
    )


def quality_floor_by_source(
    docs: DataFrame, *, frac: float = 0.1, accuracy: int = 1_000_000
) -> DataFrame:
    """Per-source ADAPTIVE quality floor — the curation policy "drop each
    source's own worst ``frac``" instead of one global threshold (a global
    cut silently empties low-register sources and leaves high-register
    sources unpruned; per-source floors keep the mixture while shedding
    each source's tail).

    The floor is the per-source ``frac``-quantile of the deterministic
    ``quality_score``; a document is kept when quality is STRICTLY above
    its source's floor (ties at the floor drop, so a mass-tie can never
    keep more than 1-frac). Spark's ``percentile_approx`` at accuracy 1e6
    returns the exact discrete quantile below ~1e6 docs/source — the
    fixtures' regime, graded bit-exact against DuckDB's ``quantile_disc``
    (the approx_distincts precedent); beyond that it degrades to an
    honest rank-error estimate, which is the 100 TB path anyway.

    100 TB plan: one corpus scan into a map-side-combined quantile sketch
    per source (|sources| rows), broadcast back over a second scan —
    no corpus-sized shuffle at any point. NULL-text docs are explicitly
    scored NULL (see _score_by_source): excluded from the quantile AND
    dropped by the strict comparison on BOTH engines.

    Returns the audit: (source, n_docs, n_scored, quality_floor, n_kept).
    """
    from checkatron_spark.session import scratch_persist

    scored = scratch_persist(_score_by_source(docs))
    thr = scored.groupBy("source").agg(
        F.percentile_approx("_q", frac, accuracy).alias("quality_floor"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count("_q").cast("bigint").alias("n_scored"),
    )
    kept = (
        scored.join(
            F.broadcast(thr.select("source", "quality_floor")), "source"
        )
        .filter(F.col("_q") > F.col("quality_floor"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return thr.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "n_scored",
        "quality_floor",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
    )


def quality_floor_kept(
    docs: DataFrame, *, frac: float = 0.1, accuracy: int = 1_000_000
) -> DataFrame:
    """The kept-document view of :func:`quality_floor_by_source`: every
    (doc_id, source, quality) strictly above its source's adaptive floor —
    what the next pipeline stage consumes. Same one-scan-plus-broadcast
    plan; quality is emitted raw (the score arithmetic is bit-portable,
    the text_stats precedent)."""
    scored = _score_by_source(docs)
    thr = scored.groupBy("source").agg(
        F.percentile_approx("_q", frac, accuracy).alias("_floor")
    )
    return (
        scored.join(F.broadcast(thr), "source")
        .filter(F.col("_q") > F.col("_floor"))
        .select("doc_id", "source", F.col("_q").alias("quality"))
    )


def q_quality_floor_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return quality_floor_by_source(load_table(spark, "documents", sf_dir))


def q_quality_floor_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_floor_kept(load_table(spark, "documents", sf_dir))


def _quality_scored_sql() -> str:
    """The ``scored`` CTE: quality_score's DuckDB twin (textually the same
    sub-expressions as TEXT_STATS_SQL's, which is graded bit-exact) keyed
    by (doc_id, source)."""
    from checkatron_spark.pipelines import _STOPS, _TOKS

    stop_ratio = (
        f"CASE WHEN len({_TOKS}) = 0 THEN 0.0 "
        f"ELSE CAST(len(list_filter({_TOKS}, t -> t IN ({_STOPS}))) "
        f"AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE) END"
    )
    punct_ratio = (
        "CASE WHEN length(text) = 0 THEN 0.0 "
        "ELSE CAST(len(regexp_extract_all(text, "
        "'[^\\w \\t\\n\\r\\f]')) AS DOUBLE) "
        "/ CAST(length(text) AS DOUBLE) END"
    )
    return f"""scored AS (
    SELECT doc_id, source,
        CASE WHEN text IS NOT NULL THEN
        greatest(least(
            least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5
            + least(({stop_ratio}) * 4.0, 1.0) * 0.5
            - least(({punct_ratio}) * 2.0, 1.0) * 0.25,
        1.0), 0.0) END AS q
    FROM documents
)"""


def quality_floor_audit_sql(frac: float = 0.1) -> str:
    return f"""
WITH {_quality_scored_sql()},
thr AS (
    SELECT source, quantile_disc(q, {frac}) AS quality_floor,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(q) AS BIGINT) AS n_scored
    FROM scored GROUP BY source
)
SELECT t.source, t.n_docs, t.n_scored, t.quality_floor,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM thr t LEFT JOIN (
    SELECT s.source, COUNT(*) AS n_kept
    FROM scored s JOIN thr ON s.source = thr.source
    WHERE s.q > thr.quality_floor GROUP BY s.source
) k ON t.source = k.source
"""


def quality_floor_kept_sql(frac: float = 0.1) -> str:
    return f"""
WITH {_quality_scored_sql()},
thr AS (
    SELECT source, quantile_disc(q, {frac}) AS quality_floor
    FROM scored GROUP BY source
)
SELECT s.doc_id, s.source, s.q AS quality
FROM scored s JOIN thr ON s.source = thr.source
WHERE s.q > thr.quality_floor
"""

def novelty_profile(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """First-seer n-gram novelty: for every document, the fraction of its
    distinct word n-grams that FIRST appear in this document (first seer =
    lowest doc_id over the whole corpus). The corpus-order novelty curve
    is the aggregate view behind "how much new text does each crawl
    increment add" — low-novelty docs are templated/derivative and are
    the first candidates for down-weighting in a mixture.

    Returns (doc_id, n_grams, n_novel, novelty_pct, is_derivative) for
    every doc: novelty_pct is ONE IEEE division of two exact integers
    rounded to 4 places; is_derivative flags docs under 20% novelty.

    Plan: the dup_ngram_profile shape — one shuffle on the gram key for
    the min-doc_id first-seer table (map-side combined min), join back on
    the gram, one shuffle on doc_id to re-aggregate. Both shuffles are on
    high-cardinality keys; nothing collects, no all-pairs work. Grams use
    operators/dedup.py shingles() (the round-10 whitespace contract)."""
    from checkatron_spark.operators.dedup import shingles
    from checkatron_spark.session import scratch_persist

    doc_sh = scratch_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles(F.col(text_col), n)).alias("s"),
        )
    )
    first = doc_sh.groupBy("s").agg(F.min("doc_id").alias("_first"))
    per_doc = (
        doc_sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("doc_id") == F.col("_first"), 1).otherwise(0)
            ).cast("bigint").alias("n_novel"),
        )
    )
    pct = F.expr(
        "round(100.0 * CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 4)"
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_novel",
        pct.alias("novelty_pct"),
        (pct < F.lit(20.0)).alias("is_derivative"),
    )


def q_novelty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return novelty_profile(load_table(spark, "documents", sf_dir))


def novelty_profile_sql(*, n: int = 3) -> str:
    """DuckDB twin: the shingles() sh CTE (DECONTAMINATE_SQL precedent —
    distinct grams, whole-doc fallback under n words)."""
    pct = (
        "round(100.0 * CAST(n_novel AS DOUBLE)"
        " / CAST(n_grams AS DOUBLE), 4)"
    )
    return rf"""
WITH w AS (
    SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '[ \t\n\r\f]+') AS w FROM documents
),
sh AS (
    SELECT doc_id,
        CASE WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
             ELSE list_distinct(list_transform(range(1, len(w) - {n} + 2),
                  i -> array_to_string(w[i:i+{n - 1}], ' ')))
        END AS sh
    FROM w
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
first_seer AS (SELECT s, MIN(doc_id) AS f FROM ex GROUP BY s),
per_doc AS (
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN e.doc_id = fs.f THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
    FROM ex e JOIN first_seer fs USING (s)
    GROUP BY e.doc_id
)
SELECT doc_id, n_grams, n_novel, {pct} AS novelty_pct,
       ({pct} < 20.0) AS is_derivative
FROM per_doc
"""


def ccnet_ppl_buckets(
    target: DataFrame,
    reference: DataFrame,
    lang_by_id: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    accuracy: int = 1_000_000,
) -> DataFrame:
    """CCNet's head/middle/tail split, per language: score every target
    document with the exact-arithmetic LM-coverage signal
    (:func:`lm_bigram_coverage` — the integer perplexity proxy), then cut
    each LANGUAGE at its own score terciles. Per-language cuts are the
    point of CCNet's design: a global cut would call every low-resource
    language "tail" because its reference coverage is thinner.

    head = mean_band STRICTLY above the language's upper tercile, tail =
    at-or-below the lower tercile, middle = the rest; ties fall DOWN a
    bucket on both engines (strict >). The terciles are
    ``percentile_approx`` at accuracy 1e6 — exact below ~1e6 docs/lang,
    honest rank-error estimates beyond (the quality_floor contract).

    Returns (doc_id, lang, mean_band, bucket) for every target doc.

    100 TB plan: the score is the lm_bigram_coverage join (work ∝ corpus
    tokens); the tercile table is one map-side-combined sketch pass
    (|langs| rows) broadcast back; the lang attachment is a hash join on
    doc_id. No added corpus-sized shuffle beyond the score itself."""
    from checkatron_spark.session import scratch_persist

    # LEFT join: the docstring promises output for every target doc, and
    # a NULL lang already forms a real tercile group downstream (eqNullSafe
    # + the oracle's IS NOT DISTINCT FROM) — an inner join would silently
    # drop any doc missing from lang_by_id (ADVICE r10; the declared query
    # passes a total mapping, so its output is unchanged)
    scored = scratch_persist(
        lm_bigram_coverage(
            target, reference, text_col=text_col, id_col=id_col
        )
        .select(id_col, "mean_band")
        .join(lang_by_id, id_col, "left")
    )
    thr = scored.groupBy("lang").agg(
        F.percentile_approx(
            "mean_band", [1.0 / 3.0, 2.0 / 3.0], accuracy
        ).alias("_t")
    ).withColumnRenamed("lang", "_tl")
    # eqNullSafe: a NULL lang is a real tercile group on both engines
    # (the oracle joins IS NOT DISTINCT FROM; sampling.py:383 precedent) —
    # a null-unsafe join would silently drop every unlabeled document
    # from the Spark side only (round-10 review finding)
    return (
        scored.join(
            F.broadcast(thr), F.col("lang").eqNullSafe(F.col("_tl"))
        )
        .select(
            F.col(id_col),
            "lang",
            "mean_band",
            F.when(F.col("mean_band") > F.col("_t")[1], F.lit("head"))
            .when(F.col("mean_band") > F.col("_t")[0], F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def q_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same 10% 'lm-ref-v1' reference draw as lm_bigram_coverage; the
    other 90% is bucketed head/middle/tail per language."""
    from checkatron_spark.sampling import hash_uniform

    docs = load_table(spark, "documents", sf_dir)
    u = hash_uniform(F.col("doc_id"), "lm-ref-v1")
    return ccnet_ppl_buckets(
        docs.filter(u >= 0.1),
        docs.filter(u < 0.1),
        docs.select("doc_id", "lang"),
    )


def ccnet_ppl_buckets_sql() -> str:
    return f"""
WITH base AS (SELECT doc_id, mean_band FROM ({LM_BIGRAM_SQL}) s),
scored AS (
    -- LEFT mirrors the engine's keep-missing-docs join (ADVICE r11): a doc
    -- absent from the lang map stays scored with a NULL lang and the
    -- NULL-lang tercile group below, exactly like ccnet_ppl_buckets
    SELECT b.doc_id, b.mean_band, d.lang
    FROM base b LEFT JOIN documents d USING (doc_id)
),
thr AS (
    SELECT lang, quantile_disc(mean_band, 1.0/3.0) AS t1,
           quantile_disc(mean_band, 2.0/3.0) AS t2
    FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.mean_band,
       CASE WHEN s.mean_band > thr.t2 THEN 'head'
            WHEN s.mean_band > thr.t1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN thr ON s.lang IS NOT DISTINCT FROM thr.lang
"""


QUERIES = {
    "dup_ngram_profile": q_dup_ngram_profile,
    "chunk_documents": q_chunk_documents,
    "repetition_profile": q_repetition_profile,
    "corpus_card": q_corpus_card,
    "corpus_snapshot_diff": corpus_snapshot_diff,
    "vocab_coverage": q_vocab_coverage,
    "corpus_snapshot_drift": corpus_snapshot_drift,
    "strip_boilerplate": q_strip_boilerplate,
    "strip_repeated_sentences": q_strip_repeated_sentences,
    "gopher_quality_profile": q_gopher_quality,
    "dedup_spans_keep_first": q_dedup_spans_keep_first,
    "token_heavy_hitters_cms": q_token_heavy_hitters,
    "lm_bigram_coverage": q_lm_bigram_coverage,
    "pmi_collocations": q_pmi_collocations,
    "quality_floor_by_source": q_quality_floor_by_source,
    "quality_floor_kept": q_quality_floor_kept,
    "novelty_profile": q_novelty_profile,
    "ccnet_ppl_buckets": q_ccnet_ppl_buckets,
}


def oracles() -> dict[str, str]:
    return {
        "dup_ngram_profile": DUP_NGRAM_SQL,
        "chunk_documents": CHUNK_SQL,
        "repetition_profile": REPETITION_SQL,
        "corpus_card": CORPUS_CARD_SQL,
        "corpus_snapshot_diff": corpus_snapshot_diff_oracle_sql(),
        "vocab_coverage": VOCAB_COVERAGE_SQL,
        "corpus_snapshot_drift": corpus_snapshot_drift_oracle_sql(),
        "strip_boilerplate": STRIP_BOILERPLATE_SQL,
        "strip_repeated_sentences": STRIP_REPEATED_SQL,
        "gopher_quality_profile": GOPHER_QUALITY_SQL,
        "dedup_spans_keep_first": DEDUP_SPANS_SQL,
        "token_heavy_hitters_cms": TOKEN_CMS_SQL,
        "lm_bigram_coverage": LM_BIGRAM_SQL,
        "pmi_collocations": PMI_COLLOCATIONS_SQL,
        "quality_floor_by_source": quality_floor_audit_sql(),
        "quality_floor_kept": quality_floor_kept_sql(),
        "novelty_profile": novelty_profile_sql(),
        "ccnet_ppl_buckets": ccnet_ppl_buckets_sql(),
    }
