"""checkatron_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of simbo1905/checkatron, rebuilt Spark-first.

The reference (/root/reference) is a template-driven SQL diff *generator*
(checkatron/diffgen.py, templates/full_compare.sql.j2); execution happens in an
external warehouse. This engine implements the diff semantics natively as
DataFrame transformations optimized by Catalyst, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the reference mandate requires at 100 TB scale.

Public API
----------
diff(before, after, keys, ...)      -> DataFrame   core table-diff operator
diff_summary(diff_df)               -> DataFrame   row-level match/miss counts
decode_status(diff_df, column)      -> DataFrame   status int -> label
DiffSpec                                           declarative spec object
get_spark()                                        tuned local SparkSession
"""

from checkatron_spark.cli import build_sql, parse_args
from checkatron_spark.operators.asof import asof_join
from checkatron_spark.operators.dedup import (
    connected_components,
    decontaminate,
    dedup_canonical,
    dedup_corpus,
    dedup_incremental,
    fuzzy_pairs_blocked,
    neardup_incremental,
    substring_dup_pairs,
)
from checkatron_spark.operators.diff import DiffSpec, diff, diff_from_spec
from checkatron_spark.operators.incremental import (
    bucket_checksums,
    diff_incremental,
    row_checksum,
)
from checkatron_spark.operators.drift import drift_profile
from checkatron_spark.operators.mapdiff import map_diff
from checkatron_spark.operators.merge3 import diff3
from checkatron_spark.operators.patch import (
    apply_delta,
    compact_delta,
    compact_log,
    compose_deltas,
)
from checkatron_spark.functions.layout import spread16, zorder_key2
from checkatron_spark.operators.ivm import (
    maintain_minmax_view,
    maintain_sum_view,
    minmax_view,
    sum_view,
)
from checkatron_spark.operators.scd import pit_join, scd2_delta
from checkatron_spark.sampling import (
    deterministic_sample,
    interleave_sources,
    pack_sequences,
    split_assign,
    stratified_sample,
    temperature_sample,
    topk_per_group,
    weighted_sample,
)
from checkatron_spark.corpus import (
    chunk_documents,
    cms_sketch,
    corpus_card,
    dedup_spans_keep_first,
    dup_ngram_profile,
    gopher_quality_profile,
    repetition_profile,
    strip_boilerplate,
    token_heavy_hitters_cms,
    vocab_coverage,
)
from checkatron_spark.expectations import expectations_report
from checkatron_spark.operators.dedup import (
    bloom_mask_words,
    decontaminate_bloom,
)
from checkatron_spark.operators.kmeans import kmeans_assign
from checkatron_spark.plans.sqlmacro import expand_diff_macros, sql
from checkatron_spark.sampling import mix_budget_plan, shard_manifest
from checkatron_spark.functions.text import canonical_url, pii_count, pii_scrub
from checkatron_spark.operators.rangejoin import (
    interval_overlap_join,
    range_join_binned,
)
from checkatron_spark.operators.skew import salted_agg, salted_join
from checkatron_spark.operators.guard import (
    DuplicateKeyError,
    assert_unique_keys,
    duplicate_keys,
)
from checkatron_spark.operators.summary import (
    decode_status,
    diff_drilldown,
    diff_summary,
    labeled_counts,
)
from checkatron_spark.session import (
    get_spark,
    release_scratch,
    scratch_cache,
    scratch_persist,
)
from checkatron_spark.sources.tables import load_csv_table, load_json_table

__all__ = [
    "apply_delta",
    "compact_log",
    "map_diff",
    "pit_join",
    "spread16",
    "zorder_key2",
    "maintain_minmax_view",
    "maintain_sum_view",
    "minmax_view",
    "sum_view",
    "compact_delta",
    "compose_deltas",
    "salted_join",
    "DiffSpec",
    "DuplicateKeyError",
    "asof_join",
    "assert_unique_keys",
    "bucket_checksums",
    "build_sql",
    "expand_diff_macros",
    "sql",
    "connected_components",
    "decode_status",
    "release_scratch",
    "scratch_cache",
    "scratch_persist",
    "decontaminate",
    "dedup_canonical",
    "dedup_corpus",
    "substring_dup_pairs",
    "dedup_incremental",
    "neardup_incremental",
    "deterministic_sample",
    "interleave_sources",
    "topk_per_group",
    "chunk_documents",
    "corpus_card",
    "dup_ngram_profile",
    "gopher_quality_profile",
    "strip_boilerplate",
    "repetition_profile",
    "vocab_coverage",
    "canonical_url",
    "pii_count",
    "pii_scrub",
    "diff",
    "diff3",
    "diff_drilldown",
    "diff_from_spec",
    "diff_incremental",
    "diff_summary",
    "drift_profile",
    "duplicate_keys",
    "fuzzy_pairs_blocked",
    "get_spark",
    "pack_sequences",
    "split_assign",
    "labeled_counts",
    "load_csv_table",
    "load_json_table",
    "parse_args",
    "interval_overlap_join",
    "range_join_binned",
    "row_checksum",
    "salted_agg",
    "scd2_delta",
    "stratified_sample",
    "temperature_sample",
    "weighted_sample",
    # round-5 surface
    "bloom_mask_words",
    "cms_sketch",
    "decontaminate_bloom",
    "dedup_spans_keep_first",
    "expectations_report",
    "kmeans_assign",
    "mix_budget_plan",
    "shard_manifest",
    "token_heavy_hitters_cms",
]

__version__ = "0.1.0"
