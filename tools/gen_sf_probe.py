"""Deterministic sf1-scale probe data: tile the driver's sf0.1 fixtures
N times (default 10x) with shifted keys and salted text into a scratch
dir.

The driver's generator lives driver-side (TESTDATA.md: seed=42,
read-only dirs) — this does NOT regenerate it. For a TIMING probe the
requirement is same schema + same distribution family at 10x the rows,
which key-shifted tiling gives exactly: every copy preserves the sf0.1
marginal distributions, and

- documents get a per-copy salt token appended so copies are not
  byte-identical (10x trivial duplicates would turn every near-dup
  probe into a degenerate clone workload);
- embeddings get dim-0 perturbed by copy*1e-3 for the same reason;
- orders shift o_orderkey by copy*stride so churn-slice workloads
  (orders_before / delta_compact_orders take mod-k key slices) keep
  their churn fraction.

Deterministic: pure column arithmetic on the (deterministic, seed=42)
sf0.1 fixtures — no RNG here at all, so the probe dataset is
reproducible bit-for-bit. Correctness stays graded at sf0.01/sf0.1;
this data exists only for SWEEP_r06_sf1-style timing probes.

Usage: python tools/gen_sf_probe.py [target_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from checkatron_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("gen-sf-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def tiled(name: str, key: str, salt=None, stride=None):
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        if stride is None:
            stride = base.agg(F.max(key)).first()[0] + 1
        parts = []
        for i in range(copies):
            p = base.withColumn(key, F.col(key) + F.lit(i * stride))
            if salt is not None:
                p = salt(p, i)
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{target}/{name}.parquet")
        print(f"[gen] {name}: {copies}x, stride {stride}", file=sys.stderr)
        return stride

    tiled(
        "documents",
        "doc_id",
        salt=lambda df, i: df.withColumn(
            "text",
            F.when(
                F.col("text").isNotNull(),
                F.concat(F.col("text"), F.lit(f" probesalt{i}")),
            ).otherwise(F.col("text")),
        ),
    )
    tiled(
        "embeddings",
        "vec_id",
        salt=lambda df, i: df.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (v, j) -> CAST(CASE WHEN j = 0 "
                f"THEN v + {i}* CAST(0.001 AS FLOAT) ELSE v END AS FLOAT))"
            ),
        ),
    )
    o_stride = tiled("orders", "o_orderkey")
    # second probe batch (diff/TPC-H/events operators): tile the facts,
    # copy the dims verbatim — fact keys shift, dim references stay, so
    # joins still resolve (each dim row simply serves 10x the fact rows,
    # which is exactly what a bigger corpus does to its dimensions).
    # lineitem MUST shift by the ORDERS stride so copy i's lineitems join
    # copy i's orders (max(l_orderkey) can undershoot max(o_orderkey))
    tiled("lineitem", "l_orderkey", stride=o_stride)
    tiled("events", "event_id")
    for dim in ("customer", "supplier", "part", "nation", "region"):
        src_file = f"{SRC}/{dim}.parquet"
        dst = f"{target}/{dim}.parquet"
        spark.read.parquet(src_file).write.mode("overwrite").parquet(dst)
        print(f"[gen] {dim}: copied", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
