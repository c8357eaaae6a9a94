"""Self-check: emulate the driver's correctness gate locally.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()`` in
DuckDB over the same parquet tables, then compares row count, column-name set,
and values (columns sorted by name, rows sorted by all columns, floats
rounded).  Usage::

    python tools/selfcheck.py [--sf /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from checkatron_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sorted(qs)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    con = duckdb.connect(":memory:")
    for t in TABLES:
        p = Path(args.sf) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
            ok = False
            print(f"FAIL  {name}: columns spark={sorted(s_cols)} "
                  f"duck={sorted(d_cols)}")
        elif len(s_rows) != len(d_rows):
            ok = False
            print(f"FAIL  {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
        else:
            sn = _normalize(s_rows, [c.lower() for c in s_cols])
            dn = _normalize(d_rows, [c.lower() for c in d_cols])
            if sn != dn:
                ok = False
                bad = next(
                    (i for i, (a, b) in enumerate(zip(sn, dn)) if a != b), -1
                )
                print(f"FAIL  {name}: value mismatch at sorted row {bad}:")
                print(f"      spark: {sn[bad] if bad >= 0 else '?'}")
                print(f"      duck : {dn[bad] if bad >= 0 else '?'}")
        if ok:
            print(f"OK    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failing:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
