"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names, and an order-insensitive
value multiset (columns sorted by name, doubles rounded at source).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for row in rows:
        key = "\x1f".join(norm_cell(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from sitemapper_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                df = fn(spark, sf_dir)
                n = df.count()
                print(f"  {name:28s} rows-only: {n} rows")
            except Exception as e:
                print(f"✗ {name:28s} ROWS-ONLY FAILED: {e}")
                failures.append(name)
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"✗ {name:28s} ERROR: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        sm, dm = df_multiset(scols, srows), df_multiset(dcols, drows)
        if sm != dm:
            extra_s = [k for k in sm if sm[k] != dm.get(k, 0)][:3]
            extra_d = [k for k in dm if dm[k] != sm.get(k, 0)][:3]
            problems.append(f"values spark-only={extra_s} duck-only={extra_d}")
        if problems:
            print(f"✗ {name:28s} {' | '.join(problems)[:500]}")
            failures.append(name)
        else:
            print(f"✓ {name:28s} {len(srows)} rows")
    print()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
