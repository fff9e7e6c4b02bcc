"""Driver-style cross-check: run each queries() entry in Spark and its
oracle_sql() in DuckDB on the same sf dir; compare row count, column names,
and order-insensitive values.  Used by tests and as a CLI iteration tool:

    python tests/oracle_compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_run(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_value(r[i]) for i in order) for r in rows)


def compare(name: str, spark, sf_dir: str, qfn, sql: str):
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    dcols, drows = duck_run(sql, sf_dir)
    issues = []
    if sorted(scols) != sorted(dcols):
        issues.append(f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        issues.append(f"row count differs: spark={len(srows)} duck={len(drows)}")
    if not issues:
        a = norm_rows(scols, srows)
        b = norm_rows(dcols, drows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            only_a = [r for r in a if r not in set(b)][:3]
            issues.append(f"values differ; first zip-diffs={diff} spark-only={only_a}")
    return issues, len(srows)


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wanted = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, qfn in qs.items():
        if wanted and name not in wanted:
            continue
        sql = oracles.get(name)
        if sql is None:
            try:
                n = qfn(spark, sf_dir).count()
                print(f"ROWS-ONLY {name}: {n} rows")
            except Exception as e:  # noqa: BLE001
                failures += 1
                print(f"FAIL {name}: rows-only query raised {type(e).__name__}: {e}")
            continue
        try:
            issues, n = compare(name, spark, sf_dir, qfn, sql)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: raised {type(e).__name__}: {str(e)[:300]}")
            continue
        if issues:
            failures += 1
            print(f"FAIL {name} ({n} rows):")
            for i in issues:
                print(f"   {i[:400]}")
        else:
            print(f"OK   {name}: {n} rows match")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
