"""Round-8 optimization measurement harness (bench.py is FROZEN — guide §1).

Subcommands:
  plans <outdir> [names...]   — write .explain("formatted") per query
  time  [names...]            — per-query seconds, bench.py methodology
                                (count(), median-of-3 sub-second, min-of-2
                                with reset_memos for >= 1 s) at
                                $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]
  noop  [names...]            — same but with the noop sink (computes every
                                column; isolates compute from count pruning)

The Spark session mirrors bench.make_spark exactly so numbers are
comparable with the driver's run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark():
    import bench

    return bench.make_spark(CPUS)


def _run(df, sink: str):
    if sink == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.count()


def time_queries(names, sink: str = "count") -> dict[str, float]:
    import __spark_entry__ as em

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fns = em.queries()
    wanted = {n: f for n, f in fns.items() if not names or n in names}
    out = {}
    for name, fn in wanted.items():
        spark.sparkContext.setJobDescription(f"q:{name}")
        t0 = time.monotonic()
        _run(fn(spark, SF_DIR), sink)
        t1 = time.monotonic() - t0
        if t1 < 1.0:
            reps = [t1]
            for _ in range(2):
                t0 = time.monotonic()
                _run(fn(spark, SF_DIR), sink)
                reps.append(time.monotonic() - t0)
            out[name] = round(statistics.median(reps), 3)
        else:
            out[name] = round(t1, 3)
        spark.sparkContext.setJobDescription(None)
    slow = [n for n, s in out.items() if s >= 1.0]
    if slow and hasattr(em, "reset_memos"):
        em.reset_memos()
        for name in slow:
            spark.sparkContext.setJobDescription(f"q:{name}:rep2")
            t0 = time.monotonic()
            _run(wanted[name](spark, SF_DIR), sink)
            out[name] = round(min(out[name], time.monotonic() - t0), 3)
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    return out


def dump_plans(outdir: str, names) -> None:
    """With SPARK_GRAFT_PLAN_LAZY=1, localCheckpoint is no-op'd during query
    construction so the captured plan shows the REAL pipeline of operators
    that normally materialize eagerly and return a checkpoint scan
    (minhash/jaccard/simhash) — measurement tooling only; bench.py and the
    operators themselves are untouched."""
    import __spark_entry__ as em

    if os.environ.get("SPARK_GRAFT_PLAN_LAZY") == "1":
        try:
            from pyspark.sql.classic.dataframe import DataFrame
        except ImportError:  # older layouts
            from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self

    os.makedirs(outdir, exist_ok=True)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in em.queries().items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        dump_plans(sys.argv[2], sys.argv[3:])
    elif cmd == "noop":
        print(json.dumps(time_queries(sys.argv[2:], sink="noop")))
    else:
        print(json.dumps(time_queries(sys.argv[2:])))
