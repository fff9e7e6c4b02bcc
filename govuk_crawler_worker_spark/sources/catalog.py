"""Snapshot-table catalog: atomic multi-table commits over parquet.

Role in the architecture: the reference relies on RabbitMQ acks + Redis for
durable state transitions (ack/reject = ``workflow.go:40-44,116-121``,
``queue_connection.go:117-131``); we replace that with **one atomic commit per
micro-batch** spanning every state table (frontier, seen, fetched, dead,
metrics, checkpoint) — the batch analogue of exactly-once queue semantics.

This module is an Iceberg-shaped stand-in: the sandbox has no Iceberg
runtime jar, so we implement the same contract — immutable parquet snapshots
+ an atomically-published commit manifest — directly.  On a real cluster the
``Catalog`` API maps 1:1 onto an Iceberg catalog (`MERGE INTO`/
`overwritePartitions` inside one transaction); only this file changes.

Scale notes (100 TB / 10^10-URL frontier):
* copy-on-write snapshots here rewrite a whole table; Iceberg restricts the
  rewrite to touched partitions — the engine therefore always writes the
  frontier partitioned by ``priority_bucket`` so a real catalog commits only
  drained partitions.
* the commit manifest is O(#tables) JSON — no scaling concern.
* readers are never blocked: a commit is a single ``os.rename`` of the
  manifest; concurrent readers see the previous snapshot (snapshot isolation,
  same guarantee Iceberg gives).
* time travel / resume: every manifest is retained; ``latest()`` resumes from
  the last published batch (checkpoint state lives in the manifest meta),
  which is what makes kill/resume re-fetch-free.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)
        os.makedirs(os.path.join(root, "tables"), exist_ok=True)

    # -- manifest plumbing ---------------------------------------------------

    def _commit_path(self, n: int) -> str:
        return os.path.join(self.root, "_commits", f"{n:08d}.json")

    def latest_commit_id(self) -> int:
        files = [
            f
            for f in os.listdir(os.path.join(self.root, "_commits"))
            if f.endswith(".json")
        ]
        return max((int(f[:-5]) for f in files), default=-1)

    def latest(self) -> dict[str, Any]:
        n = self.latest_commit_id()
        if n < 0:
            return {"commit_id": -1, "tables": {}, "meta": {}}
        with open(self._commit_path(n)) as fh:
            return json.load(fh)

    # -- reads ----------------------------------------------------------------

    def read(self, name: str, schema=None) -> DataFrame:
        """Latest snapshot of ``name``; empty DataFrame with ``schema`` if the
        table has never been committed (create-if-absent semantics, the
        analogue of queue/exchange declaration, queue_manager.go:64-78).

        The manifest carries each table's schema (like Iceberg metadata), so
        snapshots written from empty DataFrames — which produce no parquet
        part files — read back correctly."""
        manifest = self.latest()
        segs = manifest["tables"].get(name)
        if not segs:
            if schema is None:
                raise KeyError(f"table {name!r} absent and no schema given")
            return self.spark.createDataFrame([], schema)
        from pyspark.sql.types import StructType

        stored = manifest.get("schemas", {}).get(name)
        reader = self.spark.read
        if stored is not None:
            reader = reader.schema(StructType.fromJson(json.loads(stored)))
        return reader.parquet(*(os.path.join(self.root, s) for s in segs))

    def exists(self, name: str) -> bool:
        return bool(self.latest()["tables"].get(name))

    # -- atomic multi-table commit --------------------------------------------

    def commit(
        self,
        replaces: dict[str, DataFrame] | None = None,
        appends: dict[str, DataFrame] | None = None,
        meta: dict[str, Any] | None = None,
        partition_by: dict[str, list[str]] | None = None,
    ) -> int:
        """Write new snapshot segments then publish them plus carried-forward
        pointers for untouched tables in ONE rename — all-or-nothing.

        ``replaces`` rewrites a table (copy-on-write — frontier, seen);
        ``appends`` adds a segment to grow-only tables (fetched, dead,
        metrics) so per-batch I/O stays proportional to the delta, exactly
        like an Iceberg append snapshot.

        A crash before the rename leaves orphan snapshot files (harmless,
        same as uncommitted Iceberg data files) and the previous commit
        intact: resume never sees a torn batch.
        """
        prev = self.latest()
        n = prev["commit_id"] + 1
        tables: dict[str, list[str]] = {k: list(v) for k, v in prev["tables"].items()}
        schemas: dict[str, str] = dict(prev.get("schemas", {}))
        partition_by = partition_by or {}

        def write(name: str, df: DataFrame) -> str:
            rel = os.path.join("tables", name, f"snap-{n:08d}")
            writer = df.write.mode("overwrite")
            if name in partition_by:
                writer = writer.partitionBy(*partition_by[name])
            writer.parquet(os.path.join(self.root, rel))
            return rel

        # The snapshot writes are independent Spark jobs — submit them
        # concurrently so per-commit latency is max(write) not sum(write)
        # (matters in the small-wave BFS regime where commit latency is the
        # throughput floor).  Atomicity is unaffected: nothing is visible
        # until the manifest rename below.
        from concurrent.futures import ThreadPoolExecutor

        work = [("replace", k, df) for k, df in (replaces or {}).items()] + [
            ("append", k, df) for k, df in (appends or {}).items()
        ]
        for _mode, name, df in work:
            schemas[name] = json.dumps(df.schema.jsonValue())
        if len(work) > 1:
            with ThreadPoolExecutor(max_workers=len(work)) as pool:
                rels = list(pool.map(lambda w: write(w[1], w[2]), work))
        else:
            rels = [write(w[1], w[2]) for w in work]
        for (mode, name, _df), rel in zip(work, rels):
            if mode == "replace":
                tables[name] = [rel]
            else:
                tables.setdefault(name, []).append(rel)

        manifest = {
            "commit_id": n,
            "tables": tables,
            "schemas": schemas,
            "meta": meta or {},
        }
        tmp = self._commit_path(n) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, self._commit_path(n))  # the atomic publish
        return n

    # -- maintenance -----------------------------------------------------------

    def expire_snapshots(self, keep_last: int = 3) -> None:
        """Drop snapshot files unreachable from the last ``keep_last`` commits
        (Iceberg's expire_snapshots).  Keeps the drain loop's disk footprint
        bounded during long benchmarks."""
        commits = sorted(
            int(f[:-5])
            for f in os.listdir(os.path.join(self.root, "_commits"))
            if f.endswith(".json")
        )
        keep = set(commits[-keep_last:])
        live: set[str] = set()
        for c in keep:
            with open(self._commit_path(c)) as fh:
                for segs in json.load(fh)["tables"].values():
                    live.update(segs)
        tables_dir = os.path.join(self.root, "tables")
        for tname in os.listdir(tables_dir):
            tdir = os.path.join(tables_dir, tname)
            for snap in os.listdir(tdir):
                rel = os.path.join("tables", tname, snap)
                if rel not in live:
                    shutil.rmtree(os.path.join(tdir, snap), ignore_errors=True)
