"""The batch-iterative crawl driver: one deterministic DataFrame DAG per epoch.

Replaces the reference's actor topology (Bootstrap.scala:24-53 spawning
FeedManager/HttpManager/DaoManager/... actors) with a driver loop of
micro-epochs. Each epoch is one logical plan:

    pending ──robots──▶ admit (politeness windows W1–W5)
            ──fetch (corpus join, S5/P5)──▶ split feed|article
    feeds:    parse UDTF (U1) ─▶ explode ─▶ in-feed dedup ─▶ seen probe (J2)
              ─▶ recency predicate (P1/P2) ─▶ enqueue next-epoch tasks
    articles: caption extract (U2/P3) ─▶ image decode (U4)
              ─▶ upsert rows into the articles log (S6)
    then: frontier/hosts/feeds state snapshots, per-bucket metrics,
          watermark completion (A1/A2/S7), atomic multi-table epoch commit.

Determinism discipline: no wall clock, every ordering from the composite
FIFO key, fixed shuffle partitions — the run is a pure function of
(corpus, seeds, config), which is what lets tests/test_crawl_e2e.py demand
EXACT crawl-order/seen-set equality vs oracle/refsim.py, and what makes a
mid-epoch kill resumable (state advances only via Catalog.commit_epoch).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.httpsim import socket_timeout_ms
from newsfeeds_crawler_spark.functions.predicates import should_fetch
from newsfeeds_crawler_spark.functions.urls import (
    canonicalize_url,
    host_bucket,
    url_host,
)
from newsfeeds_crawler_spark.operators.extract import extract_caption
from newsfeeds_crawler_spark.operators.fetchparse import (
    explode_items,
    fetch,
    parse_feed_udf,
)
from newsfeeds_crawler_spark.operators.multimodal import decode_images
from newsfeeds_crawler_spark.operators.politeness import (
    admit,
    admit_heads,
    head_candidates,
    priority_score,
    robots_split,
)
from newsfeeds_crawler_spark.operators.seen import latest_articles, probe
from newsfeeds_crawler_spark.plans import state as S
from newsfeeds_crawler_spark.tablestore import Catalog


@dataclass
class CrawlConfig:
    workers: int = 3                 # reference default http.workersNum=3
    tick_ms: int = 1000              # reference http.hostAccessInterval=1000
    num_host_buckets: int = 16
    salt_partitions: int = 0         # >0 enables salted pre-rank (hot hosts)
    max_epochs: int = 10_000
    # every N ticks, compact the articles buckets that accumulated more
    # than articles_max_dirs_per_bucket append dirs (bucket-LOCAL rewrite,
    # folded to latest-per-url; I/O ∝ oversized buckets). 0 = never.
    compact_articles_every: int = 0
    articles_max_dirs_per_bucket: int = 8
    # prune unreachable snapshot versions every N epochs (0 = never);
    # keeps the resume point plus one prior version per table
    vacuum_every: int = 0
    # priority frontier weights (north_star): both 0.0 → constant priority
    # → pure FIFO, the reference-equivalence mode the oracle checks
    depth_weight: float = 0.0
    recency_weight: float = 0.0
    # starvation guard for the priority frontier: a pending row older than
    # this many ticks escalates ahead of every fresh row (FIFO within the
    # escalated class). 0 = off. Irrelevant under pure FIFO (weights 0),
    # which cannot starve.
    starvation_epochs: int = 0
    # seen-probe prefilter (J2): "none" | "bloom" | "cuckoo" — cuckoo
    # supports deletion (recrawl-expiry), bloom is cheaper to build.
    # Defaults to the scale path (persisted bloom, delta-maintained) —
    # the equivalence suite proves all of these semantics-preserving.
    seen_filter: str = "bloom"
    use_bloom: bool = False          # back-compat alias for seen_filter="bloom"
    bloom_fpp: float = 0.01
    bloom_expected_per_bucket: int = 100_000
    # > 0: materialize the corpus hash-bucketed by pmod(xxhash64(url_canon))
    # in the workdir once, then partition-prune every epoch's fetch scan to
    # the admitted keys' buckets (J5 storage-partitioned shape); set 0 if
    # the input corpus is already bucket-partitioned
    corpus_buckets: int = 16
    # > 0: keep seen_urls as a hash-bucketed catalog table — the per-epoch
    # merge rewrites ONLY the buckets touched by that epoch's upserts
    # (Catalog.merge_bucketed) instead of copying the whole store
    seen_buckets: int = 16
    # > 0: keep the frontier as a catalog table bucketed on xxhash64(host)
    # — the per-epoch state transition (processed rows leave, new tasks
    # arrive) becomes a touched-bucket merge, so frontier WRITE I/O is
    # ∝ the tick's active hosts, never O(|pending|). (Reference analog:
    # tasks leave HttpManager.taskList in place, HttpManager.scala:76-94 —
    # the list is never rebuilt.)
    frontier_buckets: int = 16
    # incremental admission (requires frontier_buckets > 0): maintain a
    # per-host head-candidate table (top-1 pending row per host under the
    # static admission order) next to the bucketed frontier. Per tick the
    # politeness gate then reads ∝ #hosts-with-pending-work (the heads
    # table) and the maintenance job reads ∝ buckets touched by this
    # tick's admissions/enqueues — NEVER the whole 10^10-row pending set.
    # (Reference analog: HttpManager's skip-scan walks from the list HEAD
    # and never re-sorts the list, HttpManager.scala:76-94.) Robots denial
    # moves to enqueue time (a static per-row property — hosts' disallow
    # rules never change mid-crawl), so the heads invariant holds: heads
    # are always admissible-by-robots. Automatically falls back to
    # full-frontier admission when starvation_epochs > 0 (the age-class
    # flip makes the order key epoch-dependent, breaking the invariant)
    # or when resuming a workdir that has no heads table.
    frontier_heads: bool = True
    # > 0: keep the hosts dimension hash-bucketed on xxhash64(host) — the
    # per-epoch politeness update (last_access_epoch for ≤ workers hosts)
    # becomes a touched-bucket merge instead of an O(|hosts|) copy-on-write
    # snapshot. (Reference analog: hostAccessMap is a POINT update,
    # HttpManager.scala:122-124 — it never rewrites the map.)
    hosts_buckets: int = 16
    # hosts-dimension join strategy (SURVEY.md §2.3 J4's scale caveat):
    # while |hosts| <= this, the per-tick admission and robots joins
    # BROADCAST the dim (one small ship, zero shuffle). Above it — a
    # 10^8-host web crawl, where the dim is GBs — broadcasting it to every
    # executor each tick breaks the epoch, so the joins switch shape:
    # admission (heads ⋈ hosts, both ∝ |hosts|) becomes a shuffled-hash
    # join on host (a storage-partitioned join on a real bucketed catalog
    # — hosts and frontier_heads are both bucketed on xxhash64(host)), and
    # the per-tick enqueue robots gate semi-prunes the dim to the tick's
    # hosts (∝ activity) before broadcasting the pruned rows. |hosts| is
    # counted ONCE per run (init counts the source; resume reads the count
    # persisted in the hosts snapshot meta). None = always broadcast.
    hosts_broadcast_max: int | None = 5_000_000
    # > 0: same for the feeds table, bucketed on xxhash64(feed_canon) —
    # per-epoch write ∝ feeds touched by this tick's outcomes/countdowns,
    # never |feeds|. (Reference analog: UPDATE feed SET last_pub_date is
    # one row, MysqlFeedArticleDao.scala:39-44.)
    feeds_buckets: int = 16
    # liveness guard (ref FeedManager.scala:31-33,67-69 ReceiveTimeout =
    # maxWaitingTimeBeforeStop 60s): after this many CONSECUTIVE epochs
    # with zero admissions, quarantine the stuck pending rows into
    # ``errors``, kill their feeds, and converge. 0 = disabled.
    stall_timeout_epochs: int = 60
    # per-feed liveness guard (the bulk analog of the reference's per-actor
    # ReceiveTimeout, FeedManager.scala:31-33,67-69 — ONE stuck feed dies
    # after maxWaitingTimeBeforeStop while the rest of the crawl proceeds):
    # every N ticks, quarantine feeds whose countdown clock
    # (last_progress_epoch) stalled for >= N epochs — their pending rows
    # move to errors (stage='feed_timeout') + the terminal log
    # (state='stalled') and the feed dies, independent of global progress.
    # The feeds scan is amortized by the sweep cadence. 0 = off; must be
    # >= 2 (a task's pending window before a robots denial is one tick —
    # N=1 would let the sweep race the denial, diverging from the oracle).
    feed_stall_epochs: int = 0
    # crawl-trap guard (priority-frontier extension, no reference analog):
    # cap the number of PENDING frontier rows per host. New article tasks
    # that would push a host past the cap are dropped terminally
    # (state='quota_denied' in the log; they process for their feed's
    # countdown at their enqueue epoch, exactly like an enqueue-time robots
    # denial), so one link-farm / calendar-trap host can never grow its
    # queue without bound while politeness admits it 1 URL/delay. Counts
    # are maintained incrementally on the hosts table (per-tick deltas ∝
    # admitted + enqueued rows — the pending frontier is NEVER re-scanned).
    # Requires heads mode (enqueue-time robots), because quota consumption
    # is only well-defined when denied rows never occupy the frontier.
    # 0 = off.
    host_pending_cap: int = 0
    # depth-0 class of the per-host budget (depth classes: seeds=0,
    # articles=1 — host_pending_cap is the depth-1 class): at most this
    # many robots-allowed FEEDS per host enter the frontier at init,
    # consumed in seed order; overflow seeds are terminally 'quota_denied'
    # and their feeds die — a seed-list link farm cannot monopolize one
    # host's budget. Requires heads mode (enqueue-time robots), same
    # invariant as host_pending_cap. 0 = off.
    host_seed_cap: int = 0
    # bucket-sizing rule (measured, tools/heads_ab.py: frontier_buckets
    # must exceed ~4× the worker budget or the per-tick heads/frontier
    # maintenance merges touch every bucket and the incremental admission
    # buys nothing). True: a new engine whose frontier_buckets < 4×workers
    # in heads mode auto-raises it to the next power of two ≥ 4×workers
    # (capped at 4096). False: warn instead (the e2e/bench configs pin
    # their own counts). Existing workdirs are unaffected either way — the
    # merge layout comes from the table manifest, not the config.
    auto_size_buckets: bool = False
    # speculative gate pipelining (heads mode): materialize tick t+1's
    # admission gate during tick t's concurrent write window, overlapping
    # the gate job with the big state merges instead of paying it serially
    # at the top of the next tick. Purely an execution-order optimization:
    # the speculated gate reads the COMMITTED heads/hosts snapshots (the
    # exact inputs tick t+1 would read) and reuse is keyed on their
    # versions, so any sweep, compaction, or resume in between misses the
    # key and the next tick recomputes — results are bit-identical either
    # way, which the e2e equivalence suite pins.
    speculative_gate: bool = True
    # compact the append-only tables (frontier_log/metrics/errors) every N
    # epochs: each epoch appends one directory, so an uncompacted 10^4-epoch
    # run reads 10^4 dirs per log scan; compaction rewrites the log as one
    # snapshot (old dirs become unreachable -> vacuum). 0 = never.
    compact_log_every: int = 0
    # typed ``httpClient.*`` map from the .properties config (ref
    # DefaultHttpFacade.scala:96-103 sets each on HttpClient). The engine
    # consumes ``http.socket.timeout``: fetches whose simulated latency
    # (functions/httpsim.py) reaches it get a null body, the reference's
    # exception→null routing (HttpManager.scala:112-121). Everything else
    # is transport tuning with no corpus-join analog — parsed, carried,
    # intentionally inert.
    client_http_params: dict = field(default_factory=dict)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        corpus: DataFrame,
        hosts: DataFrame,      # host, crawl_delay_ms, robots_disallow
        seeds: DataFrame,      # seed_idx, url
        preseen: DataFrame,    # url_canon, article_id, pub_ts, caption
        config: CrawlConfig | None = None,
        robots_updates: DataFrame | None = None,
    ):
        """``robots_updates``: optional mid-crawl robots refresh schedule —
        (host, effective_epoch >= 1, robots_disallow, crawl_delay_ms); null
        fields keep the host's prior value, '' clears the disallow list. A
        host's rules change at the START of the effective epoch, before
        that tick's sweeps and gates, so enqueue-time gates (heads mode)
        read the version in force at the task's ENQUEUE epoch and the
        legacy admission-time gate re-checks pending rows against the
        current rules each tick — the same versioning the oracle replays
        (oracle/refsim.py simulate(robots_updates=)). The schedule persists
        in the workdir at init (resume replays the SAME schedule and
        ignores this argument), and rule application is idempotent
        (latest-non-null-wins per field), so a torn tick or a lost
        applied-through marker re-applies safely. Real-crawl analog: the
        refetch loop that re-reads robots.txt lands its parsed diffs here."""
        self.spark = spark
        self.cfg = config or CrawlConfig()
        # bucket-sizing rule (heads mode): buckets < 4×workers degenerate
        # the touched-bucket maintenance merges to full rewrites (measured,
        # tools/heads_ab.py — BENCH/BASELINE.md round-4 table). Auto-raise
        # when opted in, warn otherwise. Resume layouts are unaffected:
        # merges take their bucket count from the table manifest.
        cfg0 = self.cfg
        if (
            cfg0.frontier_heads
            and cfg0.frontier_buckets > 0
            and cfg0.starvation_epochs == 0
            and cfg0.frontier_buckets < 4 * cfg0.workers
        ):
            if cfg0.auto_size_buckets:
                import dataclasses

                b = 1
                while b < min(4 * cfg0.workers, 4096):
                    b *= 2
                self.cfg = dataclasses.replace(cfg0, frontier_buckets=b)
            else:
                import warnings

                warnings.warn(
                    f"frontier_buckets={cfg0.frontier_buckets} < 4×workers"
                    f"={4 * cfg0.workers}: heads-mode maintenance merges "
                    "will touch every bucket (full rewrites). Raise "
                    "frontier_buckets or set auto_size_buckets=True.",
                    stacklevel=2,
                )
        # Tick-plan session: same SparkContext/executors, AQE disabled.
        # Every per-tick state plan is already hand-shaped — explicit
        # repartition to the bucket count, explicit broadcast hints,
        # bucket-dir pruning — so AQE's runtime re-planning cannot improve
        # them; it only materializes every shuffle stage as its own job
        # (measured: ~25 of a 75-job steady tick were AQE stage jobs).
        # Analytics queries keep the caller's session (AQE + skew-join on);
        # state tables and tick frames root here.
        tick = spark.newSession()
        tick.conf.set("spark.sql.adaptive.enabled", "false")
        for k in ("spark.sql.shuffle.partitions", "spark.sql.session.timeZone"):
            try:
                tick.conf.set(k, spark.conf.get(k))
            except Exception:
                pass
        self.tick_spark = tick
        self.cat = Catalog(tick, workdir)
        # speculative next-tick gate: (key, gate_df, gstats) produced during
        # the previous tick's write window; keyed on exact versions so any
        # sweep/compaction/resume invalidates it by construction
        self._spec_gate = None
        self.corpus = corpus
        self._hosts_src = hosts
        self._seeds_src = seeds
        self._preseen_src = preseen
        self._robots_updates_src = robots_updates
        # distinct effective epochs of the persisted schedule, sorted —
        # driver-side metadata (∝ #update epochs, bounded by the run
        # length) so non-update ticks pay ZERO extra jobs
        self._ru_epochs: list[int] = []
        # True once |hosts| is known to exceed hosts_broadcast_max — set
        # once per run (init counts the source, resume reads the persisted
        # count); flips every hosts-dim join off the broadcast path
        self._big_hosts: bool | None = None if self.cfg.hosts_broadcast_max is not None else False
        if self.cfg.corpus_buckets > 0:
            self.corpus = self._bucketed_corpus(workdir, corpus)

    def _bucketed_corpus(self, workdir: str, corpus: DataFrame) -> DataFrame:
        """One-time bucketed materialization of the corpus (idempotent on
        resume): partition layout bucket=pmod(xxhash64(url_canon), B) so the
        per-epoch fetch scan prunes to the admitted keys' buckets."""
        import os

        from newsfeeds_crawler_spark.sources.frontier import write_bucketed

        B = self.cfg.corpus_buckets
        path = os.path.join(workdir, f"_corpus_b{B}")
        marker = os.path.join(path, "_DONE")
        if not os.path.exists(marker):
            write_bucketed(
                corpus.withColumn("__h", F.xxhash64("url_canon")),
                path,
                key="__h",
                num_buckets=B,
            )
            open(marker, "w").close()
        return self.tick_spark.read.parquet(path).drop("__h")

    # ------------------------------------------------------------- init

    def init_state(self) -> dict[str, int]:
        """Epoch-0 state: seed fan-out (S2/J1), host dimension, preseen store."""
        cfg, cat = self.cfg, self.cat
        f0 = (
            self._seeds_src.select(
                "seed_idx", "url", canonicalize_url("url").alias("url_canon")
            )
            .withColumn("url_hash", F.xxhash64("url_canon"))
            .withColumn("host", url_host(F.col("url_canon"), canonical=True))
            .select(
                "url",
                "url_canon",
                "url_hash",
                "host",
                F.lit("feed").alias("kind"),
                F.col("url_canon").alias("feed_canon"),
                F.lit(None).cast("timestamp").alias("parsed_pub_ts"),
                F.lit(0).cast("int").alias("e_epoch"),
                F.col("seed_idx").cast("int").alias("e_rank"),
                F.lit(0).cast("int").alias("e_sub"),
                priority_score(
                    0, F.lit(None).cast("timestamp"),
                    cfg.depth_weight, cfg.recency_weight,
                ).alias("priority"),
                F.lit("pending").alias("state"),
                F.lit(None).cast("int").alias("fetch_epoch"),
                F.lit(None).cast("int").alias("admit_rank"),
            )
        )
        hosts0 = self._hosts_src.select(
            "host",
            F.xxhash64("host").alias("host_hash"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("crawl_delay_ms") / F.lit(cfg.tick_ms)).cast("int"),
            ).alias("delay_epochs"),
            "robots_disallow",
            F.lit(None).cast("int").alias("last_access_epoch"),
        )
        # incremental-admission mode: robots denial is a STATIC per-row
        # property (disallow rules never change mid-crawl), so it moves to
        # enqueue time — seeds are gated here, items at their enqueue tick.
        # Denied rows never enter the frontier (the heads invariant), they
        # go straight to the terminal log; a denied FEED kills the feed
        # (oracle/refsim.py:162-167 — same final states, denial just fires
        # at enqueue instead of the row's first pending tick).
        heads_mode = self._heads_mode()
        if self._big_hosts is None:
            # one count job per workdir lifetime: persisted in the hosts
            # snapshot meta below, so resume never recounts
            self._n_hosts = self._hosts_src.count()
            self._big_hosts = self._n_hosts > cfg.hosts_broadcast_max
        if cfg.host_seed_cap > 0 and not heads_mode:
            raise ValueError(
                "host_seed_cap requires heads mode (frontier_heads on, "
                "frontier_buckets > 0, starvation_epochs == 0): the seed "
                "quota is only well-defined when robots denial happens at "
                "enqueue time, so denied seeds never consume quota"
            )
        qdenied0 = None
        if heads_mode:
            # seed gate: the pending side is ∝ |seeds| (itself huge at
            # scale), so big-hosts mode joins shuffled-hash — one-time cost
            a0, d0 = robots_split(
                f0, hosts0, dim_join="shuffle" if self._big_hosts else "broadcast"
            )
            if cfg.host_seed_cap > 0:
                # depth-0 budget: one per-host rank window over the
                # robots-ALLOWED seeds (denied seeds never consume quota),
                # consumed in seed order — rows past the cap are terminal
                wsq = Window.partitionBy("host").orderBy(
                    "e_epoch", "e_rank", "e_sub"
                )
                a0 = a0.withColumn("__rn", F.row_number().over(wsq))
                q0 = a0.filter(
                    F.col("__rn") > cfg.host_seed_cap
                ).drop("__rn")
                a0 = a0.filter(
                    F.col("__rn") <= cfg.host_seed_cap
                ).drop("__rn")
            else:
                q0 = None
            tagged0 = a0.withColumn("__gate", F.lit("a")).unionByName(
                d0.withColumn("__gate", F.lit("d"))
            )
            if q0 is not None:
                tagged0 = tagged0.unionByName(
                    q0.withColumn("__gate", F.lit("q"))
                )
            tagged0 = tagged0.localCheckpoint(eager=True)
            allowed0 = tagged0.filter(F.col("__gate") == "a").drop("__gate")
            denied0 = tagged0.filter(F.col("__gate") == "d").drop("__gate")
            feeds_src = allowed0.withColumn(
                "__fstate", F.lit("pending")
            ).unionByName(denied0.withColumn("__fstate", F.lit("dead")))
            if q0 is not None:
                qdenied0 = tagged0.filter(F.col("__gate") == "q").drop("__gate")
                feeds_src = feeds_src.unionByName(
                    qdenied0.withColumn("__fstate", F.lit("dead"))
                )
        else:
            allowed0, denied0 = f0, None
            feeds_src = f0.withColumn("__fstate", F.lit("pending"))
        feeds0 = feeds_src.select(
            F.col("feed_canon"),
            "url",
            "host",
            F.col("e_rank").alias("seed_idx"),
            F.col("__fstate").alias("state"),
            F.lit(None).cast("timestamp").alias("parsed_pub_ts"),
            F.lit(None).cast("timestamp").alias("last_pub_ts"),
            F.lit(None).cast("int").alias("done_epoch"),
            F.lit(0).cast("int").alias("pending_items"),
            F.lit(None).cast("int").alias("last_progress_epoch"),
        )
        arts0 = self._preseen_src.select(
            "url_canon",
            F.xxhash64("url_canon").alias("url_hash"),
            F.col("article_id").cast("long"),
            "pub_ts",
            "caption",
            F.lit(None).cast("string").alias("feed_canon"),
            F.lit("preseen").alias("action"),
            F.lit(-1).cast("int").alias("epoch"),
            F.lit(None).cast("long").alias("phash"),
            F.lit(None).cast("int").alias("w"),
            F.lit(None).cast("int").alias("h"),
            F.lit(None).cast("string").alias("fmt"),
            F.lit(None).cast("binary").alias("pixels"),
            F.lit(None).cast("long").alias("dec_phash"),
            host_bucket(
                url_host(F.col("url_canon"), canonical=True),
                cfg.num_host_buckets,
            ).alias("host_bucket"),
        )
        empty_metrics = self.spark.createDataFrame([], S.METRICS_SCHEMA)
        empty_errors = self.spark.createDataFrame([], S.ERRORS_SCHEMA)
        empty_frontier_log = self.spark.createDataFrame([], S.FRONTIER_SCHEMA)
        base_cols = [f.name for f in S.FRONTIER_SCHEMA.fields]
        log0 = empty_frontier_log
        if heads_mode and denied0 is not None:
            log0 = empty_frontier_log.unionByName(
                denied0.withColumn("state", F.lit("robots_denied")).select(
                    *base_cols
                )
            )
        if qdenied0 is not None:
            log0 = log0.unionByName(
                qdenied0.withColumn("state", F.lit("quota_denied")).select(
                    *base_cols
                )
            )
        seen0 = arts0.select("url_canon", "url_hash", "article_id", "pub_ts")
        if cfg.seen_buckets > 0:
            seen_v = self.cat.write_bucketed(
                "seen_urls", seen0, key="url_hash", num_buckets=cfg.seen_buckets
            )
        else:
            seen_v = self.cat.write("seen_urls", seen0)
        if cfg.frontier_buckets > 0:
            f_v = self.cat.write_bucketed(
                "frontier", allowed0, key="xxhash64(host)",
                num_buckets=cfg.frontier_buckets,
            )
        else:
            f_v = self.cat.write("frontier", allowed0)
        heads_v = None
        if heads_mode:
            heads_v = self.cat.write_bucketed(
                "frontier_heads",
                head_candidates(allowed0, cfg.salt_partitions),
                key="xxhash64(host)",
                num_buckets=cfg.frontier_buckets,
            )
        # per-host pending counts start at the seed frontier's counts; the
        # quota guard maintains them per tick (delta merges), every other
        # mode just carries them
        seed_counts = allowed0.groupBy("host").agg(
            F.count(F.lit(1)).cast("long").alias("__pc")
        )
        hosts0 = (
            hosts0.join(seed_counts, "host", "left")
            .withColumn(
                "pending_count", F.coalesce(F.col("__pc"), F.lit(0).cast("long"))
            )
            .drop("__pc")
            .select(*[f.name for f in S.HOSTS_SCHEMA.fields])
        )
        hmeta = (
            {"n_hosts": self._n_hosts} if getattr(self, "_n_hosts", None) is not None else {}
        )
        if cfg.hosts_buckets > 0:
            hosts_v = self.cat.write_bucketed(
                "hosts", hosts0, key="xxhash64(host)",
                num_buckets=cfg.hosts_buckets, meta=hmeta,
            )
        else:
            hosts_v = self.cat.write("hosts", hosts0, meta=hmeta)
        if cfg.feeds_buckets > 0:
            feeds_v = self.cat.write_bucketed(
                "feeds", feeds0, key="xxhash64(feed_canon)",
                num_buckets=cfg.feeds_buckets,
            )
        else:
            feeds_v = self.cat.write("feeds", feeds0)
        versions = {
            "frontier": f_v,
            "frontier_log": self.cat.write(
                "frontier_log", log0, mode="append"
            ),
            "seen_urls": seen_v,
            "hosts": hosts_v,
            "feeds": feeds_v,
            # articles live in a bucket-dir layout keyed on host_bucket
            # (north_star: pixels+captions partitioned on host-bucket).
            # Appends add bucket dirs next to the prior snapshot's, so the
            # read stays ONE multi-path scan however many epochs append —
            # never a union of partitioned roots.
            "articles": self.cat.write_bucketed(
                "articles", arts0, key="host_bucket",
                num_buckets=cfg.num_host_buckets,
            ),
            "metrics": self.cat.write("metrics", empty_metrics, mode="append"),
            "errors": self.cat.write("errors", empty_errors, mode="append"),
        }
        if heads_v is not None:
            versions["frontier_heads"] = heads_v
        if self._robots_updates_src is not None:
            versions["robots_updates"] = self._write_robots_updates()
        cat.commit_epoch(
            0, versions,
            meta={"event": "init", "host_pending_cap": cfg.host_pending_cap},
        )
        return versions

    def _write_robots_updates(self) -> int:
        """Persist the robots refresh schedule ONCE at init (resume replays
        the stored table — the run stays a pure function of the workdir).
        Validates effective_epoch >= 1 (epoch 0's rules are the hosts
        table itself) and (host, effective_epoch) uniqueness (two updates
        for one host in one epoch have no defined winner); one metadata-
        sized aggregate job, never re-run."""
        ru = self._robots_updates_src.select(
            F.col("host").cast("string"),
            F.col("effective_epoch").cast("int"),
            F.col("robots_disallow").cast("string"),
            F.col("crawl_delay_ms").cast("long"),
        )
        stats = ru.agg(
            F.min("effective_epoch").alias("mn"),
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("host", "effective_epoch").alias("nd"),
            F.collect_set("effective_epoch").alias("epochs"),
        ).first()
        if stats["n"] and stats["mn"] < 1:
            raise ValueError(
                "robots_updates.effective_epoch must be >= 1: epoch 0's "
                "rules belong in the hosts table"
            )
        if stats["n"] != stats["nd"]:
            raise ValueError(
                "robots_updates has duplicate (host, effective_epoch) rows "
                "— one rule version per host per epoch"
            )
        self._ru_epochs = sorted(stats["epochs"] or [])
        return self.cat.write("robots_updates", ru)

    def _apply_robots_updates(
        self, tick: int, applied: int, v: dict[str, int]
    ) -> dict[str, int]:
        """Fold schedule rows with effective_epoch in (applied, tick] into
        the hosts table — the mid-crawl robots refresh. Latest non-null
        value per (host, field) wins, so applying a window of several
        epochs at once (resume across a lost applied-through marker) lands
        the same state as applying them tick by tick, and re-application
        is idempotent. I/O ∝ the update batch's host buckets
        (merge_bucketed), never |hosts|; the new hosts snapshot version
        also invalidates any speculated next-tick gate by construction
        (its reuse key pins the hosts version)."""
        cfg, cat = self.cfg, self.cat
        ru = cat.read("robots_updates", v["robots_updates"]).filter(
            (F.col("effective_epoch") > applied)
            & (F.col("effective_epoch") <= tick)
        )
        w = Window.partitionBy("host").orderBy(
            F.col("effective_epoch").desc()
        ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        u = (
            ru.withColumn(
                "__new_dis", F.first("robots_disallow", ignorenulls=True).over(w)
            )
            .withColumn(
                "__new_cd", F.first("crawl_delay_ms", ignorenulls=True).over(w)
            )
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("host").orderBy(
                        F.col("effective_epoch").desc()
                    )
                ),
            )
            .filter(F.col("__rn") == 1)
            .select("host", "__new_dis", "__new_cd")
        )
        new_dis = F.coalesce(F.col("__new_dis"), F.col("robots_disallow"))
        new_de = F.when(
            F.col("__new_cd").isNotNull(),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("__new_cd") / F.lit(cfg.tick_ms)).cast("int"),
            ),
        ).otherwise(F.col("delay_epochs"))
        hfields = [f.name for f in S.HOSTS_SCHEMA.fields]
        hman = cat.meta("hosts", v["hosts"])
        nv = dict(v)
        if hman.get("num_buckets"):
            B = hman["num_buckets"]
            ub = u.localCheckpoint(eager=False)
            tb = {
                r["__hb"]
                for r in ub.select(
                    F.pmod(F.xxhash64("host"), F.lit(B)).cast("int").alias("__hb")
                )
                .distinct()
                .collect()
            }
            # inner join: updates for hosts the crawl never knew are
            # ignored (the oracle filters to corpus hosts the same way)
            hosts_upd = (
                self._read_hosts(v, buckets=tb)
                .join(F.broadcast(ub), "host", "inner")
                .withColumn("robots_disallow", new_dis)
                .withColumn("delay_epochs", new_de)
                .select(*hfields)
            )
            nv["hosts"] = cat.merge_bucketed(
                "hosts", hosts_upd, on="host",
                base_version=v["hosts"], touched=tb,
            )
        else:
            hosts_upd = (
                self._read_hosts(v)
                .join(F.broadcast(u), "host", "left")
                .withColumn("robots_disallow", new_dis)
                .withColumn("delay_epochs", new_de)
                .select(*hfields)
            )
            nv["hosts"] = cat.write(
                "hosts", hosts_upd,
                meta={k: hman[k] for k in ("n_hosts",) if k in hman},
            )
        return nv

    def _read_hosts(self, v: dict[str, int], buckets: set[int] | None = None) -> DataFrame:
        """Read the hosts table at the epoch-pinned version, backfilling the
        ``pending_count`` column for workdirs written before it existed
        (HOSTS_SCHEMA gained it in quota mode; every update path selects it
        from the stored table). Backfill is 0 — the carried-as-is value a
        pre-quota run would have started from; enabling the quota on such a
        workdir triggers the one-time recount in :meth:`run` regardless."""
        df = self.cat.read("hosts", v["hosts"], buckets=buckets)
        if "pending_count" not in df.columns:
            df = df.withColumn("pending_count", F.lit(0).cast("long"))
        return df

    def _heads_mode(self) -> bool:
        """True when new runs should maintain the incremental per-host
        head-candidate table. Requires the bucketed frontier; the
        starvation guard's epoch-dependent order key breaks the heads
        invariant, so it forces the full-frontier fallback."""
        cfg = self.cfg
        return (
            cfg.frontier_heads
            and cfg.frontier_buckets > 0
            and cfg.starvation_epochs == 0
        )

    # ---------------------------------------------------- seen prefilter

    def _load_filter(self, which: str, v: dict[str, int], store_latest):
        """Load the persisted seen prefilter at the epoch-pinned version —
        per-epoch cost is B small blob reads, NEVER an O(|seen|) rebuild.
        First use (or a workdir from before the filter table existed) falls
        back to one build from the store."""
        if which not in ("bloom", "cuckoo"):
            return None
        # steady-tick cache: the filter persisted at the END of tick t IS
        # the filter tick t+1 loads (same version chain), so the in-memory
        # object from _persist_filter answers the next load with zero jobs.
        # Keyed on (kind, version): a resume from a different version, a
        # fresh engine, or a kind switch all miss and fall through to the
        # table read.
        cached = getattr(self, "_filter_cache", None)
        if (
            cached is not None
            and "seen_filter" in v
            and cached[0] == (which, v["seen_filter"])
        ):
            return cached[1]
        if "seen_filter" in v and self.cat.exists("seen_filter"):
            blobs = self.cat.read("seen_filter", v["seen_filter"])
            meta = self.cat.meta("seen_filter", v["seen_filter"])
            if meta.get("kind") == which:
                if which == "bloom":
                    from newsfeeds_crawler_spark.operators.bloom import (
                        PartitionedBloom,
                    )

                    return PartitionedBloom.from_df(
                        blobs, meta["m"], meta["k"], meta["num_buckets"]
                    )
                from newsfeeds_crawler_spark.operators.cuckoo import (
                    PartitionedCuckoo,
                )

                return PartitionedCuckoo.from_df(blobs, meta["num_buckets"])
        cfg = self.cfg
        if which == "bloom":
            from newsfeeds_crawler_spark.operators.bloom import PartitionedBloom

            return PartitionedBloom.build(
                store_latest.select("url_hash"),
                num_buckets=cfg.num_host_buckets,
                expected_per_bucket=cfg.bloom_expected_per_bucket,
                fpp=cfg.bloom_fpp,
            )
        from newsfeeds_crawler_spark.operators.cuckoo import PartitionedCuckoo

        return PartitionedCuckoo.build(
            store_latest.select("url_hash"),
            key="url_hash",
            num_partitions=cfg.num_host_buckets,
            expected_per_partition=cfg.bloom_expected_per_bucket,
        )

    def _persist_filter(self, which: str, bloom, seen_upserts) -> int:
        """Fold this epoch's upserts into the filter and snapshot the blobs.
        Bloom: distributed delta build over |upserts| keys + bitwise-OR
        merge. Cuckoo: add_keys of the collected upsert hashes (≤ workers
        rows/epoch; deletable on recrawl expiry via delete_keys)."""
        import numpy as np

        # one narrow collect: the epoch's upserts are bounded by the worker
        # cap (≤ thousands of keys even on a 1000-executor crawl), so the
        # driver-side fold replaces the delta build's shuffle + pandas UDF.
        # bloom.add_keys calls the same _set_bits as the distributed build
        # — bit-identical to build(delta)+merge.
        keys = np.array(
            [r["url_hash"] for r in seen_upserts.select("url_hash").collect()],
            dtype=np.int64,
        )
        if which == "bloom":
            bloom = bloom.add_keys(keys)
            meta = {
                "kind": "bloom",
                "m": bloom.m,
                "k": bloom.k,
                "num_buckets": bloom.num_buckets,
            }
        else:
            if keys.size:
                bloom.add_keys(keys)
            meta = {"kind": "cuckoo", "num_buckets": bloom.num_partitions}
        ver = self.cat.write(
            "seen_filter", bloom.to_df(self.tick_spark), meta=meta
        )
        self._filter_cache = ((which, ver), bloom)
        return ver

    # ------------------------------------------------------------- tick

    def _gate_and_stats(self, adm0, denied0):
        """Materialize the admission outcome: the tag-union checkpoint
        (admitted ∪ denied) plus ONE stats aggregate that both triggers the
        checkpoint and yields everything the tick's later bucket pruning
        needs — gate counts, the admitted keys' corpus buckets (fetch-scan
        pruning), the admitted articles' seen-store buckets (upsert
        prior-row pruning — a superset of the decoded keys' buckets, and a
        superset only adds store rows the inner join drops), the hosts-dim
        and feeds-table touched buckets. Folding the collects into one job
        keeps the per-epoch fixed cost at one launch per phase."""
        cfg = self.cfg
        gate = (
            adm0.withColumn("__gate", F.lit("a"))
            .unionByName(
                denied0.withColumn("admit_rank", F.lit(None).cast("int"))
                .select(*adm0.columns)
                .withColumn("__gate", F.lit("d"))
            )
            .localCheckpoint(eager=False)
        )
        is_a = F.col("__gate") == "a"
        gstats = gate.groupBy(
            "__gate",
            F.when(
                is_a,
                F.pmod(
                    F.xxhash64("url_canon"), F.lit(max(cfg.corpus_buckets, 1))
                ).cast("int"),
            ).alias("cb"),
            F.when(
                is_a & (F.col("kind") == "article"),
                F.pmod(F.col("url_hash"), F.lit(max(cfg.seen_buckets, 1)))
                .cast("int"),
            ).alias("sb"),
            # hosts-dim touched buckets: only ADMITTED hosts gain a new
            # last_access_epoch this tick
            F.when(
                is_a,
                F.pmod(F.xxhash64("host"), F.lit(max(cfg.hosts_buckets, 1)))
                .cast("int"),
            ).alias("hb"),
            # feeds-table touched buckets: every gate row (admitted or
            # denied, feed or article) contributes a feed outcome, an
            # enqueue count, or a processed count to exactly its own feed
            F.pmod(
                F.xxhash64(F.coalesce("feed_canon", "url_canon")),
                F.lit(max(cfg.feeds_buckets, 1)),
            ).cast("int").alias("fb"),
        ).agg(F.count(F.lit(1)).alias("n")).collect()
        return gate, gstats

    def _run_tick(self, tick: int, v: dict[str, int], pending_counts: dict[int, int]):
        """One micro-epoch. ``pending_counts`` (host_bucket → #pending) is
        the driver-maintained running count — exact by induction
        (init = seed counts; ′ = counts − processed + enqueued) — so stall
        metrics and convergence tests never scan the pending frontier.
        Returns (new_versions, summary, new_pending_counts)."""
        import time as _time

        cfg, cat = self.cfg, self.cat
        phases = self.last_tick_phases = {}
        _t0 = _time.time()

        def _mark(name):
            nonlocal _t0
            now = _time.time()
            phases[name] = round(now - _t0, 3)
            _t0 = now

        frontier = cat.read("frontier", v["frontier"])
        pending = frontier.filter(F.col("state") == "pending")
        hosts = self._read_hosts(v)
        # incremental admission: with a heads table committed, the
        # politeness gate reads ONE row per host-with-pending-work instead
        # of scanning the whole pending frontier; robots moved to enqueue
        # time, so heads-mode ticks have no pending-side denials. A workdir
        # initialized without the table (legacy layout, or starvation mode)
        # falls back to the full-frontier scan.
        heads_on = "frontier_heads" in v
        if cfg.host_pending_cap > 0 and not heads_on:
            raise ValueError(
                "host_pending_cap requires heads mode (frontier_heads on, "
                "frontier_buckets > 0, starvation_epochs == 0, a workdir "
                "initialized with a heads table): quota consumption is only "
                "well-defined when robots denial happens at enqueue time, "
                "so denied rows never occupy the frontier"
            )

        # ONE materialization job for the admission outcome (tag-union of
        # admitted ∪ denied) + ONE count job — the per-epoch fixed cost is
        # dominated by job count, not data volume, at small admitted sizes.
        # Speculative pipelining: tick t's write window may have already
        # materialized THIS tick's gate (see w_spec below) — reuse is keyed
        # on the exact (tick, heads version, hosts version), so any
        # intervening sweep/compaction/resume changes a version and misses.
        spec = self._spec_gate
        self._spec_gate = None
        spec_key = (tick, v.get("frontier_heads"), v.get("hosts"))
        if heads_on and spec is not None and spec[0] == spec_key:
            gate, gstats = spec[1], spec[2]
        else:
            dim_join = "shuffle" if self._big_hosts else "broadcast"
            if heads_on:
                heads = cat.read("frontier_heads", v["frontier_heads"])
                adm0 = admit_heads(
                    heads, hosts, tick, cfg.workers, dim_join=dim_join
                )
                denied0 = self.tick_spark.createDataFrame([], S.FRONTIER_SCHEMA)
            else:
                allowed, denied0 = robots_split(pending, hosts, dim_join=dim_join)
                adm0 = admit(
                    allowed, hosts, tick, cfg.workers, cfg.salt_partitions,
                    starvation_epochs=cfg.starvation_epochs,
                    dim_join=dim_join,
                )
            gate, gstats = self._gate_and_stats(adm0, denied0)
        admitted = gate.filter(F.col("__gate") == "a").drop("__gate")
        denied = gate.filter(F.col("__gate") == "d").drop("__gate")
        from concurrent.futures import ThreadPoolExecutor

        n_admitted = sum(r["n"] for r in gstats if r["__gate"] == "a")
        n_denied = sum(r["n"] for r in gstats if r["__gate"] == "d")
        touched_corpus = sorted(
            {r["cb"] for r in gstats if r["cb"] is not None}
        )
        tb_articles = {r["sb"] for r in gstats if r["sb"] is not None}
        tb_hosts = {r["hb"] for r in gstats if r["hb"] is not None}
        tb_feeds = {r["fb"] for r in gstats if r["fb"] is not None}
        _mark("gate")
        if n_admitted == 0 and n_denied == 0:
            # counts are exact, so convergence (A3) and the stall total need
            # no pending scan (ProjectManager.scala:37-51)
            n_stall = sum(pending_counts.values())
            if n_stall == 0:
                return None
            mrow = self.tick_spark.createDataFrame(
                [(tick, -1, 0, n_stall, 0, 0, 0)], S.METRICS_SCHEMA
            )
            v = dict(v)
            v["metrics"] = cat.write(
                "metrics", mrow, mode="append", base_version=v["metrics"]
            )
            return (
                v,
                {"epoch": tick, "admitted": 0, "stalls": n_stall},
                pending_counts,
            )

        # probe store: one row per URL, maintained incrementally below —
        # never a latest-per-key window over the whole articles log
        store_latest = cat.read("seen_urls", v["seen_urls"])

        # ---- fetch (S5) + split ------------------------------------------
        # ONE job: the fetch join's internal hits checkpoint also runs the
        # parse UDF + caption extract (enrich=) — miss rows (null body)
        # union in as null-typed literals, so the per-kind frames below are
        # cheap plans over the materialized hits ∪ a broadcast anti-join of
        # the (≤ workers-row) admitted frame; no second checkpoint needed
        fetched = fetch(
            admitted,
            self.corpus,
            num_buckets=cfg.corpus_buckets,
            touched=touched_corpus,
            enrich=lambda hits: hits.withColumn(
                "parsed",
                parse_feed_udf(F.when(F.col("kind") == "feed", F.col("body"))),
            ).withColumn(
                "caption_x",
                extract_caption(F.when(F.col("kind") == "article", F.col("body"))),
            ),
            null_cols=(
                ("parsed", parse_feed_udf.returnType),
                ("caption_x", "string"),
            ),
            socket_timeout_ms=socket_timeout_ms(cfg.client_http_params),
        ).localCheckpoint(eager=True)
        # ^ second (cheap) checkpoint: the union itself is UDF-free — the
        # expensive stages materialized inside the hits checkpoint — but
        # without it every one of the tick's ~10 downstream jobs would
        # rebuild the misses anti-join's broadcast of the hits keys
        # (measured: the rebuilds cost more than one extra trivial job)
        _mark("fetch")
        feeds_f = fetched.filter(F.col("kind") == "feed")
        arts_f = fetched.filter(F.col("kind") == "article")

        # ---- feed branch: outcomes + item pipeline -----------------------
        feed_out = feeds_f.select(
            F.col("url_canon").alias("u_feed"),
            F.when(
                F.col("body").isNull() | ~F.col("parsed.parse_ok"), F.lit("dead")
            )
            .when(F.size("parsed.links") == 0, F.lit("done_empty"))
            .otherwise(F.lit("crawling"))
            .alias("f_state"),
            F.col("parsed.feed_pub_ts").alias("f_parsed_pub_ts"),
        )

        crawling = feeds_f.filter(
            F.col("body").isNotNull()
            & F.col("parsed.parse_ok")
            & (F.size("parsed.links") > 0)
        )
        items = explode_items(crawling.select("feed_canon", "admit_rank", "parsed"))
        items = (
            items.withColumn("url_canon", canonicalize_url("item_url"))
            .withColumn("item_host", url_host(F.col("url_canon"), canonical=True))
            .withColumn("item_hash", F.xxhash64("url_canon"))
        )
        w_dedup = Window.partitionBy("feed_canon", "url_canon").orderBy("item_idx")
        items = (
            items.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)  # deviation: reference crashes on dups
            .drop("__rn")
        )
        which = "bloom" if cfg.use_bloom else cfg.seen_filter
        bloom = None

        def probed_job():
            # the persisted-filter load (a small state-table read + collect)
            # is only needed by the probe, so it rides inside this thread
            # and overlaps the decode branch instead of serializing the tick
            nonlocal bloom
            bloom = self._load_filter(which, v, store_latest)
            # bucketed store: prune the probe scan to the candidates'
            # touched buckets (mirror of the fetch join's corpus pruning) —
            # the probe then reads ≤ |items| bucket dirs, never the whole
            # store. The collect lives INSIDE this thread so the decode
            # branch starts concurrently with it.
            probe_store = store_latest
            if cfg.seen_buckets > 0:
                touched = {
                    r["b"]
                    for r in items.select(
                        F.pmod(F.col("item_hash"), F.lit(cfg.seen_buckets))
                        .cast("int")
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                }
                probe_store = cat.read(
                    "seen_urls", v["seen_urls"], buckets=touched
                )
            return (
                probe(items, probe_store, hash_key="item_hash", bloom=bloom)
                .withColumn(
                    "fetch_flag",
                    should_fetch(
                        F.col("item_ts"),
                        F.when(F.col("__seen"), F.lit(1)),
                        F.col("stored_pub_ts"),
                    ),
                )
                .localCheckpoint(eager=True)
            )

        # the mid-tick phases form TWO independent chains given the
        # materialized ``fetched``: probe → enqueue-split (+ the
        # touched-host/bucket collect) on the feed branch, and decode →
        # article-upsert rows on the article branch. Each branch's second
        # phase is chained onto its first inside ONE pool, so the tick
        # pays max(probe+split, decode+articles) instead of
        # max(probe, decode) + articles + split — two serial job launches
        # fewer per tick (the structural attack on the serial-phase tick
        # floor short of a full streaming driver, NOTES.md round-5).
        arts = arts_f.drop("parsed").withColumn(
            "a_state",
            F.when(F.col("body").isNull(), F.lit("skipped"))        # P3 null page
            .when(F.col("caption_x").isNull(), F.lit("skipped"))    # P3 null extract
            .otherwise(F.lit("done")),
        )
        decoded_plan = decode_images(arts.filter(F.col("a_state") == "done"))

        # quota departures (count-after-departures __mid below): every
        # admitted row leaves pending in heads mode
        dec = (
            admitted.groupBy("host").agg(
                F.count(F.lit(1)).cast("long").alias("__dec")
            )
            if cfg.host_pending_cap > 0
            else None
        )

        def split_job(probed):
            """Feed-branch phase 2: new-task build → robots/quota split →
            rsplit checkpoint → touched-host frame + bucket-id collect."""
            w_sub = Window.partitionBy("feed_canon").orderBy("item_idx")
            new_tasks = (
                probed.filter(F.col("fetch_flag"))
                .withColumn("e_sub", F.row_number().over(w_sub) - 1)
                .select(
                    F.col("item_url").alias("url"),
                    "url_canon",
                    F.col("item_hash").alias("url_hash"),
                    F.col("item_host").alias("host"),
                    F.lit("article").alias("kind"),
                    "feed_canon",
                    F.col("item_ts").alias("parsed_pub_ts"),
                    F.lit(tick + 1).cast("int").alias("e_epoch"),
                    F.col("admit_rank").cast("int").alias("e_rank"),
                    F.col("e_sub").cast("int"),
                    priority_score(
                        1, F.col("item_ts"), cfg.depth_weight, cfg.recency_weight
                    ).alias("priority"),
                    F.lit("pending").alias("state"),
                    F.lit(None).cast("int").alias("fetch_epoch"),
                    F.lit(None).cast("int").alias("admit_rank"),
                )
            )

            # heads mode: robots gate at ENQUEUE — denied items never enter
            # the frontier (preserving the heads invariant); they
            # terminal-log this tick and count as processed for their feed.
            # Same final denied set, feed states, and stall totals as the
            # oracle's admission-time gate — denial is a static per-row
            # property.
            if heads_on:
                # per-tick enqueue gate: the probe side is ∝ this tick's
                # enqueues, so big-hosts mode semi-prunes the dim to those
                # hosts before broadcasting (dim bytes ∝ activity, never
                # |hosts|; the dim scan itself is a map-only column-pruned
                # parquet read of (host, robots_disallow))
                an0, dn0 = robots_split(
                    new_tasks, hosts,
                    dim_join="semi" if self._big_hosts else "broadcast",
                )
            else:
                an0 = new_tasks
                dn0 = self.tick_spark.createDataFrame([], S.FRONTIER_SCHEMA)
            if cfg.host_pending_cap > 0:
                # crawl-trap quota: a robots-allowed new task enters the
                # frontier only while its host's pending count stays <= cap.
                # Count-after-departures __mid = stored count − this tick's
                # admitted rows; position within the tick's arrivals is the
                # FIFO key order — the same deterministic order the oracle
                # consumes quota in. The hosts scan is map-only (broadcast
                # semi on the candidate hosts); the per-host math joins
                # back broadcast.
                cnt_cand = (
                    hosts.select("host", "pending_count")
                    .join(
                        F.broadcast(an0.select("host").distinct()),
                        "host",
                        "inner",
                    )
                    .join(F.broadcast(dec), "host", "left")
                    .select(
                        "host",
                        (
                            F.coalesce(F.col("pending_count"), F.lit(0))
                            - F.coalesce(F.col("__dec"), F.lit(0))
                        ).alias("__mid"),
                    )
                )
                wq = Window.partitionBy("host").orderBy(
                    "e_epoch", "e_rank", "e_sub"
                )
                an_tagged = (
                    an0.join(F.broadcast(cnt_cand), "host", "left")
                    .withColumn("__qpos", F.row_number().over(wq))
                    .withColumn(
                        "__g",
                        F.when(
                            F.col("__qpos")
                            + F.coalesce(F.col("__mid"), F.lit(0))
                            <= F.lit(cfg.host_pending_cap),
                            F.lit("a"),
                        ).otherwise(F.lit("q")),
                    )
                    .drop("__qpos", "__mid")
                )
            else:
                an_tagged = an0.withColumn("__g", F.lit("a"))
            # checkpoint the split ONCE (tag-union, same shape as the
            # gate): allowed_new/denied_new feed ~8 downstream plans
            # (frontier merge, heads maintenance, log rows, feed-count
            # deltas, metrics tags) and each un-checkpointed evaluation
            # would re-run the robots broadcast join + the e_sub window —
            # one materialization job replaces them
            rsplit = (
                an_tagged
                .unionByName(dn0.withColumn("__g", F.lit("d")))
                .localCheckpoint(eager=False)
            )
            # ONE job shared by the frontier merge and the heads
            # maintenance: the hosts whose frontier rows change this tick
            # (admitted-away ∪ newly enqueued ∪ denied-away) stay
            # DISTRIBUTED — a lazily-checkpointed frame the downstream
            # merges broadcast-join against — and only their distinct
            # BUCKET ids come back to the driver (bounded by the bucket
            # counts, never per-tick activity: at 10^6 admissions/epoch a
            # per-host collect would ship ~10^6 strings through the driver
            # twice per tick). The bucket collect triggers both lazy
            # checkpoints (rsplit, then th_hosts_df).
            th_hosts_df = None
            touched_fr = None
            tb_u = tb_hosts
            if cfg.frontier_buckets > 0:
                th_hosts_df = (
                    admitted.select("host")
                    .unionByName(
                        rsplit.filter(F.col("__g") == "a").select("host")
                    )
                    .unionByName(denied.select("host"))
                    .distinct()
                    .localCheckpoint(eager=False)
                )
                tb = (
                    th_hosts_df.select(
                        F.pmod(
                            F.xxhash64("host"), F.lit(cfg.frontier_buckets)
                        )
                        .cast("int")
                        .alias("__b"),
                        F.pmod(
                            F.xxhash64("host"), F.lit(max(cfg.hosts_buckets, 1))
                        )
                        .cast("int")
                        .alias("__hb"),
                    )
                    .distinct()
                    .collect()
                )
                touched_fr = {r["__b"] for r in tb}
                if cfg.host_pending_cap > 0 and cfg.hosts_buckets > 0:
                    # quota mode touches the enqueued hosts' count rows too
                    tb_u = tb_hosts | {r["__hb"] for r in tb}
            return rsplit, th_hosts_df, touched_fr, tb_u

        def art_job(decoded):
            """Article-branch phase 2: prior-row lookup → upsert rows,
            eagerly checkpointed. Same no-store-shuffle shape as the probe:
            prune the store scan to the decoded keys' buckets, inner-join
            it against the broadcast (tiny, ≤ workers rows) decoded key
            set, broadcast the hits back."""
            prior_store = store_latest
            if cfg.seen_buckets > 0:
                # tb_articles came free with the gate stats job: the
                # admitted articles' buckets ⊇ the decoded keys' buckets,
                # and extra buckets only add prior rows the inner join
                # below discards
                prior_store = cat.read(
                    "seen_urls", v["seen_urls"], buckets=tb_articles
                )
            prior = prior_store.select(
                F.col("url_canon").alias("__pk"),
                F.col("article_id").alias("prior_id"),
            ).join(
                F.broadcast(
                    decoded.select(F.col("url_canon").alias("__pk")).distinct()
                ),
                on="__pk",
                how="inner",
            )
            return (
                decoded.join(
                    F.broadcast(prior),
                    decoded["url_canon"] == F.col("__pk"),
                    "left",
                )
                .select(
                    "url_canon",
                    "url_hash",
                    F.col("prior_id").alias("article_id"),
                    F.col("parsed_pub_ts").alias("pub_ts"),
                    F.col("caption_x").alias("caption"),
                    "feed_canon",
                    F.when(F.col("__pk").isNotNull(), F.lit("update"))
                    .otherwise(F.lit("insert"))
                    .alias("action"),
                    F.lit(tick).cast("int").alias("epoch"),
                    "phash",
                    "w",
                    "h",
                    "fmt",
                    "pixels",
                    "dec_phash",
                    host_bucket(F.col("host"), cfg.num_host_buckets).alias(
                        "host_bucket"
                    ),
                )
                # eager: four concurrent writers consume this frame (seen
                # merge source + its broadcast keys, articles append,
                # filter delta) — one materialization replaces their
                # repeated broadcast (prior ⋈ decoded) rebuilds and keeps
                # the write pool's job count deterministic (a lazy
                # first-touch race could double-compute)
                .localCheckpoint(eager=True)
            )

        with ThreadPoolExecutor(max_workers=4) as ck_pool:
            f_probed = ck_pool.submit(probed_job)
            f_decoded = ck_pool.submit(
                lambda: decoded_plan.localCheckpoint(eager=True)
            )
            f_split = ck_pool.submit(lambda: split_job(f_probed.result()))
            f_art = ck_pool.submit(lambda: art_job(f_decoded.result()))
            probed = f_probed.result()
            decoded = f_decoded.result()
            rsplit, th_hosts_df, touched_fr, tb_hosts_u = f_split.result()
            article_rows = f_art.result()
        _mark("probe_decode")

        allowed_new = rsplit.filter(F.col("__g") == "a").drop("__g")
        denied_new = rsplit.filter(F.col("__g") == "d").drop("__g")
        quota_denied = rsplit.filter(F.col("__g") == "q").drop("__g")
        new_tasks = rsplit.drop("__g")  # allowed ∪ robots-denied ∪ quota-denied == the full set

        # ---- frontier state transitions ----------------------------------
        # The frontier table holds ONLY pending tasks; terminal transitions
        # append to frontier_log. Per-epoch frontier I/O is therefore
        # proportional to the ACTIVE frontier, not the ever-growing total —
        # at a 10^10-URL crawl the all-states rewrite would dominate epoch
        # cost. (Reference analog: tasks leave HttpManager.taskList on
        # completion, HttpManager.scala:76-94.)
        key = ["url_canon", "e_epoch", "e_rank", "e_sub"]
        base = [f.name for f in S.FRONTIER_SCHEMA.fields]
        carried = [c for c in base if c not in ("state", "fetch_epoch", "admit_rank")]

        def terminal(df, state_col, fetch_epoch_col, admit_rank_col):
            return df.select(
                *carried,
                state_col.alias("state"),
                fetch_epoch_col.cast("int").alias("fetch_epoch"),
                admit_rank_col.cast("int").alias("admit_rank"),
            ).select(*base)

        log_rows = (
            terminal(
                feeds_f, F.lit("fetched"), F.lit(tick), F.col("admit_rank")
            )
            .unionByName(
                terminal(
                    arts,
                    F.when(F.col("a_state") == "done", F.lit("done")).otherwise(
                        F.lit("skipped")
                    ),
                    F.lit(tick),
                    F.col("admit_rank"),
                )
            )
            .unionByName(
                terminal(
                    denied,
                    F.lit("robots_denied"),
                    F.lit(None),
                    F.lit(None),
                )
            )
            .unionByName(
                terminal(
                    denied_new,
                    F.lit("robots_denied"),
                    F.lit(None),
                    F.lit(None),
                )
            )
            .unionByName(
                terminal(
                    quota_denied,
                    F.lit("quota_denied"),
                    F.lit(None),
                    F.lit(None),
                )
            )
        )
        # ``host`` rides along so the bucketed-frontier merge can compute
        # the deletes' touched buckets (bucket key = xxhash64(host))
        pkey = [*key, "host"]
        processed = (
            feeds_f.select(*pkey)
            .unionByName(arts.select(*pkey))
            .unionByName(denied.select(*pkey))
        )
        frontier_new = (
            frontier.join(processed.select(*key), on=key, how="left_anti")
            .select(*base)
            .unionByName(allowed_new)
        )

        # ---- hosts politeness state (A4) ---------------------------------
        # only the admitted hosts change last_access_epoch this tick; the
        # bucketed path merges just those rows (read+write ∝ touched
        # buckets — ref: hostAccessMap point update, HttpManager.scala:
        # 122-124). The legacy path keeps the full copy-on-write snapshot.
        # With the quota guard on, the same merge also moves the per-host
        # pending counts: −admitted (left pending) +quota-allowed enqueues,
        # over admitted ∪ enqueued hosts (the th set) — write I/O stays
        # ∝ this tick's active hosts, never |hosts|.
        admitted_hosts = admitted.select("host").distinct()
        if cfg.host_pending_cap > 0:
            inc = allowed_new.groupBy("host").agg(
                F.count(F.lit(1)).cast("long").alias("__inc")
            )
            count_cols = (
                F.coalesce(F.col("pending_count"), F.lit(0))
                - F.coalesce(F.col("__dec"), F.lit(0))
                + F.coalesce(F.col("__inc"), F.lit(0))
            ).alias("pending_count")
            if cfg.hosts_buckets > 0:
                hosts_upd = (
                    self._read_hosts(v, buckets=tb_hosts_u)
                    .join(F.broadcast(th_hosts_df), "host", "inner")
                    .join(
                        F.broadcast(
                            admitted_hosts.withColumn(
                                "__la", F.lit(tick).cast("int")
                            )
                        ),
                        "host",
                        "left",
                    )
                    .join(F.broadcast(dec), "host", "left")
                    .join(F.broadcast(inc), "host", "left")
                    .withColumn(
                        "last_access_epoch",
                        F.coalesce("__la", "last_access_epoch"),
                    )
                    .withColumn("pending_count", count_cols)
                    .select(*[f.name for f in S.HOSTS_SCHEMA.fields])
                )
            else:
                hosts_upd = (
                    hosts.join(
                        admitted_hosts.withColumn(
                            "__la", F.lit(tick).cast("int")
                        ),
                        "host",
                        "left",
                    )
                    .join(F.broadcast(dec), "host", "left")
                    .join(F.broadcast(inc), "host", "left")
                    .withColumn(
                        "last_access_epoch",
                        F.coalesce("__la", "last_access_epoch"),
                    )
                    .withColumn("pending_count", count_cols)
                    .select(*[f.name for f in S.HOSTS_SCHEMA.fields])
                )
        elif cfg.hosts_buckets > 0:
            hosts_upd = (
                self._read_hosts(v, buckets=tb_hosts)
                .join(F.broadcast(admitted_hosts), "host", "inner")
                .withColumn("last_access_epoch", F.lit(tick).cast("int"))
                .select(*[f.name for f in S.HOSTS_SCHEMA.fields])
            )
        else:
            hosts_upd = (
                hosts.join(
                    admitted_hosts.withColumn("__la", F.lit(tick).cast("int")),
                    "host",
                    "left",
                )
                .withColumn(
                    "last_access_epoch", F.coalesce("__la", "last_access_epoch")
                )
                .drop("__la")
                .select(*[f.name for f in S.HOSTS_SCHEMA.fields])
            )

        # ---- feeds table: outcomes + watermark completion (A1/A2/S7) -----
        fu = feed_out.unionByName(
            denied.filter(F.col("kind") == "feed").select(
                F.col("url_canon").alias("u_feed"),
                F.lit("dead").alias("f_state"),
                F.lit(None).cast("timestamp").alias("f_parsed_pub_ts"),
            )
        )
        if cfg.feeds_buckets > 0:
            # touched-rows-only update: every key fu / the countdown deltas
            # touch is a gate row's feed_canon, so the pruned read +
            # inner join reads ∝ touched buckets, never |feeds|. Untouched
            # rows are IDENTITY under the update below (their coalesces and
            # zero count deltas change nothing; a crawling feed always has
            # pending_items > 0 until the tick that completes it, and that
            # tick lists it in fu or the counts), so merging only touched
            # rows is exactly the full-table pass.
            feeds_t = cat.read("feeds", v["feeds"], buckets=tb_feeds)
        else:
            feeds_t = cat.read("feeds", v["feeds"])
        feeds_mid = feeds_t.join(
            fu, feeds_t["feed_canon"] == fu["u_feed"], "left"
        ).select(
            "feed_canon",
            "url",
            "host",
            "seed_idx",
            F.coalesce("f_state", "state").alias("state"),
            F.coalesce("f_parsed_pub_ts", "parsed_pub_ts").alias("parsed_pub_ts"),
            "last_pub_ts",
            "done_epoch",
            "pending_items",
            "last_progress_epoch",
        )
        # A1 countdown, incremental (parsedItemsMap.size analog): per-feed
        # pending count = prior count + enqueued − processed articles — only
        # this tick's small frames aggregate; the pending frontier is NEVER
        # re-scanned per feed. The enqueue count, processed count, and
        # progress clock fold into ONE tagged union + ONE aggregate (one
        # broadcast join below instead of three): enqueues and processed
        # items tick the progress clock at ``tick``; robots denials tick it
        # at their ENQUEUE epoch (e_epoch-1), which makes the legacy
        # admission-time and the heads-mode enqueue-time denial paths agree
        # with the oracle on one clock (oracle/refsim.py progress()).
        # Enqueue-time denials (heads mode) process for their feed in the
        # same tick they were counted as enqueued — net-zero on the
        # countdown, same final states as the oracle's t+1 processing.
        def _delta(df, e, d, pc):
            return df.select(
                "feed_canon",
                F.lit(e).alias("__e"),
                F.lit(d).alias("__d"),
                pc.cast("int").alias("__pc"),
            )

        feed_deltas = (
            _delta(new_tasks, 1, 0, F.lit(tick))
            .unionByName(_delta(arts, 0, 1, F.lit(tick)))
            .unionByName(
                _delta(
                    denied.filter(F.col("kind") == "article"),
                    0, 1, F.col("e_epoch") - 1,
                )
            )
            .unionByName(_delta(denied_new, 0, 1, F.col("e_epoch") - 1))
            # quota-denied items mirror enqueue-time robots denials exactly:
            # enqueued-and-processed in one tick, net-zero on the countdown
            .unionByName(_delta(quota_denied, 0, 1, F.col("e_epoch") - 1))
            .groupBy("feed_canon")
            .agg(
                F.sum("__e").alias("__enq"),
                F.sum("__d").alias("__done"),
                F.max("__pc").alias("__prog"),
            )
        )
        np_col = (
            F.coalesce(F.col("pending_items"), F.lit(0))
            + F.coalesce(F.col("__enq"), F.lit(0))
            - F.coalesce(F.col("__done"), F.lit(0))
        )
        completing = (F.col("state") == "crawling") & (np_col == 0)
        feeds_new = (
            feeds_mid.join(F.broadcast(feed_deltas), "feed_canon", "left")
            .select(
                "feed_canon",
                "url",
                "host",
                "seed_idx",
                F.when(completing, F.lit("done")).otherwise(F.col("state")).alias(
                    "state"
                ),
                "parsed_pub_ts",
                F.when(completing, F.col("parsed_pub_ts"))
                .otherwise(F.col("last_pub_ts"))
                .alias("last_pub_ts"),
                F.when(completing, F.lit(tick).cast("int"))
                .otherwise(F.col("done_epoch"))
                .alias("done_epoch"),
                np_col.cast("int").alias("pending_items"),
                F.greatest(F.col("last_progress_epoch"), F.col("__prog"))
                .cast("int")
                .alias("last_progress_epoch"),
            )
        )

        # ---- per-bucket metrics (north_star observability) ----------------
        # incremental: politeness_stalls derives from the maintained
        # per-bucket pending counts (pending' = pending − processed +
        # enqueued) instead of re-scanning the full pending frontier — only
        # this tick's small activity frames aggregate (one union + one hash
        # aggregate, collected: ≤ num_host_buckets rows)
        B = cfg.num_host_buckets

        def tag(df, t, col="host"):
            return df.select(
                host_bucket(F.col(col), B).alias("host_bucket"),
                F.lit(t).alias("__m"),
            )

        tagged = (
            tag(admitted, "f")
            .unionByName(tag(probed.filter(F.col("__seen")), "d", col="item_host"))
            .unionByName(tag(new_tasks, "e"))
            .unionByName(tag(denied, "r"))
            # "q" = enqueue-time robots denials (heads mode): counted as
            # enqueued (oracle parity) but never pending — they cancel out
            # of the pending-count recurrence and are reported in the
            # robots_denied metric column alongside pending-side denials
            .unionByName(tag(denied_new, "q"))
            # "x" = host-quota denials: same never-pending accounting; they
            # appear only in the terminal log, not in a metric column
            .unionByName(tag(quota_denied, "x"))
        )

        def m(t):
            return F.sum(F.when(F.col("__m") == t, 1).otherwise(0))

        # the activity aggregate is an independent job over materialized
        # frames, so its collect runs INSIDE the concurrent-write pool
        # below (w_metrics) and overlaps the snapshot writes instead of
        # occupying a serial phase; the metrics write chains behind its
        # own collect within the same pool slot
        metrics_out = {}

        def w_metrics():
            act = {
                r["host_bucket"]: r
                for r in tagged.groupBy("host_bucket")
                .agg(
                    m("f").alias("f"),
                    m("d").alias("d"),
                    m("e").alias("e"),
                    m("r").alias("r"),
                    m("q").alias("q"),
                    m("x").alias("x"),
                )
                .collect()
            }
            new_counts = dict(pending_counts)
            metric_rows = []
            for b in sorted(
                set(act) | {b for b, n in pending_counts.items() if n > 0}
            ):
                a = act.get(b)
                f_, d_, e_, r_, q_, x_ = (
                    (a["f"], a["d"], a["e"], a["r"], a["q"], a["x"])
                    if a is not None
                    else (0, 0, 0, 0, 0, 0)
                )
                p = pending_counts.get(b, 0)
                # stalls = pending rows left waiting (enqueue denials were
                # never pending, so q_ does not enter); robots_denied
                # reports both denial paths; the pending recurrence nets
                # out q_ (robots) and x_ (quota) from e_ (denied items
                # were counted as enqueued)
                metric_rows.append((tick, b, f_, p - f_ - r_, d_, e_, r_ + q_))
                nb = p - f_ - r_ + e_ - q_ - x_
                if nb:
                    new_counts[b] = nb
                else:
                    new_counts.pop(b, None)
            metrics_out["counts"] = new_counts
            metrics_new = self.tick_spark.createDataFrame(
                metric_rows, S.METRICS_SCHEMA
            )
            return cat.write(
                "metrics", metrics_new.coalesce(small), mode="append",
                base_version=v["metrics"],
            )

        # ---- error quarantine (S8) ----------------------------------------
        # the reference dumps the offending payload to a numbered file on
        # parse and extraction failures (util/ErrorDumping.scala:17-27 from
        # ParsingManager.scala:40-45 / ExtractionManager.scala:37-42); here
        # the payload rides in the errors table's payload column. Decode
        # errors carry no text payload (the input is binary pixels).
        err_cols = [f.name for f in S.ERRORS_SCHEMA.fields]
        errors_new = (
            decoded.filter(F.col("decode_error").isNotNull())
            .select(
                F.lit(tick).cast("int").alias("epoch"),
                F.lit("decode").alias("stage"),
                "url_canon",
                F.col("decode_error").alias("error"),
                F.lit(None).cast("string").alias("payload"),
            )
            .unionByName(
                feeds_f.filter(
                    F.col("body").isNotNull() & ~F.col("parsed.parse_ok")
                ).select(
                    F.lit(tick).cast("int").alias("epoch"),
                    F.lit("parse").alias("stage"),
                    "url_canon",
                    F.lit("feed parse failure").alias("error"),
                    F.col("body").alias("payload"),
                )
            )
            .unionByName(
                arts.filter(
                    F.col("body").isNotNull() & F.col("caption_x").isNull()
                ).select(
                    F.lit(tick).cast("int").alias("epoch"),
                    F.lit("extract").alias("stage"),
                    "url_canon",
                    F.lit("null caption extract").alias("error"),
                    F.col("body").alias("payload"),
                )
            )
            .select(*err_cols)
        )

        # ---- snapshot commits ---------------------------------------------
        # every target is a DIFFERENT table (no manifest races) and every
        # input is either a materialized checkpoint or a deterministic plan,
        # so the eight snapshot writes are submitted CONCURRENTLY — Spark's
        # scheduler overlaps the jobs and the epoch pays ~max(write) instead
        # of Σ(write). The epoch manifest (commit_epoch, by the caller) is
        # still the single atomic commit point.
        from concurrent.futures import ThreadPoolExecutor

        # incremental seen-store merge: this epoch's upserts replace their
        # old rows (anti-join) — per-epoch work ∝ |seen| copy, never a
        # window over the whole articles history; with a bucketed catalog
        # only touched buckets rewrite
        seen_upserts = article_rows.select(
            "url_canon", "url_hash", "article_id", "pub_ts"
        )

        def w_seen():
            if cfg.seen_buckets > 0:
                # rewrite only touched buckets: per-epoch I/O ∝ upserts.
                # tb_articles (from the gate stats job) ⊇ the upsert keys'
                # buckets, so the merge skips its touch-collect job.
                return cat.merge_bucketed(
                    "seen_urls",
                    seen_upserts,
                    on="url_canon",
                    base_version=v["seen_urls"],
                    touched=tb_articles,
                )
            seen_new = store_latest.join(
                F.broadcast(seen_upserts.select("url_canon")),
                "url_canon",
                "left_anti",
            ).unionByName(seen_upserts)
            return cat.write(
                "seen_urls",
                seen_new.coalesce(self.spark.sparkContext.defaultParallelism),
            )

        # coalesce each snapshot to a sane file/task count: per-epoch state
        # frames are unions of several 32-partition parents, so an
        # uncoalesced write schedules 96-256 near-empty tasks (pure
        # scheduling overhead at small epochs, tiny-file bloat at any
        # scale). Dimension tables get few files; row tables get one file
        # per core. Tune with num_host_buckets on a real cluster.
        def w_frontier():
            if cfg.frontier_buckets > 0:
                # touched-bucket state transition: write ∝ active hosts;
                # touched_fr (the shared th collect) covers both the
                # inserts' and the deletes' hosts, skipping the merge's
                # touch-collect job
                return cat.merge_bucketed(
                    "frontier",
                    allowed_new,
                    on=key,
                    deletes=processed,
                    base_version=v["frontier"],
                    touched=touched_fr,
                )
            return cat.write("frontier", frontier_new.coalesce(big))

        def w_hosts():
            if cfg.hosts_buckets > 0:
                # rewrite only the admitted hosts' buckets (∪ the enqueued
                # hosts' count-row buckets when the quota guard is on)
                return cat.merge_bucketed(
                    "hosts", hosts_upd, on="host",
                    base_version=v["hosts"], touched=tb_hosts_u,
                )
            return cat.write("hosts", hosts_upd.coalesce(small))

        def w_feeds():
            if cfg.feeds_buckets > 0:
                # feeds_new holds (only) the touched buckets' updated rows
                return cat.merge_bucketed(
                    "feeds", feeds_new, on="feed_canon",
                    base_version=v["feeds"], touched=tb_feeds,
                )
            return cat.write("feeds", feeds_new.coalesce(small))

        def w_heads():
            # incremental head maintenance: only hosts whose pending set
            # changed this tick (their head was admitted away, or new
            # tasks arrived) can have a different head — recompute top-1
            # for exactly those hosts from their bucket-pruned frontier
            # rows and merge just their buckets. Read I/O ∝ touched
            # buckets + this tick's frames, NEVER O(|pending|); every
            # other host's head row carries over untouched. The host set
            # is the shared th_hosts_df checkpoint (gate denials are empty
            # in heads mode, so it is exactly admitted ∪ allowed_new
            # hosts) — a distributed frame, never a driver collect.
            if not touched_fr:
                return v["frontier_heads"]
            touched_hb = touched_fr
            th_df = th_hosts_df
            live = (
                cat.read("frontier", v["frontier"], buckets=touched_hb)
                .filter(F.col("state") == "pending")
                .join(F.broadcast(th_df), "host", "left_semi")
                .join(
                    F.broadcast(processed.select(*key)), on=key, how="left_anti"
                )
                .select(*base)
                .unionByName(allowed_new.select(*base))
            )
            heads_new = head_candidates(live, cfg.salt_partitions)
            return cat.merge_bucketed(
                "frontier_heads",
                heads_new,
                on="host",
                base_version=v["frontier_heads"],
                deletes=th_df,
                touched=touched_hb,
            )

        P = self.spark.sparkContext.defaultParallelism
        small, big = min(8, P), P
        jobs = {
            "frontier": w_frontier,
            "frontier_log": lambda: cat.write(
                "frontier_log", log_rows.coalesce(small), mode="append",
                base_version=v["frontier_log"],
            ),
            "seen_urls": w_seen,
            "hosts": w_hosts,
            "feeds": w_feeds,
            "articles": lambda: cat.append_bucketed(
                "articles", article_rows, key="host_bucket",
                num_buckets=cfg.num_host_buckets,
                base_version=v["articles"],  # north_star pixel/caption sink
            ),
            "metrics": w_metrics,
            "errors": lambda: cat.write(
                "errors", errors_new.coalesce(small), mode="append",
                base_version=v["errors"]
            ),
        }
        if bloom is not None:
            jobs["seen_filter"] = lambda: self._persist_filter(
                which, bloom, seen_upserts
            )
        if heads_on:
            jobs["frontier_heads"] = w_heads
        nv = dict(v)
        spec_fut = None
        with ThreadPoolExecutor(max_workers=len(jobs) + 1) as pool:
            futs = {name: pool.submit(fn) for name, fn in jobs.items()}
            if heads_on and cfg.speculative_gate:
                # pipeline tick t+1's gate into this write window: as soon
                # as the (small, fast) heads + hosts merges land, compute
                # next tick's admission from the committed snapshots while
                # the big merges (seen store, frontier) are still in
                # flight. Best-effort: any failure just means the next
                # tick computes its own gate.
                def w_spec():
                    try:
                        hv = futs["frontier_heads"].result()
                        ov = futs["hosts"].result()
                        heads_n = cat.read("frontier_heads", hv)
                        hosts_n = cat.read("hosts", ov)
                        adm = admit_heads(
                            heads_n, hosts_n, tick + 1, cfg.workers,
                            dim_join="shuffle" if self._big_hosts else "broadcast",
                        )
                        den = self.tick_spark.createDataFrame(
                            [], S.FRONTIER_SCHEMA
                        )
                        g, gs = self._gate_and_stats(adm, den)
                        return ((tick + 1, hv, ov), g, gs)
                    except Exception as e:
                        # degrade to per-tick recompute, but LOUDLY: a
                        # persistent bug here would otherwise silently cost
                        # the pipelining win every tick
                        import logging

                        logging.getLogger(__name__).warning(
                            "speculative gate for tick %d failed "
                            "(next tick recomputes): %s", tick + 1, e
                        )
                        return None

                spec_fut = pool.submit(w_spec)
            for name, fut in futs.items():
                nv[name] = fut.result()
        if spec_fut is not None:
            self._spec_gate = spec_fut.result()
        _mark("writes")

        summary = {
            "epoch": tick,
            "admitted": n_admitted,
            "robots_denied": n_denied,
        }
        return nv, summary, metrics_out["counts"]

    # --------------------------------------------------- liveness guard

    def _quarantine_stalled(self, tick: int, v: dict[str, int]) -> dict[str, int]:
        """Move every still-pending row into the ``errors`` quarantine and
        the frontier log (state='stalled'), and kill feeds with stalled
        items — the bulk analog of the reference's per-feed ReceiveTimeout
        (FeedManager.scala:31-33,67-69)."""
        cat = self.cat
        frontier = cat.read("frontier", v["frontier"])
        stuck = frontier.filter(F.col("state") == "pending").localCheckpoint(
            eager=True
        )
        base = [f.name for f in S.FRONTIER_SCHEMA.fields]
        carried = [c for c in base if c not in ("state",)]
        log_rows = stuck.select(
            *carried, F.lit("stalled").alias("state")
        ).select(*base)
        errors_new = stuck.select(
            F.lit(tick).cast("int").alias("epoch"),
            F.lit("stall_timeout").alias("stage"),
            "url_canon",
            F.concat(
                F.lit("no admissible host for "),
                F.lit(self.cfg.stall_timeout_epochs).cast("string"),
                F.lit(" epochs"),
            ).alias("error"),
            F.lit(None).cast("string").alias("payload"),
        )
        stuck_feeds = stuck.select(
            F.coalesce("feed_canon", "url_canon").alias("fc")
        ).distinct()
        feeds_t = cat.read("feeds", v["feeds"])
        feeds_new = feeds_t.join(
            stuck_feeds, feeds_t["feed_canon"] == F.col("fc"), "left"
        ).select(
            "feed_canon",
            "url",
            "host",
            "seed_idx",
            F.when(
                F.col("fc").isNotNull()
                & ~F.col("state").isin("done", "done_empty"),
                F.lit("dead"),
            )
            .otherwise(F.col("state"))
            .alias("state"),
            "parsed_pub_ts",
            "last_pub_ts",
            "done_epoch",
            "pending_items",
            "last_progress_epoch",
        )
        nv = dict(v)
        remaining = frontier.filter(F.col("state") != "pending")
        if self.cfg.frontier_buckets > 0:
            nv["frontier"] = cat.write_bucketed(
                "frontier", remaining, key="xxhash64(host)",
                num_buckets=self.cfg.frontier_buckets,
            )
        else:
            nv["frontier"] = cat.write("frontier", remaining)
        if "frontier_heads" in v:
            # every pending row just left the frontier — no heads remain
            nv["frontier_heads"] = cat.write_bucketed(
                "frontier_heads",
                self.tick_spark.createDataFrame([], S.FRONTIER_SCHEMA),
                key="xxhash64(host)",
                num_buckets=self.cfg.frontier_buckets,
            )
        nv["frontier_log"] = cat.write(
            "frontier_log", log_rows, mode="append",
            base_version=v["frontier_log"],
        )
        nv["errors"] = cat.write(
            "errors", errors_new, mode="append", base_version=v["errors"]
        )
        if self.cfg.feeds_buckets > 0:
            nv["feeds"] = cat.write_bucketed(
                "feeds", feeds_new, key="xxhash64(feed_canon)",
                num_buckets=self.cfg.feeds_buckets,
            )
        else:
            nv["feeds"] = cat.write("feeds", feeds_new)
        return nv

    def _sweep_stalled_feeds(
        self, tick: int, v: dict[str, int], counts: dict[int, int]
    ):
        """Per-feed liveness guard (the bulk analog of the reference's
        per-actor ReceiveTimeout, FeedManager.scala:31-33,67-69): at every
        ``feed_stall_epochs``-th tick, quarantine feeds whose countdown
        clock made no progress for >= that many epochs — their pending
        rows move to ``errors`` (stage='feed_timeout') + the terminal log
        (state='stalled') and the feed dies, while every other feed keeps
        crawling. The oracle runs the identical deterministic rule
        (oracle/refsim.py), so e2e equality holds through a quarantine.

        Scale shape: the feeds scan is amortized by the sweep cadence and
        the frontier filter is the rare remediation path; the bucketed
        frontier/heads/feeds merges stay ∝ the stalled rows' buckets.
        Returns (new_versions, new_counts), or None when nothing stalled.
        """
        cfg, cat = self.cfg, self.cat
        N = cfg.feed_stall_epochs
        B_feeds = max(cfg.feeds_buckets, 1)
        stalled = (
            cat.read("feeds", v["feeds"])
            .filter(
                (F.col("state") == "crawling")
                & (F.col("pending_items") > 0)
                & F.col("last_progress_epoch").isNotNull()
                & (F.col("last_progress_epoch") <= F.lit(tick - N))
            )
            .select(
                "feed_canon",
                F.pmod(F.xxhash64("feed_canon"), F.lit(B_feeds))
                .cast("int")
                .alias("__fb"),
            )
            .collect()
        )
        if not stalled:
            return None
        fc_df = self.tick_spark.createDataFrame(
            [(r["feed_canon"],) for r in stalled], "feed_canon string"
        )
        tb_feeds = {r["__fb"] for r in stalled}
        frontier = cat.read("frontier", v["frontier"])
        stuck = (
            frontier.filter(F.col("state") == "pending")
            .join(F.broadcast(fc_df), "feed_canon", "left_semi")
            .localCheckpoint(eager=True)
        )
        base = [f.name for f in S.FRONTIER_SCHEMA.fields]
        key = ["url_canon", "e_epoch", "e_rank", "e_sub"]
        log_rows = stuck.withColumn("state", F.lit("stalled")).select(*base)
        errors_new = stuck.select(
            F.lit(tick).cast("int").alias("epoch"),
            F.lit("feed_timeout").alias("stage"),
            "url_canon",
            F.concat(
                F.lit("feed made no progress for "),
                F.lit(N).cast("string"),
                F.lit(" epochs"),
            ).alias("error"),
            F.lit(None).cast("string").alias("payload"),
        )
        nv = dict(v)
        if cfg.frontier_buckets > 0:
            nv["frontier"] = cat.merge_bucketed(
                "frontier", stuck.limit(0), on=key, deletes=stuck,
                base_version=v["frontier"],
            )
        else:
            nv["frontier"] = cat.write(
                "frontier",
                frontier.join(stuck.select(*key), on=key, how="left_anti"),
            )
        if "frontier_heads" in v:
            # the stalled rows' hosts may have lost their head — recompute
            # top-1 for exactly those hosts from the post-delete frontier
            # same shape as the tick's th_hosts_df: hosts stay distributed,
            # only bucket ids reach the driver
            th_df = stuck.select("host").distinct().localCheckpoint(eager=False)
            touched_hb = {
                r["__b"]
                for r in th_df.select(
                    F.pmod(F.xxhash64("host"), F.lit(cfg.frontier_buckets))
                    .cast("int")
                    .alias("__b")
                )
                .distinct()
                .collect()
            }
            live = (
                cat.read("frontier", nv["frontier"], buckets=touched_hb)
                .filter(F.col("state") == "pending")
                .join(F.broadcast(th_df), "host", "left_semi")
            )
            nv["frontier_heads"] = cat.merge_bucketed(
                "frontier_heads",
                head_candidates(live, cfg.salt_partitions),
                on="host",
                base_version=v["frontier_heads"],
                deletes=th_df,
                touched=touched_hb,
            )
        nv["frontier_log"] = cat.write(
            "frontier_log", log_rows, mode="append",
            base_version=v["frontier_log"],
        )
        nv["errors"] = cat.write(
            "errors", errors_new, mode="append", base_version=v["errors"]
        )
        feed_fields = [f.name for f in S.FEEDS_SCHEMA.fields]
        if cfg.feeds_buckets > 0:
            feeds_upd = (
                cat.read("feeds", v["feeds"], buckets=tb_feeds)
                .join(F.broadcast(fc_df), "feed_canon", "left_semi")
                .withColumn("state", F.lit("dead"))
                .select(*feed_fields)
            )
            nv["feeds"] = cat.merge_bucketed(
                "feeds", feeds_upd, on="feed_canon",
                base_version=v["feeds"], touched=tb_feeds,
            )
        else:
            feeds_all = cat.read("feeds", v["feeds"])
            feeds_upd = (
                feeds_all.join(
                    F.broadcast(fc_df.withColumn("__s", F.lit(1))),
                    "feed_canon",
                    "left",
                )
                .withColumn(
                    "state",
                    F.when(F.col("__s").isNotNull(), F.lit("dead")).otherwise(
                        F.col("state")
                    ),
                )
                .drop("__s")
                .select(*feed_fields)
            )
            nv["feeds"] = cat.write(
                "feeds", feeds_upd.localCheckpoint(eager=True)
            )
        if cfg.host_pending_cap > 0:
            # quota counts: the quarantined rows left pending — decrement
            # their hosts (merge ∝ the stalled rows' host buckets)
            sdec = stuck.groupBy("host").agg(
                F.count(F.lit(1)).cast("long").alias("__sdec")
            )
            hfields = [f.name for f in S.HOSTS_SCHEMA.fields]
            new_pc = (
                F.coalesce(F.col("pending_count"), F.lit(0))
                - F.coalesce(F.col("__sdec"), F.lit(0))
            )
            if cfg.hosts_buckets > 0:
                h_df = stuck.select("host").distinct().localCheckpoint(
                    eager=False
                )
                tb_h = {
                    r["__hb"]
                    for r in h_df.select(
                        F.pmod(F.xxhash64("host"), F.lit(cfg.hosts_buckets))
                        .cast("int")
                        .alias("__hb")
                    )
                    .distinct()
                    .collect()
                }
                hosts_upd = (
                    self._read_hosts(v, buckets=tb_h)
                    .join(F.broadcast(h_df), "host", "inner")
                    .join(F.broadcast(sdec), "host", "left")
                    .withColumn("pending_count", new_pc)
                    .select(*hfields)
                )
                nv["hosts"] = cat.merge_bucketed(
                    "hosts", hosts_upd, on="host",
                    base_version=v["hosts"], touched=tb_h,
                )
            else:
                hosts_upd = (
                    self._read_hosts(v)
                    .join(F.broadcast(sdec), "host", "left")
                    .withColumn("pending_count", new_pc)
                    .select(*hfields)
                )
                nv["hosts"] = cat.write("hosts", hosts_upd)
        removed = stuck.groupBy(
            host_bucket(F.col("host"), cfg.num_host_buckets).alias("b")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
        new_counts = dict(counts)
        for r in removed:
            nb = new_counts.get(r["b"], 0) - r["n"]
            if nb:
                new_counts[r["b"]] = nb
            else:
                new_counts.pop(r["b"], None)
        return nv, new_counts

    # -------------------------------------------------------------- run

    def run(self, resume: bool = True, progress: bool = False) -> dict:
        cat, cfg = self.cat, self.cfg
        last = cat.last_epoch() if resume else -1
        if last < 0:
            versions = self.init_state()
            last = 0
        else:
            versions = cat.epoch_tables(last)
            if self._big_hosts is None:
                # hosts-dim join mode: the count persisted at init rides the
                # snapshot meta through every merge; a pre-count workdir
                # counts once per run (never per tick)
                n = cat.meta("hosts", versions["hosts"]).get("n_hosts")
                if n is None:
                    n = cat.read("hosts", versions["hosts"]).count()
                self._big_hosts = n > cfg.hosts_broadcast_max
            if "frontier_heads" in versions and not self._heads_mode():
                # resumed under a config the heads invariant can't hold
                # (starvation guard on, or heads disabled): drop the table
                # from tracking so no tick ever reads a stale heads version
                versions = {
                    k: n for k, n in versions.items() if k != "frontier_heads"
                }
        if "robots_updates" in versions and not self._ru_epochs:
            # resume: load the persisted schedule's distinct effective
            # epochs once (metadata-sized) — the per-tick due-check is then
            # pure driver logic, zero jobs on non-update ticks
            self._ru_epochs = sorted(
                r["effective_epoch"]
                for r in cat.read("robots_updates", versions["robots_updates"])
                .select("effective_epoch")
                .distinct()
                .collect()
            )
        # per-bucket pending counts: resume from the epoch manifest meta;
        # a workdir from before the counts existed recomputes them ONCE
        emeta = cat.epoch_meta(last)
        # robots refresh high-water mark: every update with effective_epoch
        # <= this is already folded into the committed hosts snapshot. A
        # manifest without the marker (compaction commits, old layouts)
        # re-applies from 0 — safe because application is idempotent
        # (latest-non-null-wins over the schedule prefix).
        ru_applied = int(emeta.get("robots_applied_through", 0) or 0)
        if cfg.host_pending_cap > 0 and int(emeta.get("host_pending_cap", 0) or 0) == 0:
            # the quota knob flipped ON over a workdir whose earlier ticks
            # ran with it off (or a pre-quota layout): the stored per-host
            # pending counts were carried, not maintained, so quota
            # decisions would silently use stale numbers. Recount ONCE from
            # the pending frontier (the only scan the quota ever does) and
            # snapshot the corrected hosts table before the first tick.
            fcounts = (
                cat.read("frontier", versions["frontier"])
                .filter(F.col("state") == "pending")
                .groupBy("host")
                .agg(F.count(F.lit(1)).cast("long").alias("__pc"))
            )
            hosts_re = (
                self._read_hosts(versions)
                .drop("pending_count")
                .join(fcounts, "host", "left")
                .withColumn(
                    "pending_count",
                    F.coalesce(F.col("__pc"), F.lit(0).cast("long")),
                )
                .drop("__pc")
                .select(*[f.name for f in S.HOSTS_SCHEMA.fields])
            )
            hman = cat.meta("hosts", versions["hosts"])
            versions = dict(versions)
            if hman.get("num_buckets"):
                versions["hosts"] = cat.write_bucketed(
                    "hosts", hosts_re, key=hman["bucketed_key"],
                    num_buckets=hman["num_buckets"],
                    meta={k: hman[k] for k in ("n_hosts",) if k in hman},
                )
            else:
                versions["hosts"] = cat.write(
                    "hosts", hosts_re,
                    meta={k: hman[k] for k in ("n_hosts",) if k in hman},
                )
            emeta = dict(emeta)
            emeta["host_pending_cap"] = cfg.host_pending_cap
            cat.commit_epoch(last, versions, meta=emeta)
        if "pending_counts" in emeta:
            counts = {int(b): n for b, n in emeta["pending_counts"].items()}
        else:
            counts = {
                r["b"]: r["n"]
                for r in cat.read("frontier", versions["frontier"])
                .filter(F.col("state") == "pending")
                .groupBy(
                    host_bucket(F.col("host"), cfg.num_host_buckets).alias("b")
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        if cfg.feed_stall_epochs == 1:
            raise ValueError(
                "feed_stall_epochs must be 0 (off) or >= 2: a task's "
                "pending window before a robots denial is one tick, and a "
                "1-tick sweep would race the denial (diverging from the "
                "oracle's admission-time gate)"
            )
        tick = last
        stalled_for = 0
        while tick < cfg.max_epochs:
            sweep_dirty = False
            if self._ru_epochs and any(
                ru_applied < e <= tick for e in self._ru_epochs
            ):
                # mid-crawl robots refresh: rules effective this epoch apply
                # FIRST — before the stall sweep and the tick's gates (the
                # oracle applies at the same point). The new hosts version
                # also misses the speculated gate's reuse key, so a
                # speculated admission never sees stale rules.
                versions = self._apply_robots_updates(
                    tick, ru_applied, versions
                )
                ru_applied = tick
                sweep_dirty = True
            if (
                cfg.feed_stall_epochs
                and tick > 0
                and tick % cfg.feed_stall_epochs == 0
            ):
                swept = self._sweep_stalled_feeds(tick, versions, counts)
                if swept is not None:
                    versions, counts = swept
                    sweep_dirty = True
            result = self._run_tick(tick, versions, counts)
            if result is None:
                if sweep_dirty:
                    # a pre-tick maintenance step (feed-stall quarantine /
                    # robots refresh) changed table versions but the run
                    # converged — pin them in a final epoch manifest so
                    # they are visible to committed readers
                    cat.commit_epoch(
                        tick + 1,
                        versions,
                        meta={
                            "event": "pre_tick_maintenance",
                            "host_pending_cap": cfg.host_pending_cap,
                            "robots_applied_through": ru_applied,
                            "pending_counts": {
                                str(b): n for b, n in counts.items()
                            },
                        },
                    )
                    tick += 1
                break
            versions, meta, counts = result
            meta = dict(meta)
            meta["pending_counts"] = {str(b): n for b, n in counts.items()}
            meta["host_pending_cap"] = cfg.host_pending_cap
            meta["robots_applied_through"] = ru_applied
            cat.commit_epoch(tick + 1, versions, meta=meta)
            if progress:
                print(f"[crawl] {meta}")
            # liveness guard: the reference kills a feed actor stuck for
            # maxWaitingTimeBeforeStop ms; here a run whose every pending
            # host stays blocked for stall_timeout_epochs consecutive ticks
            # quarantines the stuck rows and terminates instead of spinning
            stalled_for = stalled_for + 1 if meta.get("admitted", 0) == 0 else 0
            if cfg.stall_timeout_epochs and stalled_for >= cfg.stall_timeout_epochs:
                versions = self._quarantine_stalled(tick + 1, versions)
                cat.commit_epoch(
                    tick + 2, versions, meta={"event": "stall_timeout",
                          "host_pending_cap": cfg.host_pending_cap,
                          "robots_applied_through": ru_applied}
                )
                tick += 2
                break
            if cfg.vacuum_every and (tick + 1) % cfg.vacuum_every == 0:
                from newsfeeds_crawler_spark.plans import state as _S

                for t in _S.STATE_TABLES:
                    if cat.exists(t):
                        cat.vacuum(t, keep_last=2)
            if cfg.compact_log_every and (tick + 1) % cfg.compact_log_every == 0:
                versions = dict(versions)
                for t in ("frontier_log", "metrics", "errors"):
                    compacted = self.cat.read(t, versions[t]).localCheckpoint(
                        eager=True
                    )
                    versions[t] = self.cat.write(
                        t,
                        compacted.coalesce(
                            self.spark.sparkContext.defaultParallelism
                        ),
                        mode="overwrite",
                    )
                cat.commit_epoch(tick + 1, versions, meta={"event": "compact_log",
                          "host_pending_cap": cfg.host_pending_cap,
                          "robots_applied_through": ru_applied})
            if (
                cfg.compact_articles_every
                and (tick + 1) % cfg.compact_articles_every == 0
            ):
                # bucket-local: rewrites ONLY long-appended buckets, folding
                # their append-log rows to latest-per-url (url → host →
                # host_bucket, so the per-url window is bucket-local); I/O ∝
                # oversized buckets, never the table
                v_new = cat.compact_buckets(
                    "articles",
                    max_dirs_per_bucket=cfg.articles_max_dirs_per_bucket,
                    transform=latest_articles,
                    base_version=versions["articles"],
                )
                if v_new is not None:
                    versions = dict(versions)
                    versions["articles"] = v_new
                    cat.commit_epoch(tick + 1, versions, meta={"event": "compact",
                          "host_pending_cap": cfg.host_pending_cap,
                          "robots_applied_through": ru_applied})
            tick += 1
        return {"epochs": tick, "versions": versions}

    # ------------------------------------------------------ result views

    def crawl_order(self) -> DataFrame:
        """Fetched URLs in (fetch_epoch, admit_rank) order — the golden
        sequence compared against the oracle."""
        return (
            self.cat.read_committed("frontier_log")
            .filter(F.col("fetch_epoch").isNotNull())
            .select("url_canon", "fetch_epoch", "admit_rank")
            .orderBy("fetch_epoch", "admit_rank")
        )

    def frontier_all(self) -> DataFrame:
        """Pending tasks ∪ terminal log — the old all-states frontier view."""
        return self.cat.read_committed("frontier").unionByName(
            self.cat.read_committed("frontier_log")
        )

    def articles_final(self) -> DataFrame:
        return latest_articles(self.cat.read_committed("articles"))

    def image_neardup_pairs(
        self, max_dist: int = 3, bands: int = 4
    ) -> DataFrame:
        """Cross-feed near-duplicate images in the crawled output: banded
        64-bit hamming join over the recomputed perceptual hash of every
        decoded article image (operators/multimodal.phash_hamming_pairs —
        full recall for ``max_dist`` ≤ bands−1, never an all-pairs join).
        A training-data pipeline runs this post-crawl to drop visually
        duplicate (image, caption) rows the URL-level seen store cannot
        catch. Output: (id_a, id_b, hamming), ids = url_canon, id_a < id_b.
        """
        from newsfeeds_crawler_spark.operators.multimodal import (
            phash_hamming_pairs,
        )

        arts = self.articles_final().filter(F.col("dec_phash").isNotNull())
        return phash_hamming_pairs(
            arts, "url_canon", "dec_phash", max_dist=max_dist, bands=bands
        )

    def image_neardup_components(
        self, max_dist: int = 3, bands: int = 4
    ) -> DataFrame:
        """Duplicate-image CLUSTERS in the crawled output: the transitive
        closure of :meth:`image_neardup_pairs` via
        operators.dedup.neardup_components. Output: (doc_id=url_canon,
        component=lexicographic-min url in the cluster, is_canonical) —
        filter ``is_canonical`` to keep one (image, caption) row per
        visually-duplicate cluster."""
        from newsfeeds_crawler_spark.operators.dedup import neardup_components

        return neardup_components(self.image_neardup_pairs(max_dist, bands))

    def caption_consistency_report(self, bands: int = 4) -> DataFrame:
        """Caption↔image agreement over the crawled output: for every
        stored (image, caption) row, the fraction of the DECODED image's
        phash bands whose tag token appears in the caption
        (operators/multimodal.caption_image_consistency — a map-only
        projection at any scale). A training pipeline drops or reviews
        rows scoring < 1.0: mislabeled captions that URL-level dedup and
        pixel-level near-dup both miss. Output: (url_canon, caption,
        dec_phash, consistency)."""
        from newsfeeds_crawler_spark.operators.multimodal import (
            caption_image_consistency,
        )

        arts = self.articles_final().filter(
            F.col("caption").isNotNull() & F.col("dec_phash").isNotNull()
        )
        return caption_image_consistency(arts, bands=bands).select(
            "url_canon", "caption", "dec_phash", "consistency"
        )

    def feeds_final(self) -> DataFrame:
        return self.cat.read_committed("feeds")

    def metrics_df(self) -> DataFrame:
        return self.cat.read_committed("metrics")
