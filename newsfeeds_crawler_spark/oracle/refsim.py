"""Pure-Python single-threaded reference-semantics simulator (the SPEC).

Implements the reference crawler's dataflow exactly — the FeedManager state
machine (/root/reference/.../FeedManager.scala:72-189), the HttpManager
FIFO + politeness discipline W1–W5 (HttpManager.scala:65-143), predicates
P1–P5, aggregations A1–A2 — over the deterministic virtual-time model both
this oracle and the Spark engine share:

- time advances in epochs of ``tick_ms``;
- task arrival order is pinned to the composite FIFO key
  ``(enqueue_epoch, enqueue_rank, enqueue_sub)`` (the reference's order is
  actor-schedule dependent; pinning it makes W1–W5 a pure function — see
  SURVEY.md §2.5);
- per epoch: scan pending tasks in FIFO order, take the first task of each
  not-yet-taken admissible host (W2 skip-scan), stop after ``workers`` (W4);
  a host is admissible iff ``epoch >= last_access + ceil(delay/tick)`` (W3);
- admitted tasks fetch (corpus lookup), then run the reference state
  machine; items discovered by the feed admitted at rank r in epoch e are
  enqueued with key ``(e+1, r, item_idx)``.

Documented deviations from the reference (both sides implement these):
- duplicate URL within one feed: reference crashes (FeedManager.scala:180-182),
  we keep the first occurrence;
- cross-feed duplicate fetched twice: reference would hit a UNIQUE-violation
  race, we upsert (second fetch updates);
- robots.txt gate (north_star requirement, no reference analog): disallowed
  article tasks are denied at admission and count as processed for their
  feed; a denied feed task kills the feed.
"""

from __future__ import annotations

import calendar
import math
from dataclasses import dataclass, field
from datetime import datetime
from typing import Optional

from newsfeeds_crawler_spark.functions.feedparse import parse_feed_py
from newsfeeds_crawler_spark.functions.predicates import is_newer_py
from newsfeeds_crawler_spark.functions.urls import canonicalize_url_py, url_host_py
from newsfeeds_crawler_spark.functions.httpsim import sim_latency_ms_py
from newsfeeds_crawler_spark.synth.corpus import SynthCorpus, extract_caption_py


@dataclass
class Task:
    url: str
    url_canon: str
    host: str
    kind: str                       # feed | article
    key: tuple[int, int, int]       # (enqueue_epoch, enqueue_rank, enqueue_sub)
    feed_canon: Optional[str] = None    # owning feed (article tasks)
    parsed_pub_ts: Optional[datetime] = None  # item ts from RSS (article tasks)
    stored_id: Optional[int] = None     # seen-store id at probe time
    state: str = "pending"          # pending|fetched|robots_denied|skipped
    priority: float = 0.0           # north_star priority frontier score


@dataclass
class OracleResult:
    crawl_order: list[tuple[str, int, int]] = field(default_factory=list)  # (url_canon, epoch, rank)
    seen: dict[str, Optional[datetime]] = field(default_factory=dict)       # url_canon -> stored pub_ts
    articles: dict[str, dict] = field(default_factory=dict)                 # url_canon -> row
    feeds: dict[str, dict] = field(default_factory=dict)                    # feed_canon -> {state,last_pub_ts}
    metrics: list[dict] = field(default_factory=list)
    tasks: list[Task] = field(default_factory=list)
    epochs: int = 0

    @property
    def order_urls(self) -> list[str]:
        return [u for u, _, _ in self.crawl_order]


def _disallowed(rules: dict[str, list[str]], host: str, url_canon: str) -> bool:
    """``rules``: host -> CURRENT disallow prefixes (robots_updates mutate
    this mid-run; hosts absent from the dict allow everything)."""
    prefixes = rules.get(host)
    if not prefixes:
        return False
    rest = url_canon.split("://", 1)[-1]
    path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
    return any(path.startswith(p) for p in prefixes)


def _priority_py(depth: int, pub_ts: Optional[datetime],
                 depth_weight: float, recency_weight: float) -> float:
    """Mirror of operators.politeness.priority_score: lower = sooner.
    unix seconds are integral (matching Spark's unix_timestamp truncation),
    interpreted as UTC (matching the engine's UTC session timezone)."""
    ts = 0.0 if pub_ts is None else float(calendar.timegm(pub_ts.timetuple()))
    return depth * depth_weight - ts * recency_weight


def simulate(
    corpus: SynthCorpus,
    max_epochs: int = 100_000,
    depth_weight: float = 0.0,
    recency_weight: float = 0.0,
    socket_timeout_ms: int = 0,
    starvation_epochs: int = 0,
    feed_stall_epochs: int = 0,
    host_pending_cap: int = 0,
    host_seed_cap: int = 0,
    robots_updates: Optional[list[dict]] = None,
    enqueue_robots: Optional[bool] = None,
) -> OracleResult:
    """Both weights 0.0 -> constant priority -> the reference's pure
    mailbox FIFO. Non-zero weights replay the engine's priority frontier:
    admission order = (priority, FIFO key) ascending.

    ``host_pending_cap`` > 0 replays the engine's crawl-trap guard: a new
    article task enters the frontier only while its host's PENDING count
    stays below the cap; overflow items are terminal 'quota_denied' (they
    process for their feed at their enqueue epoch, like an enqueue-time
    robots denial). Quota consumption order within a tick is the FIFO key
    (rank, sub). The mode implies enqueue-time robots denial (heads mode):
    denied rows never occupy the frontier, so they never consume quota —
    this is the invariant that makes the count well-defined.

    ``host_seed_cap`` > 0 is the DEPTH-0 class of the per-host budget (the
    crawl's depth classes are seeds=0, articles=1; host_pending_cap is the
    depth-1 class): at most that many robots-allowed FEEDS per host enter
    the frontier at init, consumed in seed order; overflow seeds are
    terminal 'quota_denied' and their feeds die — a seed-list link farm
    cannot monopolize a host's budget. Same heads-mode requirement.

    ``robots_updates`` replays the engine's mid-crawl robots refresh: each
    dict is {host, effective_epoch (>= 1), disallow (list[str] | None =
    keep), crawl_delay_ms (int | None = keep)} and takes effect at the very
    START of its effective epoch, before that epoch's stall sweep / robots
    gate / admission. Rule versioning is exactly the engine's: enqueue-time
    gates (quota mode) read the version in force at the task's ENQUEUE
    epoch — already-pending rows keep their admission; the legacy
    admission-time gate re-checks pending rows against the CURRENT rules
    each tick. Updates for hosts outside the corpus are ignored (the engine
    inner-joins its hosts table).

    ``enqueue_robots`` pins WHERE the robots gate fires: True = at enqueue
    (the engine's heads mode — denied rows never enter the frontier),
    False = at admission each tick (the legacy full-frontier mode).
    Default None = implied by the quota knobs (the historical behavior —
    quota requires the enqueue-time gate). Under STATIC rules the two
    timings produce identical final states (denial is a static per-row
    property — the equivalence the r1–r4 suites pinned); under
    robots_updates they genuinely diverge (a pending row outlives a rule
    change only in enqueue mode), so update tests must pass the engine's
    actual mode."""
    if enqueue_robots is None:
        enqueue_robots = host_pending_cap > 0 or host_seed_cap > 0
    if (host_pending_cap > 0 or host_seed_cap > 0) and not enqueue_robots:
        raise ValueError(
            "quota modes require the enqueue-time robots gate "
            "(enqueue_robots=True): denied rows must never consume quota"
        )
    spec = corpus.spec
    delay_epochs = {
        h: max(1, math.ceil(info["crawl_delay_ms"] / spec.tick_ms))
        for h, info in corpus.hosts.items()
    }
    # CURRENT robots rules — robots_updates mutate these mid-run; applied
    # in (effective_epoch, host) order so a later version wins
    rules = {h: list(info["disallow"]) for h, info in corpus.hosts.items()}
    updates = sorted(
        (
            u
            for u in (robots_updates or [])
            if u["host"] in corpus.hosts and u["effective_epoch"] >= 1
        ),
        key=lambda u: (u["effective_epoch"], u["host"]),
    )
    ui = 0
    res = OracleResult()

    tasks: list[Task] = []
    seed_counts: dict[str, int] = {}
    for i, seed in enumerate(corpus.seeds):
        c = canonicalize_url_py(seed)
        h = url_host_py(seed)
        t = Task(
            seed, c, h, "feed", (0, i, 0), feed_canon=c,
            priority=_priority_py(0, None, depth_weight, recency_weight),
        )
        res.feeds[c] = {"state": "pending", "last_pub_ts": None}
        if enqueue_robots and _disallowed(rules, h, c):
            # enqueue-time robots (heads mode): a denied seed never enters
            # the frontier; the feed dies at init
            t.state = "robots_denied"
            res.feeds[c]["state"] = "dead"
        elif (
            host_seed_cap > 0 and seed_counts.get(h, 0) >= host_seed_cap
        ):
            # depth-0 budget: the host's seed quota is exhausted — the
            # overflow seed is terminally denied and its feed dies (robots
            # denials above never consumed quota)
            t.state = "quota_denied"
            res.feeds[c]["state"] = "dead"
        elif host_seed_cap > 0:
            seed_counts[h] = seed_counts.get(h, 0) + 1
        tasks.append(t)

    # seen store = the article table keyed by canonical URL (preseen = fixtures)
    store: dict[str, dict] = {
        u: dict(article_id=row["article_id"], pub_ts=row["pub_ts"],
                caption=row["caption"], action="preseen")
        for u, row in corpus.preseen.items()
    }
    feed_pending: dict[str, set[tuple[str, int]]] = {}   # feed -> {(item_canon, sub)}
    feed_watermark: dict[str, Optional[datetime]] = {}

    def item_processed(feed_canon: Optional[str], item_key: tuple[str, int]) -> None:
        """A1: per-feed countdown; empties -> S7 watermark (FeedManager.scala:153-162)."""
        if feed_canon is None or feed_canon not in feed_pending:
            return
        feed_pending[feed_canon].discard(item_key)
        if not feed_pending[feed_canon]:
            res.feeds[feed_canon]["state"] = "done"
            res.feeds[feed_canon]["last_pub_ts"] = feed_watermark.get(feed_canon)
            del feed_pending[feed_canon]

    # per-feed liveness guard (FeedManager.scala:31-33,67-69 ReceiveTimeout
    # = maxWaitingTimeBeforeStop): last epoch a feed's countdown made
    # progress (items enqueued or processed). A robots denial records its
    # ENQUEUE epoch (key[0]-1) so the engine's enqueue-time and this
    # oracle's admission-time denial agree on the progress clock.
    feed_last_progress: dict[str, int] = {}

    def progress(fc: Optional[str], at: int) -> None:
        if fc is not None:
            feed_last_progress[fc] = max(feed_last_progress.get(fc, -1), at)

    last_access: dict[str, int] = {}
    epoch = 0
    while epoch < max_epochs:
        # mid-crawl robots refresh: updates effective this epoch apply
        # FIRST — before the stall sweep and the robots/admission gates —
        # mirroring the engine's apply-at-tick-start (plans/driver.py
        # _apply_robots_updates). None fields keep the prior value.
        while ui < len(updates) and updates[ui]["effective_epoch"] <= epoch:
            u = updates[ui]
            ui += 1
            if u.get("disallow") is not None:
                rules[u["host"]] = list(u["disallow"])
            if u.get("crawl_delay_ms") is not None:
                delay_epochs[u["host"]] = max(
                    1, math.ceil(u["crawl_delay_ms"] / spec.tick_ms)
                )
        # per-feed stall sweep (every feed_stall_epochs ticks, BEFORE the
        # robots gate / admission — the engine runs the identical rule):
        # a crawling feed whose countdown made no progress for >= N epochs
        # dies; its pending tasks quarantine as 'stalled' while the rest
        # of the crawl proceeds. N must be >= 2: a task's pending window
        # before a robots denial is one tick, and N=1 would let the sweep
        # race that denial.
        if feed_stall_epochs > 0 and epoch > 0 and epoch % feed_stall_epochs == 0:
            for fc in list(feed_pending):
                if (
                    res.feeds[fc]["state"] == "crawling"
                    and feed_pending[fc]
                    and feed_last_progress.get(fc, -1) <= epoch - feed_stall_epochs
                ):
                    for t in tasks:
                        if t.state == "pending" and t.feed_canon == fc:
                            t.state = "stalled"
                    res.feeds[fc]["state"] = "dead"
                    del feed_pending[fc]
        # starvation guard (mirror of operators.politeness.admit): rows
        # pending >= starvation_epochs ticks form an escalated class that
        # outranks every fresh row; FIFO within the class
        pending = sorted(
            (t for t in tasks if t.state == "pending"),
            key=lambda t: (
                0
                if starvation_epochs > 0
                and epoch - t.key[0] >= starvation_epochs
                else 1,
                t.priority,
                *t.key,
            ),
        )
        if not pending:
            break

        # robots gate at admission time (enqueue mode gates at enqueue
        # instead — no pending row is re-checked there, so a row enqueued
        # under old rules survives a mid-crawl disallow)
        if not enqueue_robots:
            still = []
            for t in pending:
                if _disallowed(rules, t.host, t.url_canon):
                    t.state = "robots_denied"
                    if t.kind == "article":
                        progress(t.feed_canon, t.key[0] - 1)
                        item_processed(t.feed_canon, (t.url_canon, t.key[2]))
                    else:
                        res.feeds[t.feed_canon]["state"] = "dead"
                else:
                    still.append(t)
            pending = still

        # W2/W3/W4: FIFO skip-scan, one per host, global workers cap
        taken_hosts: set[str] = set()
        admitted: list[Task] = []
        for t in pending:
            if len(admitted) >= spec.workers:
                break
            la = last_access.get(t.host)
            if t.host in taken_hosts or (la is not None and epoch < la + delay_epochs[t.host]):
                continue
            admitted.append(t)
            taken_hosts.add(t.host)
        # politeness-stall metric: tasks left waiting this tick
        stalls = len(pending) - len(admitted)

        # crawl-trap quota: pending counts AFTER this tick's departures
        # (every admitted row leaves pending), consumed in FIFO-key order
        # by this tick's enqueues — the engine's bulk rule exactly
        host_pending: dict[str, int] = {}
        if host_pending_cap > 0:
            admitted_ids = {id(t) for t in admitted}
            for t in pending:
                if id(t) not in admitted_ids:
                    host_pending[t.host] = host_pending.get(t.host, 0) + 1

        dedup_hits = 0
        enqueued = 0
        for rank, t in enumerate(admitted):
            res.crawl_order.append((t.url_canon, epoch, rank))
            last_access[t.host] = epoch
            t.state = "fetched"
            page = corpus.page(t.url_canon)
            body = page.body if page is not None and page.status == 200 else None
            # httpClient http.socket.timeout: a fetch whose deterministic
            # latency reaches the timeout throws in the reference, and the
            # downloader maps the exception to null content
            # (HttpManager.scala:112-121) — same routing as a non-200
            if (
                body is not None
                and socket_timeout_ms > 0
                and sim_latency_ms_py(t.url_canon) >= socket_timeout_ms
            ):
                body = None

            if t.kind == "feed":
                fc = t.feed_canon
                if body is None:                      # P3: null body -> feed dead
                    res.feeds[fc]["state"] = "dead"
                    continue
                parsed = parse_feed_py(body)
                if parsed is None:                    # P3: parse error -> feed dead
                    res.feeds[fc]["state"] = "dead"
                    continue
                feed_pub_ts, items = parsed
                feed_watermark[fc] = feed_pub_ts      # A2: feed-level date
                if not items:                         # empty feed: done, NO watermark
                    res.feeds[fc]["state"] = "done_empty"
                    continue
                # within-feed dedup (deviation: reference crashes on dups)
                seen_in_feed: set[str] = set()
                pend: set[tuple[str, int]] = set()
                sub = 0
                for raw_link, item_ts in items:
                    ic = canonicalize_url_py(raw_link)
                    if ic in seen_in_feed:
                        continue
                    seen_in_feed.add(ic)
                    stored = store.get(ic)
                    fetch = stored is None or is_newer_py(item_ts, stored["pub_ts"])
                    if stored is not None:
                        dedup_hits += 1
                    if fetch:
                        ih = url_host_py(raw_link)
                        nt = Task(
                            raw_link, ic, ih, "article",
                            (epoch + 1, rank, sub), feed_canon=fc,
                            parsed_pub_ts=item_ts,
                            stored_id=None if stored is None else stored["article_id"],
                            priority=_priority_py(
                                1, item_ts, depth_weight, recency_weight
                            ),
                        )
                        if enqueue_robots and _disallowed(rules, ih, ic):
                            # enqueue-time robots (heads mode): terminal,
                            # processes for its feed at the enqueue epoch,
                            # never pending, never consumes quota
                            nt.state = "robots_denied"
                            progress(fc, epoch)
                        elif (
                            host_pending_cap > 0
                            and host_pending.get(ih, 0) >= host_pending_cap
                        ):
                            nt.state = "quota_denied"
                            progress(fc, epoch)
                        else:
                            pend.add((ic, sub))
                            if host_pending_cap > 0:
                                host_pending[ih] = host_pending.get(ih, 0) + 1
                        tasks.append(nt)
                        enqueued += 1
                        sub += 1
                    # skip -> item never registered as pending (processed inline)
                if pend:
                    feed_pending[fc] = pend
                    res.feeds[fc]["state"] = "crawling"
                    progress(fc, epoch)
                else:
                    # all items skipped -> complete now with watermark (A1 empties)
                    res.feeds[fc]["state"] = "done"
                    res.feeds[fc]["last_pub_ts"] = feed_watermark.get(fc)
            else:
                ikey = (t.url_canon, t.key[2])
                progress(t.feed_canon, epoch)
                if body is None:                      # P3: null page -> skip item
                    t.state = "skipped"
                    item_processed(t.feed_canon, ikey)
                    continue
                caption = extract_caption_py(body)
                if caption is None:                   # P3: null extract -> skip item
                    t.state = "skipped"
                    item_processed(t.feed_canon, ikey)
                    continue
                prior = store.get(t.url_canon)
                store[t.url_canon] = dict(
                    article_id=prior["article_id"] if prior else None,
                    pub_ts=t.parsed_pub_ts,
                    caption=caption,
                    action="update" if prior else "insert",
                    phash=page.phash, w=page.w, h=page.h, fmt=page.fmt,
                )
                item_processed(t.feed_canon, ikey)

        res.metrics.append(dict(
            epoch=epoch, admitted=len(admitted), stalls=stalls,
            dedup_hits=dedup_hits, enqueued=enqueued,
        ))
        epoch += 1
        if not admitted and not any(t.state == "pending" for t in tasks):
            break

    res.epochs = epoch
    res.tasks = tasks
    res.seen = {u: row["pub_ts"] for u, row in store.items()}
    res.articles = {u: row for u, row in store.items() if row["action"] != "preseen"}
    return res
