"""Typed ``.properties`` configuration (S1/P7).

Re-implements the reference's config surface — java-properties parsing
plus suffix-typed literal conversion — from its observed behavior:

- key space (``Configuration.scala:36-43``): ``feed.*`` seed URLs,
  ``feedManager.maxWaitingTimeBeforeStop``, ``http.hostAccessInterval``,
  ``http.workersNum``, ``httpClient.*`` typed params, ``db.url`` /
  ``db.username`` / ``db.password``;
- typed literals (``Configuration.scala:85-95``): full-string matches
  ``\\d+i`` → int, ``\\d+l`` → long, ``\\d+(\\.\\d+)?d`` → double,
  case-insensitive ``true|false`` → bool, anything else stays a string;
- the value-as-key quirk (``Configuration.scala:81``): the reference sets
  ``dbDriverClass = props.getProperty("com.mysql.jdbc.Driver")`` — i.e. it
  looks the DRIVER CLASS NAME up as a property KEY, so the field is None
  unless the file literally contains a ``com.mysql.jdbc.Driver=...`` line.
  Replicated verbatim (and pinned by tests) because a config written for
  the reference must behave identically here.

The java.util.Properties subset implemented: ``#``/``!`` comments,
``=`` / ``:`` / first-whitespace separators, trimmed keys/values,
backslash line continuation, and the common escapes (\\t \\n \\r \\\\ \\= \\: \\#).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

FEED_KEY_PREFIX = "feed."
MAX_WAITING_TIME_BEFORE_STOP = "feedManager.maxWaitingTimeBeforeStop"
HOST_ACCESS_INTERVAL = "http.hostAccessInterval"
HTTP_WORKERS_NUMBER = "http.workersNum"
HTTP_CLIENT_PARAM_PREFIX = "httpClient."
DB_URL = "db.url"
DB_USERNAME = "db.username"
DB_PASSWORD = "db.password"

_RE_INT = re.compile(r"(\d+)i")
_RE_LONG = re.compile(r"(\d+)l")
_RE_DOUBLE = re.compile(r"(\d+(?:\.\d+)?)d")
_RE_BOOL = re.compile(r"(?i)(true|false)")

_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "f": "\f"}


def typed_value(val: str):
    """Suffix-typed literal conversion — full-string match semantics, like
    the reference's anchored regex extractors (Configuration.scala:85-95)."""
    m = _RE_INT.fullmatch(val)
    if m:
        return int(m.group(1))
    m = _RE_LONG.fullmatch(val)
    if m:
        return int(m.group(1))
    m = _RE_DOUBLE.fullmatch(val)
    if m:
        return float(m.group(1))
    m = _RE_BOOL.fullmatch(val)
    if m:
        return m.group(1).lower() == "true"
    return val


def parse_properties(text: str) -> dict[str, str]:
    """java.util.Properties subset (see module docstring)."""
    props: dict[str, str] = {}
    logical: list[str] = []
    for raw in text.splitlines():
        line = raw.lstrip()
        if not logical and (not line or line[0] in "#!"):
            continue
        if line.endswith("\\") and not line.endswith("\\\\"):
            logical.append(line[:-1])
            continue
        logical.append(line)
        full = "".join(logical)
        logical = []
        key, val = _split_kv(full)
        if key:
            props[key] = val
    return props


def _split_kv(line: str) -> tuple[str, str]:
    key_chars: list[str] = []
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "\\" and i + 1 < n:
            nxt = line[i + 1]
            key_chars.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        if c in "=:" or c.isspace():
            break
        key_chars.append(c)
        i += 1
    # skip whitespace and at most one = or :
    while i < n and line[i].isspace():
        i += 1
    if i < n and line[i] in "=:":
        i += 1
        while i < n and line[i].isspace():
            i += 1
    val_chars: list[str] = []
    while i < n:
        c = line[i]
        if c == "\\" and i + 1 < n:
            nxt = line[i + 1]
            val_chars.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        val_chars.append(c)
        i += 1
    return "".join(key_chars), "".join(val_chars).strip()


@dataclass
class CrawlerConfiguration:
    feeds: set[str]
    max_waiting_time_before_stop: int
    host_access_interval: int
    http_workers_number: int
    # typed httpClient.* map (reference: set verbatim on HttpClient,
    # DefaultHttpFacade.scala:96-103). The engine CONSUMES
    # http.socket.timeout — fetches whose simulated latency reaches it get
    # the reference's exception→null-body routing (functions/httpsim.py);
    # the remaining params are transport tuning with no corpus-join analog
    # and stay typed + accessible but inert, so a config written for the
    # reference round-trips and a future real-HTTP source can consume them.
    client_http_params: dict = field(default_factory=dict)
    db_url: str | None = None
    db_username: str | None = None
    db_password: str | None = None
    # value-as-key quirk (Configuration.scala:81) — None unless the file
    # contains a literal "com.mysql.jdbc.Driver=..." property
    db_driver_class: str | None = None

    @staticmethod
    def from_properties_file(path: str) -> "CrawlerConfiguration":
        with open(path, encoding="utf-8") as f:
            return CrawlerConfiguration.from_properties(parse_properties(f.read()))

    @staticmethod
    def from_properties(props: dict[str, str]) -> "CrawlerConfiguration":
        feeds = {
            v for k, v in props.items() if k.startswith(FEED_KEY_PREFIX)
        }
        client = {
            k[len(HTTP_CLIENT_PARAM_PREFIX):]: typed_value(v)
            for k, v in props.items()
            if k.startswith(HTTP_CLIENT_PARAM_PREFIX)
        }
        return CrawlerConfiguration(
            feeds=feeds,
            max_waiting_time_before_stop=int(props[MAX_WAITING_TIME_BEFORE_STOP]),
            host_access_interval=int(props[HOST_ACCESS_INTERVAL]),
            http_workers_number=int(props[HTTP_WORKERS_NUMBER]),
            client_http_params=client,
            db_url=props.get(DB_URL),
            db_username=props.get(DB_USERNAME),
            db_password=props.get(DB_PASSWORD),
            db_driver_class=props.get("com.mysql.jdbc.Driver"),
        )

    def to_crawl_config(self, **overrides):
        """Map to the engine's CrawlConfig: workers = http.workersNum,
        tick = hostAccessInterval, stall timeout = maxWaitingTimeBeforeStop
        expressed in epochs (ms → ticks, the virtual-time unit)."""
        from newsfeeds_crawler_spark.plans.driver import CrawlConfig

        kw = dict(
            workers=self.http_workers_number,
            tick_ms=self.host_access_interval,
            stall_timeout_epochs=max(
                1,
                math.ceil(
                    self.max_waiting_time_before_stop / self.host_access_interval
                ),
            ),
            # consumed by the fetch stage: http.socket.timeout nulls the
            # body of fetches whose simulated latency reaches it
            # (functions/httpsim.py); other params are transport tuning,
            # carried but inert in a corpus-join fetch
            client_http_params=self.client_http_params,
        )
        kw.update(overrides)
        return CrawlConfig(**kw)
