"""Simulated HTTP timing — the consumption of ``clientHttpParams`` (S5).

The reference passes every typed ``httpClient.*`` property straight into
Apache HttpClient's parameter map (DefaultHttpFacade.scala:96-103). Of
those, the ones that change crawl BEHAVIOR (rather than transport tuning)
are the timeouts: a request that exceeds ``http.socket.timeout`` throws,
and HttpManager's downloader maps ANY fetch exception to a null body
(HttpManager.scala:112-121) — exactly the routing of a non-200 response
(DefaultHttpFacade.scala:74-81 returns null). The simulated fetch
reproduces that: every URL has a deterministic latency

    crc32("lat:" + url_canon) % 30000  (ms)

— a pure function of the canonical URL, so the Spark engine (built-in
``crc32``, a Catalyst expression computed only when a timeout is
configured, zero corpus-schema change) and the Python oracle agree
bit-for-bit — and a configured socket timeout nulls the body of any fetch
whose latency reaches it. The host's last-access time still updates (the
reference sends ``Downloaded`` after the catch, HttpManager.scala:122-124),
which the engine already does for every admitted row.

``http.connection.timeout`` is intentionally inert: the simulation has no
separate connection-setup phase, so the socket timeout is the whole
per-request budget. All other ``httpClient.*`` params are transport tuning
with no analog in a corpus join; they are parsed, carried, and ignored —
matching a reference deployment where they only shape socket behavior.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: latencies are uniform-ish over [0, 30s) — wide enough that any realistic
#: timeout (reference-style 5000i/10000i) splits the corpus non-trivially
LATENCY_MOD_MS = 30_000

#: Apache HttpClient 4.x core parameter names (CoreConnectionPNames)
SOCKET_TIMEOUT_PARAM = "http.socket.timeout"
CONNECTION_TIMEOUT_PARAM = "http.connection.timeout"


def sim_latency_ms(url_canon: Column | str) -> Column:
    """Deterministic per-URL latency in ms (Catalyst expression)."""
    col = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.crc32(F.encode(F.concat(F.lit("lat:"), col), "UTF-8")) % F.lit(
        LATENCY_MOD_MS
    )


def sim_latency_ms_py(url_canon: str) -> int:
    """Oracle mirror of :func:`sim_latency_ms` (zlib.crc32 == Spark crc32)."""
    return zlib.crc32(b"lat:" + url_canon.encode("utf-8")) % LATENCY_MOD_MS


def socket_timeout_ms(client_http_params: dict) -> int:
    """Extract the socket timeout from a typed ``clientHttpParams`` map.

    0 (or a missing/falsy param) disables timeout simulation — the
    reference's behavior too: HttpClient's default SO_TIMEOUT of 0 means
    wait forever.
    """
    v = client_http_params.get(SOCKET_TIMEOUT_PARAM, 0)
    return int(v) if v else 0
