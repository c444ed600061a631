"""URL canonicalization — the bit-stable seen-set key.

The reference deduplicates on the raw URL string via a MySQL UNIQUE index
(/root/reference/src/main/db/mysql-create-db.sql:3,9 and the per-item probe in
MysqlFeedArticleDao.scala:46-56). At 10^10-frontier scale the key must be a
canonical form + 64-bit hash. Canonicalization spec (FIXTURES.md §0):

    1. strip the fragment (``#...``),
    2. lowercase the scheme and the host,
    3. strip the scheme-default port (``:80`` http, ``:443`` https),
    4. collapse duplicate slashes in the path,
    5. empty path → ``/`` (query string preserved verbatim).

Two implementations that MUST agree byte-for-byte (pinned by
tests/test_urls.py): a Spark ``Column`` expression built purely from
``pyspark.sql.functions`` (stays inside WholeStageCodegen — no Python in the
hot path), and a plain-Python mirror used by the oracle simulator.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonicalize_url(url: Column | str) -> Column:
    """Spark-side canonical form. Input: URL string column.

    Implemented with substring/locate primitives plus a single regex (the
    duplicate-slash collapse) — the original all-regex chain cost ~6 regex
    evaluations per URL and dominated the scheduling hot path. Byte-equal to
    :func:`canonicalize_url_py` for URLs whose scheme is well-formed
    (``[A-Za-z][A-Za-z0-9+.-]*://``, the crawl input contract pinned by
    tests/test_urls.py); inputs with malformed scheme separators may differ
    from the regex-validating Python mirror.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.substring_index(u, "#", 1)  # 1. fragment (strip from first '#')
    pos = F.locate("://", u)
    raw_scheme = F.substring(u, F.lit(1), pos - 1)
    # the text before '://' must be a well-formed scheme — otherwise a
    # scheme-less URL with an embedded absolute URL (e.g.
    # 'example.com/p?u=http://b.com') would parse 'example.com/p?u=http'
    # as its scheme; mirrors _PY_SCHEME_RE exactly
    valid = (pos > 0) & raw_scheme.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*$")
    scheme = F.when(valid, F.lower(raw_scheme)).otherwise(F.lit(""))
    rest = F.when(valid, F.substring(u, pos + 3, F.lit(1 << 30))).otherwise(u)
    # host[:port] = up to the first '/' or '?' (mirror of ^([^/?]*))
    hostport = F.lower(F.substring_index(F.substring_index(rest, "/", 1), "?", 1))
    tail = F.substring(rest, F.length(hostport) + F.lit(1), F.lit(1 << 30))
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.substring(hostport, F.lit(1), F.length(hostport) - 3),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            F.substring(hostport, F.lit(1), F.length(hostport) - 4),
        )
        .otherwise(hostport)
    )
    path = F.substring_index(tail, "?", 1)  # mirror of ^([^?]*)
    query = F.substring(tail, F.length(path) + F.lit(1), F.lit(1 << 30))
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(scheme, F.lit("://"), host, path, query)


def url_host(url: Column | str, *, canonical: bool = False) -> Column:
    """Lowercased host without port — the politeness partition key.

    Reference analog: ``URL.getHost`` (HttpManager.scala:52,80,88).
    The scheme is split off only when the text before '://' is a
    well-formed scheme (query strings may embed absolute URLs), and only a
    trailing ':digits' port is stripped — an IPv6 literal like
    '[::1]:8080' keeps its colons. Byte-equal to :func:`url_host_py`.
    """
    u = F.col(url) if isinstance(url, str) else url
    if not canonical:
        u = canonicalize_url(u)
    pos = F.locate("://", u)
    raw_scheme = F.substring(u, F.lit(1), pos - 1)
    valid = (pos > 0) & raw_scheme.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*$")
    rest = F.when(valid, F.substring(u, pos + 3, F.lit(1 << 30))).otherwise(u)
    hostport = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    return F.regexp_replace(hostport, r":[0-9]+$", "")


def url_hash(url: Column | str, *, canonical: bool = False) -> Column:
    """64-bit seen-set key: xxhash64 of the canonical URL (north_star)."""
    u = F.col(url) if isinstance(url, str) else url
    if not canonical:
        u = canonicalize_url(u)
    return F.xxhash64(u)


def host_bucket(host: Column | str, num_buckets: int) -> Column:
    """Stable host bucket for politeness-partitioned state tables."""
    h = F.col(host) if isinstance(host, str) else host
    return F.pmod(F.xxhash64(h), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------------- python mirror

_PY_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")


def canonicalize_url_py(url: str) -> str:
    """Pure-Python mirror of :func:`canonicalize_url` (oracle-side)."""
    u = re.sub(r"#.*$", "", url)
    m = _PY_SCHEME_RE.match(u)
    scheme = m.group(1).lower() if m else ""
    rest = _PY_SCHEME_RE.sub("", u)
    hp_match = re.match(r"^([^/?]*)", rest)
    hostport = hp_match.group(1).lower()
    tail = rest[len(hostport) :]
    if scheme == "http":
        hostport = re.sub(r":80$", "", hostport)
    elif scheme == "https":
        hostport = re.sub(r":443$", "", hostport)
    path_match = re.match(r"^([^?]*)", tail)
    path = path_match.group(1)
    query = tail[len(path) :]
    path = re.sub(r"/{2,}", "/", path)
    if path == "":
        path = "/"
    return f"{scheme}://{hostport}{path}{query}"


def url_host_py(url: str) -> str:
    """Pure-Python mirror of :func:`url_host`."""
    rest = _PY_SCHEME_RE.sub("", canonicalize_url_py(url))
    hostport = re.match(r"^([^/?]*)", rest).group(1)
    return re.sub(r":\d+$", "", hostport)
