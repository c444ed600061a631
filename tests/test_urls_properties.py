"""Property-based spec tests for URL canonicalization (pure-Python mirror —
the oracle-side spec; Spark equality with the mirror is pinned in
test_urls.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from newsfeeds_crawler_spark.functions.urls import (
    canonicalize_url_py,
    url_host_py,
)

host_st = st.from_regex(r"[A-Za-z][A-Za-z0-9\-]{0,10}(\.[A-Za-z]{2,5}){1,2}", fullmatch=True)
path_st = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,4}/?", fullmatch=True)
query_st = st.one_of(st.just(""), st.from_regex(r"\?[A-Za-z0-9=&/:%\-]{0,20}", fullmatch=True))
frag_st = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9/#:?]{0,10}", fullmatch=True))
scheme_st = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
port_st = st.sampled_from(["", ":80", ":443", ":8080", ":9"])


@st.composite
def urls(draw):
    return (
        draw(scheme_st)
        + "://"
        + draw(host_st)
        + draw(port_st)
        + draw(path_st)
        + draw(query_st)
        + draw(frag_st)
    )


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    """canon(canon(u)) == canon(u) — the property that makes the seen-set
    key stable across re-discovery of already-canonical URLs."""
    c = canonicalize_url_py(u)
    assert canonicalize_url_py(c) == c


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonical_invariants(u):
    c = canonicalize_url_py(u)
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    assert "#" not in c
    hostport = rest.split("/", 1)[0].split("?", 1)[0]
    assert hostport == hostport.lower()
    if scheme == "http":
        assert not hostport.endswith(":80")
    if scheme == "https":
        assert not hostport.endswith(":443")
    path = rest[len(hostport):].split("?", 1)[0]
    assert path.startswith("/") and "//" not in path


@given(urls())
@settings(max_examples=300, deadline=None)
def test_host_is_canonical_component(u):
    """host(u) == host(canon(u)) — politeness partition key is stable."""
    assert url_host_py(u) == url_host_py(canonicalize_url_py(u))
    h = url_host_py(u)
    assert ":" not in h and "/" not in h and h == h.lower()
