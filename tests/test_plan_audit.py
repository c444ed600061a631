"""Repo-wide physical-plan hygiene audit over every driver gate.

Scale discipline, pinned structurally: at a 100 TB corpus the one plan
node that is never survivable is an unbounded all-pairs join. This test
compiles the physical plan of EVERY ``__spark_entry__.queries()`` entry
and asserts

1. zero ``CartesianProduct`` nodes anywhere, and
2. ``BroadcastNestedLoopJoin`` nodes only where a whitelist documents why
   the broadcast side is bounded — with the exact per-query count pinned,
   so an accidental new nested-loop join (a dropped join key, a filter
   that stopped being an equi-condition) fails this test long before it
   is measurable as a slowdown.

Whitelisted BNLJ shapes (each broadcast side is O(1) or O(k), never
corpus-sized):

- scalar joins: a 1-row aggregate (corpus total, vocab size, HLL
  estimate/exact pair) cross-joined back onto a distributed frame;
- bounded-dimension joins: k centroids / k² centroid-weight pairs / a
  256-entry codebook shipped to every vector (IVF/PQ assign+encode);
- the brute-force baseline itself: ``similarity_brute_topk`` IS the
  documented quadratic baseline (bounded query side), and
  ``image_phash_neardup``'s in-gate brute twin exists to PROVE the banded
  path equals all-pairs at gate scale (64 rows).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def sf001(spark):
    return "/root/testdata/sf0.001"

# query -> exact allowed BroadcastNestedLoopJoin count, with the bounded
# broadcast side named. Everything not listed must plan with ZERO.
BNLJ_WHITELIST = {
    # 1-row scalar aggregates cross-joined back
    "corpus_mixture_weights": 1,  # corpus-total row (curation.py:308)
    "text_bigram_lm": 1,          # vocab-size row (curation.py:227)
    "frontier_hot_hosts": 1,      # CMS width/depth scalar (sketches.py:278)
    "frontier_distinct_hll": 2,   # estimate + exact 1-row frames (sketches.py:200-201)
    "corpus_importance_resample": 2,  # raw+target total rows combined, then
                                      # joined onto the bucket weights
                                      # (importance.py:120-143)
    # bounded model dimensions (k centroids / k² weights / 256-code LUT)
    "similarity_ivf_topk": 2,
    "similarity_ivf_multiprobe": 2,
    "similarity_ivfpq_topk": 3,
    "similarity_pq_topk": 1,      # 256-row codebook (similarity.py:342)
    "dedup_embedding_cosine": 2,  # centroid assign for cell blocking
    # deliberate quadratic baselines at bounded scale
    "similarity_brute_topk": 1,   # the documented brute baseline itself
    "image_phash_neardup": 1,     # in-gate brute twin proving banded==brute
}


@pytest.fixture(scope="module")
def plans(spark, sf001):
    out = {}
    for name, fn in entry.queries().items():
        df = fn(spark, sf001)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_in_any_gate_plan(plans):
    offenders = {n: p.count("CartesianProduct") for n, p in plans.items()
                 if "CartesianProduct" in p}
    assert not offenders, f"CartesianProduct nodes found: {offenders}"


def test_nested_loop_joins_only_where_whitelisted(plans):
    got = {n: p.count("BroadcastNestedLoopJoin") for n, p in plans.items()
           if "BroadcastNestedLoopJoin" in p}
    unexpected = {n: c for n, c in got.items()
                  if c != BNLJ_WHITELIST.get(n, 0)}
    assert not unexpected, (
        "BroadcastNestedLoopJoin count drifted from the whitelist "
        f"(query -> found, allowed): "
        f"{{ {', '.join(f'{n}: {c} vs {BNLJ_WHITELIST.get(n, 0)}' for n, c in sorted(unexpected.items()))} }}"
    )
    stale = sorted(set(BNLJ_WHITELIST) - set(entry.queries()))
    assert not stale, f"whitelist names unknown queries: {stale}"


def test_every_bnlj_is_broadcast_not_shuffle_replicate(plans):
    # A BNLJ that stops being a *broadcast* nested loop (e.g. both sides
    # big -> shuffle-replicate-NL) would print as CartesianProduct or a
    # different node; belt-and-braces: no plan may contain the
    # shuffle-replicate marker Spark uses when neither side broadcasts.
    offenders = [n for n, p in plans.items() if "ShuffledNestedLoopJoin" in p]
    assert not offenders, offenders
