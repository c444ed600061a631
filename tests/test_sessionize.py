"""Gap-based sessionization (operators/sessionize.py): planted-gap
semantics, partitioning invariance, and the gate-vs-DuckDB hash check."""

from __future__ import annotations

from datetime import datetime

import duckdb

from newsfeeds_crawler_spark.operators.sessionize import sessionize

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    )


def test_sessionize_splits_on_gap(spark):
    rows = [
        (1, 7, datetime(2024, 1, 1, 0, 0, 0)),
        (2, 7, datetime(2024, 1, 1, 0, 10, 0)),   # 10 min — same session
        (3, 7, datetime(2024, 1, 1, 0, 40, 0, 1)),  # 30 min + 1 µs — new
        (4, 7, datetime(2024, 1, 1, 1, 10, 0, 1)),  # exactly 30 min — same
        (5, 9, datetime(2024, 1, 1, 0, 0, 0)),
    ]
    out = {
        (r.user_id, r.session_id): r
        for r in sessionize(_ev(spark, rows)).collect()
    }
    assert set(out) == {(7, 1), (7, 2), (9, 1)}
    assert out[(7, 1)].n_events == 2
    assert out[(7, 2)].n_events == 2  # the boundary event joins session 2
    dur = out[(7, 2)].end_us - out[(7, 2)].start_us
    assert out[(7, 2)].duration_us == dur == 30 * 60 * 1_000_000
    assert out[(9, 1)].n_events == 1 and out[(9, 1)].duration_us == 0


def test_sessionize_tie_breaks_on_event_id_and_is_partition_invariant(spark):
    # two events at the SAME microsecond: event_id orders them; a huge gap
    # after means the pair stays one session
    rows = [(i, 1, T0) for i in (10, 11)] + [
        (12, 1, datetime(2024, 1, 1, 5, 0, 0))
    ]
    df = _ev(spark, rows)
    a = sorted(map(tuple, sessionize(df).collect()))
    b = sorted(map(tuple, sessionize(df.repartition(5)).collect()))
    assert a == b
    sess = {r[1]: r[2] for r in a}  # session_id -> n_events
    assert sess == {1: 2, 2: 1}


def test_gate_matches_duckdb_oracle(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from tools.check_entry import canon_hash

    sdf = entry.queries()["events_sessionize"](spark, sf_dir)
    srows, scols = sdf.collect(), sdf.columns
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    cur = con.execute(entry.oracle_sql()["events_sessionize"])
    dcols = [c[0] for c in cur.description]
    drows = cur.fetchall()
    assert len(srows) == len(drows)
    assert sorted(scols) == sorted(dcols)
    assert canon_hash([tuple(r) for r in srows], scols) == canon_hash(
        drows, dcols
    )
