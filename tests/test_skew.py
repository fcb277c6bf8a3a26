"""Salting utilities: results must be identical to unsalted plans
while spreading hot keys across sub-groups."""

import datetime

import pytest

from pyspark.sql import functions as F

from hillview_spark.operators import skew, temporal


def _skewed_events(spark, n=400):
    """One hot key owns 50% of all events (the straggler scenario the
    chunked temporal paths exist for); the rest spread over 20 keys.
    Distinct (ts, event_id) everywhere so results are deterministic."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        user = "hot" if i % 2 == 0 else f"u{i % 20}"
        rows.append(
            (i, user, base + datetime.timedelta(seconds=37 * i), float(i % 97))
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp_ntz, value double"
    )
    return df


def test_asof_join_chunked_matches_plain(spark):
    ev = _skewed_events(spark)
    clicks = ev.where(F.col("event_id") % 3 != 0).select("event_id", "user_id", "ts")
    quotes = ev.where(F.col("event_id") % 3 == 0).select(
        "user_id", "ts", F.col("value").alias("quote")
    )
    plain = temporal.asof_join(clicks, quotes, "ts", ["user_id"], ["quote"])
    # deliberately small chunks (5 min over a ~4h span) so many chunk
    # boundaries and empty chunks are exercised
    chunked = temporal.asof_join(
        clicks, quotes, "ts", ["user_id"], ["quote"], chunk_seconds=300
    )
    key = lambda r: (r.event_id,)  # noqa: E731
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, chunked.collect())
    )


def test_moving_aggregate_chunked_matches_plain_on_hot_key(spark):
    ev = _skewed_events(spark)
    plain = {
        (r.user_id, r.event_id): (r.rolling_sum, r.rolling_n)
        for r in temporal.moving_aggregate(ev, n_preceding=3).collect()
    }
    # sparse keys at 1800 s (~1.2 events/chunk) are OUTSIDE the
    # envelope: strict mode must refuse rather than silently shorten
    with pytest.raises(ValueError, match="chunk envelope violated"):
        temporal.moving_aggregate(
            ev, n_preceding=3, chunk_seconds=1800
        ).collect()
    chunked = {
        (r.user_id, r.event_id): (r.rolling_sum, r.rolling_n)
        for r in temporal.moving_aggregate(
            ev, n_preceding=3, chunk_seconds=1800, strict=False
        ).collect()
    }
    # the hot key satisfies the envelope (each 30-min chunk holds ~24
    # events >= n_preceding) and matches exactly even under
    # strict=False; sparse keys at this chunk size are approximate
    hot_plain = {k: v for k, v in plain.items() if k[0] == "hot"}
    hot_chunked = {k: v for k, v in chunked.items() if k[0] == "hot"}
    assert hot_plain == hot_chunked
    # with chunks wide enough that every key's chunks hold >=
    # n_preceding events (sparse keys fire every ~25 min -> 4-5 per 2h
    # chunk), equality is total
    chunked_wide = {
        (r.user_id, r.event_id): (r.rolling_sum, r.rolling_n)
        for r in temporal.moving_aggregate(
            ev, n_preceding=3, chunk_seconds=7200
        ).collect()
    }
    assert plain == chunked_wide


def test_salted_group_count_matches_plain(spark, tables):
    li = tables["lineitem"]
    plain = {
        tuple(r)[:-1]: r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }
    salted = {
        tuple(r)[:-1]: r.cnt
        for r in skew.salted_group_count(li, ["l_returnflag"], salt=8).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    o = tables["orders"].select("o_orderkey", "o_orderpriority")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority").count().collect()
    )
    salted = (
        skew.salted_join(li, o, "l_orderkey", "o_orderkey", salt=4)
        .groupBy("o_orderpriority").count().collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
