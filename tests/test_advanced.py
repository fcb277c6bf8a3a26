"""Tests for LAMP projection, stateful streaming sessionization,
column comparison, and Pandas-UDF computed columns."""

import os

import pandas as pd
from pyspark.sql import functions as F

from hillview_spark.operators import correlation, maps
from hillview_spark.streaming import events as ev
from hillview_spark.tables import load_table


def test_lamp_projects_every_row_deterministically(spark, tables):
    part = tables["part"]
    out1 = correlation.lamp_project(
        part, ["p_size", "p_retailprice"], n_controls=40, key_col="p_partkey"
    )
    rows1 = {r.p_partkey: (r.lamp_x, r.lamp_y) for r in out1.collect()}
    assert len(rows1) == part.count()
    out2 = correlation.lamp_project(
        part, ["p_size", "p_retailprice"], n_controls=40, key_col="p_partkey"
    )
    rows2 = {r.p_partkey: (r.lamp_x, r.lamp_y) for r in out2.collect()}
    assert rows1 == rows2
    xs = [v[0] for v in rows1.values()]
    assert max(xs) > min(xs)  # non-degenerate spread


def test_lamp_mds_degenerate_and_nonfinite_inputs(spark):
    """r11 correlation review (class-1 probes): one bad row must
    never kill the layout sketch, and degenerate shapes must not
    crash or fabricate coordinates.
    - EMPTY input: lamp crashed in numpy (zero-length stack) — now
      returns the empty frame.
    - ±Inf row: Spark dropna covers NULL/NaN but NOT Inf; one Inf row
      made metric_mds' normalized distances NaN (job-fatal SVD) and
      flowed Inf coordinates out of lamp — now excluded exactly like
      NULL/NaN rows, in the control pick AND the data path.
    - single input column: numpy broadcasting silently DUPLICATED the
      1-D layout into both lamp outputs (fabricated y == x) — now a
      zero y coordinate, the metric_mds pad rule."""
    empty = spark.createDataFrame([], "id long, a double, b double")
    assert correlation.lamp_project(empty, ["a", "b"], key_col="id").collect() == []

    inf = float("inf")
    m = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, 3.0, 4.0), (3, inf, 5.0), (4, 7.0, -inf)],
        "id long, a double, b double",
    )
    mds = correlation.metric_mds(m, ["a", "b"], key_col="id", n_points=10)
    assert sorted(r.id for r in mds.collect()) == [1, 2]
    lamp = correlation.lamp_project(m, ["a", "b"], key_col="id", n_controls=5)
    got = {r.id: (r.lamp_x, r.lamp_y) for r in lamp.collect()}
    assert sorted(got) == [1, 2]
    assert all(
        v == v and abs(v) != inf for xy in got.values() for v in xy
    )  # finite coordinates only

    one_col = spark.createDataFrame(
        [(1, 1.0), (2, 5.0), (3, 9.0)], "id long, a double"
    )
    out = {r.id: (r.lamp_x, r.lamp_y) for r in correlation.lamp_project(
        one_col, ["a"], key_col="id").collect()}
    assert all(y == 0.0 for (_, y) in out.values())
    assert len({x for (x, _) in out.values()}) == 3  # 1-D spread kept

    # configs fail loud, data quarantines: a zero control/sample
    # count is a config error, not an empty-data outcome
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_controls"):
        correlation.lamp_project(one_col, ["a"], n_controls=0, key_col="id")
    with _pytest.raises(ValueError, match="n_points"):
        correlation.metric_mds(one_col, ["a"], n_points=0, key_col="id")


def test_lamp_preserves_neighborhoods(spark):
    # two well-separated clusters in 3-D must stay separated in 2-D
    rows = [(i, 0.0 + i * 0.01, 0.0, 0.0) for i in range(50)] + [
        (100 + i, 10.0 + i * 0.01, 10.0, 10.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, a double, b double, c double")
    out = correlation.lamp_project(df, ["a", "b", "c"], n_controls=20, key_col="id")
    pts = {r.id: (r.lamp_x, r.lamp_y) for r in out.collect()}
    import numpy as np

    c1 = np.mean([pts[i] for i in range(50)], axis=0)
    c2 = np.mean([pts[100 + i] for i in range(50)], axis=0)
    spread1 = max(np.linalg.norm(np.array(pts[i]) - c1) for i in range(50))
    assert np.linalg.norm(c1 - c2) > 3 * spread1


def test_compare_columns_null_safe(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (None, None), (None, 1)], "a int, b int"
    )
    out = maps.compare_columns(df, "eq", "a", "b").collect()
    got = [(r.a, r.b, r.eq) for r in out]
    assert (None, None, True) in got
    assert (None, 1, False) in got
    assert (1, 1, True) in got and (1, 2, False) in got


def test_computed_column_pandas(spark, tables):
    def double_qty(q: pd.Series) -> pd.Series:
        return q * 2

    out = maps.computed_column_pandas(
        tables["lineitem"], "qty2", double_qty, ["l_quantity"], "double"
    )
    r = out.select("l_quantity", "qty2").first()
    assert r.qty2 == r.l_quantity * 2


def test_stream_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    d = str(tmp_path / "events_dir")
    os.makedirs(d)
    os.symlink(
        "/root/testdata/sf0.001/events.parquet", os.path.join(d, "events.parquet")
    )
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sdf = ev.stream_sessionize(spark, d, raw.schema, gap_minutes=30)
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        # batch sessionize truncates to seconds; align for comparison
        (r.user_id, r.session_start.replace(microsecond=0), r.n_events)
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    # batch sessions, minus each user's final (still-open) session
    batch = ev.sessionize(
        load_table(spark, "/root/testdata/sf0.001", "events"), 30
    ).collect()
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.session_id > cur.session_id:
            last_per_user[r.user_id] = r
    closed = {
        (r.user_id, r.session_start, r.n_events)
        for r in batch
        if last_per_user[r.user_id].session_id != r.session_id
    }
    everything = {(r.user_id, r.session_start, r.n_events) for r in batch}
    # every gap-closed session must stream out; final (open) sessions
    # may ALSO appear if the event-time timeout fired before shutdown,
    # and nothing else may appear.
    assert closed <= streamed <= everything


def test_stream_sessionize_processing_timeout_drains(spark, tmp_path):
    """timeout='processing' flushes every open session once the
    source goes wall-clock idle — the end-of-stream completeness
    case the event-time watermark can't cover. Run 1 ingests the
    fixture and stops; after idle_flush_seconds, run 2 (same
    checkpoint) fires the timeouts and the union of outputs equals
    ALL batch sessions."""
    import time

    d = str(tmp_path / "events_dir")
    cp = str(tmp_path / "cp")
    os.makedirs(d)
    os.symlink(
        "/root/testdata/sf0.001/events.parquet", os.path.join(d, "events.parquet")
    )
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    out = str(tmp_path / "sessions_out")

    def run_once():
        # file sink: the one append sink that supports checkpoint
        # recovery across restarts (memory sink does not)
        sdf = ev.stream_sessionize(
            spark, d, raw.schema, gap_minutes=30,
            timeout="processing", idle_flush_seconds=1,
        )
        q = (
            sdf.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    time.sleep(1.5)  # let every per-user idle timer expire
    # a second batch must run for timeouts to fire: add one dummy row
    # (schema order: event_id, ts, user_id, event_type, value, props)
    dummy_user = -999_999
    spark.createDataFrame(
        [(10**18, raw.select("ts").first().ts, dummy_user, "click", 0.0, "{}")],
        raw.schema,
    ).write.parquet(os.path.join(d, "more.parquet"))
    run_once()

    batch = {
        (r.user_id, r.session_start, r.n_events)
        for r in ev.sessionize(
            load_table(spark, "/root/testdata/sf0.001", "events"), 30
        ).collect()
    }
    streamed = {
        (r.user_id, r.session_start.replace(microsecond=0), r.n_events)
        for r in spark.read.parquet(out).collect()
        if r.user_id != dummy_user
    }
    assert streamed == batch


def test_stream_windowed_anomaly_matches_batch(spark, tmp_path):
    """r11: the stateful anomaly twin must reproduce the batch
    z-scores BIT-FOR-BIT on every window it closes (same IEEE
    expression shape over the same trailing cells), close every
    window the final watermark safely passed, and emit nothing the
    watermark hasn't passed."""
    d = str(tmp_path / "events_dir")
    os.makedirs(d)
    os.symlink(
        "/root/testdata/sf0.001/events.parquet",
        os.path.join(d, "events.parquet"),
    )
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sdf = ev.stream_windowed_anomaly(spark, d, raw.schema)
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_win_anomaly")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    streamed = {
        (r.window_start, r.event_type): (
            r.n_events, r.baseline_mean, r.z_score
        )
        for r in spark.sql("SELECT * FROM t_win_anomaly").collect()
    }
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    batch = {
        (r.window_start, r.event_type): (
            r.n_events, r.baseline_mean, r.z_score
        )
        for r in ev.windowed_anomaly(events).collect()
        if r.window_start is not None
    }
    import datetime

    final_wm = events.agg(F.max("ts")).first()[0] - datetime.timedelta(
        hours=2
    )
    hour = datetime.timedelta(hours=1)
    must = {
        k for k in batch if k[0] + hour < final_wm - datetime.timedelta(seconds=1)
    }
    may = {k for k in batch if k[0] + hour <= final_wm}
    assert must, "fixture spans too few hours to close any window"
    assert must <= set(streamed) <= may
    for k, v in streamed.items():
        assert batch[k] == v, (k, v, batch[k])


def test_stream_transitions_matches_batch_exactly(spark, tmp_path):
    """r11: the ordered-replay transition twin must reproduce the
    batch adjacency EXACTLY once the watermark passes the data. A
    far-future pusher event on its own user advances the watermark
    past every real event, so every real transition closes; the
    pusher's user has one event and contributes none."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    mk = lambda eid, u, ty, mins: (
        eid, u, ty, t0 + datetime.timedelta(minutes=mins), 1.0
    )
    rows = [
        mk(1, 1, "click", 0), mk(2, 1, "view", 5), mk(3, 1, "purchase", 9),
        # same-instant tie on user 2: event_id orders 4 before 5
        mk(4, 2, "click", 0), mk(5, 2, "view", 0),
        (6, 2, None, t0 + datetime.timedelta(minutes=1), 1.0),  # NULL type
        mk(7, 2, "purchase", 2),
        (8, None, "click", t0, 1.0),          # NULL user
        (9, 3, "click", None, 1.0),           # NULL ts
        # NULL event_id: dropped like the other NULL drops (the batch
        # twin documents non-null ids as a domain premise; the stream
        # must degrade, not crash on int(NaN)) — r11 ADVICE fix
        (None, 1, "view", t0 + datetime.timedelta(minutes=7), 1.0),
        # watermark pusher: lone far-future event on its own user
        mk(99, 999, "click", 60 * 24 * 30),
    ]
    d = str(tmp_path / "events_dir")
    os.makedirs(d)
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double",
    )
    df.coalesce(1).write.parquet(os.path.join(d, "p"))
    raw = spark.read.parquet(os.path.join(d, "p"))
    sdf = ev.stream_transitions(spark, os.path.join(d, "p"), raw.schema)
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_transitions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    streamed = sorted(
        (r.user_id, r.from_type, r.to_type)
        for r in spark.sql("SELECT * FROM t_transitions").collect()
    )
    assert streamed == [
        (1, "click", "view"), (1, "view", "purchase"),
        (2, "click", "view"), (2, "view", "purchase"),
    ]
    # and the aggregated matrix equals the batch twin on the same
    # data restricted to the batch twin's documented domain (non-null
    # unique event_id) — the stream drops NULL ids by design
    batch = {
        (r.from_type, r.to_type): r.n_transitions
        for r in ev.transition_counts(
            df.where(F.col("event_id").isNotNull())
        ).collect()
    }
    agg = {}
    for _, f, t in streamed:
        agg[(f, t)] = agg.get((f, t), 0) + 1
    assert agg == {k: v for k, v in batch.items()}


def test_stream_windowed_anomaly_rejects_calendar_units(spark, tmp_path):
    """Epoch-mod flooring only equals trunc_ntz for fixed-length
    units — month must refuse loudly, not silently drift."""
    import pytest as _pytest

    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with _pytest.raises(ValueError, match="unit"):
        ev.stream_windowed_anomaly(spark, str(tmp_path), raw.schema,
                                   unit="month")


def test_sampled_corr_matrix_close_to_exact(spark, tables):
    from hillview_spark.operators import correlation

    li = tables["lineitem"]
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    exact = {
        (r.col_x, r.col_y): r.corr
        for r in correlation.corr_matrix(li, cols).collect()
    }
    sampled = {
        (r.col_x, r.col_y): r.corr
        for r in correlation.corr_matrix(
            li, cols, sample_fraction=0.5, seed=7
        ).collect()
    }
    assert set(sampled) == set(exact)
    for k, v in exact.items():
        assert abs(sampled[k] - v) < 0.1, (k, sampled[k], v)
    # deterministic for a fixed seed
    again = {
        (r.col_x, r.col_y): r.corr
        for r in correlation.corr_matrix(
            li, cols, sample_fraction=0.5, seed=7
        ).collect()
    }
    assert again == sampled


def test_metric_mds_preserves_distances_and_is_deterministic(spark):
    """Squared-stress MDS on points that genuinely live on a 2-D
    manifold inside 4-D must reproduce their pairwise distances
    almost exactly (stress ~ 0), deterministically."""
    import itertools
    import math as m

    import numpy as np

    from hillview_spark.operators import correlation

    pts2d = [(0.0, 0.0), (4.0, 0.0), (0.0, 3.0), (4.0, 3.0), (2.0, 1.5), (1.0, 2.5)]
    # embed isometrically into 4-D via a rotation-ish orthonormal map
    q = np.linalg.qr(np.arange(16).reshape(4, 4) + np.eye(4))[0][:, :2]
    rows = [tuple(float(v) for v in (q @ np.array(p))) + (i,) for i, p in enumerate(pts2d)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double, id long")

    out = correlation.metric_mds(df, ["a", "b", "c", "d"], n_points=6, key_col="id")
    got = {r.id: (r.mds_x, r.mds_y) for r in out.collect()}
    assert set(got) == set(range(6))
    for i, j in itertools.combinations(range(6), 2):
        want = m.dist(pts2d[i], pts2d[j])
        have = m.dist(got[i], got[j])
        assert abs(have - want) < 0.05 * 5.0  # within 5% of the diameter
    again = {
        r.id: (r.mds_x, r.mds_y)
        for r in correlation.metric_mds(
            df, ["a", "b", "c", "d"], n_points=6, key_col="id"
        ).collect()
    }
    assert got == again


def test_lamp_project_mds_layout(spark, tables):
    import numpy as np

    from hillview_spark.operators import correlation

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    li = tables["lineitem"].limit(400)
    out = correlation.lamp_project(li, cols, n_controls=40, control_layout="mds")
    rows = out.collect()
    assert len(rows) == li.dropna(subset=cols).count()
    assert {c for c in out.columns} == {"lamp_x", "lamp_y"}
    assert all(np.isfinite(r.lamp_x) and np.isfinite(r.lamp_y) for r in rows)
