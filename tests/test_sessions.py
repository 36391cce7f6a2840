"""Session / funnel / retention operators (operators/sessions.py —
the r15 W-family extension): value semantics on literal frames plus
the plan shapes that make them linear at 100 TB."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

M = 60 * 1_000_000  # one minute in µs


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_us long"
    )


def test_sessionize_gap_boundaries(spark):
    """A gap strictly greater than gap_us starts a new session; a gap
    exactly equal to it does NOT (the > rule); ties in ts order by the
    explicit tie-breaker."""
    from genie_spark.operators.sessions import sessionize

    rows = [
        (1, 1, "view", 0 * M),
        (1, 2, "view", 30 * M),      # gap == 30 min → same session
        (1, 3, "view", 61 * M),      # gap 31 min  → new session
        (1, 4, "view", 61 * M),      # tie: event_id orders it after 3
        (2, 5, "view", 5 * M),       # other user: own numbering
    ]
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(_ev(spark, rows), gap_us=30 * M).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_session_stats_aggregates(spark):
    from genie_spark.operators.sessions import session_stats

    rows = [
        (1, 1, "view", 0 * M),
        (1, 2, "click", 10 * M),
        (1, 3, "view", 100 * M),
    ]
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"], r["start_us"], r["end_us"],
            r["duration_us"], r["n_event_types"],
        )
        for r in session_stats(_ev(spark, rows), gap_us=30 * M).collect()
    }
    assert got == {
        (1, 1): (2, 0, 10 * M, 10 * M, 2),
        (1, 2): (1, 100 * M, 100 * M, 0, 1),
    }


def test_funnel_strict_after_rule(spark):
    """Step k converts only STRICTLY after step k-1: a click at the
    same µs as the view does not convert; a later click does; the
    purchase chain continues from the converted click."""
    from genie_spark.operators.sessions import funnel_times

    rows = [
        # user 1: full conversion
        (1, 1, "view", 10 * M),
        (1, 2, "click", 20 * M),
        (1, 3, "purchase", 30 * M),
        # user 2: click simultaneous with view → funnel stops at view
        (2, 4, "view", 10 * M),
        (2, 5, "click", 10 * M),
        (2, 6, "purchase", 40 * M),
        # user 3: never viewed → excluded entirely
        (3, 7, "click", 5 * M),
        # user 4: view then purchase without click → stops at step 1
        (4, 8, "view", 1 * M),
        (4, 9, "purchase", 2 * M),
        # user 5: click BEFORE the first view must not count; the one
        # after does
        (5, 10, "click", 1 * M),
        (5, 11, "view", 2 * M),
        (5, 12, "click", 3 * M),
    ]
    got = {
        r["user_id"]: (
            r["t_step1_us"], r["t_step2_us"], r["t_step3_us"],
            r["steps_reached"],
        )
        for r in funnel_times(
            _ev(spark, rows), steps=["view", "click", "purchase"]
        ).collect()
    }
    assert got == {
        1: (10 * M, 20 * M, 30 * M, 3),
        2: (10 * M, None, None, 1),
        4: (1 * M, None, None, 1),
        5: (2 * M, 3 * M, None, 2),
    }
    assert 3 not in got


def test_funnel_empty_steps_raises(spark):
    from genie_spark.operators.sessions import funnel_times

    with pytest.raises(ValueError, match="steps"):
        funnel_times(_ev(spark, []), steps=[])


def test_retention_matrix_values(spark):
    """Cohort = epoch-period of first event; offsets count distinct
    users, not events."""
    from genie_spark.operators.sessions import retention_matrix

    P = 100
    rows = [
        (1, 1, "view", 0),        # cohort 0
        (1, 2, "view", 50),       # same period (dup activity)
        (1, 3, "view", 250),      # offset 2
        (2, 4, "view", 120),      # cohort 1
        (2, 5, "view", 220),      # offset 1
        (3, 6, "view", 130),      # cohort 1, offset 0
    ]
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in retention_matrix(_ev(spark, rows), period_us=P).collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 2, (1, 1): 1}
    # FLOOR semantics on negative (pre-epoch) timestamps: ts -100 with
    # period 100 is cohort -1, not 0 (r15 code-review finding — bare
    # `div` truncates toward zero and would disagree with the oracle's
    # floor `//`)
    neg = [(9, 90, "view", -100), (9, 91, "view", 50)]
    got_neg = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in retention_matrix(_ev(spark, neg), period_us=P).collect()
    }
    assert got_neg == {(-1, 0): 1, (-1, 1): 1}


def test_session_plan_single_exchange(spark):
    """sessionize + session_stats must ride ONE hash exchange: lag,
    running sum, and the (user, session) aggregate all share the user
    partitioning."""
    from genie_spark.workload import w5_sessionize

    plan = w5_sessionize(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_funnel_plan_single_exchange_no_join(spark):
    """funnel_times is windows + one same-key aggregate: no join
    operator, one hash exchange."""
    from genie_spark.workload import w6_funnel_conversion

    plan = (
        w6_funnel_conversion(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_retention_plan_two_exchanges(spark):
    """retention_matrix: the user window exchange plus the final
    (cohort, offset) distinct aggregate — nothing else."""
    from genie_spark.workload import w7_retention_cohorts

    plan = (
        w7_retention_cohorts(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_batch_stream_sessionize_parity(spark, tmp_path):
    """W5 ↔ §2.12: the streaming gap sessionizer's CLOSED sessions
    must equal the batch ``session_stats`` sessions over the same
    events (every real session closed by a far-future sentinel event
    per user) — (user, start, end, n_events) for (user, session_seq)
    in time order.  The store≡batch discipline applied to sessions."""
    from pyspark.sql import types as T

    from genie_spark.operators.sessions import session_stats
    from genie_spark.streaming.windows import sessionize as stream_sessionize

    lines = ["user_id,ts"]
    batch_rows = []
    base = 1_700_000_000  # epoch seconds
    evs = {
        "A": [0, 600, 1800 + 1, 7200],       # gap==1800 stays; 1801 splits
        "B": [100, 200, 10_000],
        "C": [5],
    }
    sentinel = 10**6
    import datetime as dt

    eid = 0
    for u, ts in evs.items():
        for t in list(ts) + [sentinel]:
            eid += 1
            stamp = dt.datetime.fromtimestamp(base + t, dt.timezone.utc)
            lines.append(f"{u},{stamp:%Y-%m-%d %H:%M:%S}")
            batch_rows.append((u, eid, "e", (base + t) * 1_000_000))
    src = tmp_path / "sess_src"
    src.mkdir()
    (src / "s1.csv").write_text("\n".join(lines) + "\n")
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("header", "true").csv(str(src))
    )
    q = (
        stream_sessionize(stream, key_col="user_id", ts_col="ts", gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sess_parity").collect()
    }
    batch = spark.createDataFrame(
        batch_rows, "user_id string, event_id long, event_type string, ts_us long"
    )
    stats = session_stats(batch, gap_us=1800 * 1_000_000).collect()
    # drop each user's sentinel session (the open one in the stream)
    last_seq = {}
    for r in stats:
        last_seq[r["user_id"]] = max(
            last_seq.get(r["user_id"], 0), r["session_seq"]
        )
    want = {
        (
            r["user_id"],
            r["start_us"] // 1_000_000,
            r["end_us"] // 1_000_000,
            r["n_events"],
        )
        for r in stats
        if r["session_seq"] != last_seq[r["user_id"]]
    }
    assert got == want and len(got) == 5


def test_funnel_conversion_window(spark):
    """w9 rule: a step landing after the window does NOT convert even
    though a later in-window event of the same type never comes; the
    boundary (exactly within_us later) still converts."""
    from genie_spark.operators.sessions import funnel_times

    W = 10 * M
    rows = [
        # user 1: click exactly at the window edge → converts
        (1, 1, "view", 0),
        (1, 2, "click", W),
        # user 2: click just past the edge → stops at step 1
        (2, 3, "view", 0),
        (2, 4, "click", W + 1),
        # user 3: first click out of window, but a second click inside
        # it → the in-window one converts
        (3, 5, "view", 0),
        (3, 6, "click", W + 5),
        (3, 7, "click", 2),
    ]
    got = {
        r["user_id"]: (r["t_step2_us"], r["steps_reached"])
        for r in funnel_times(
            _ev(spark, rows), steps=["view", "click"], within_us=W
        ).collect()
    }
    assert got == {1: (W, 2), 2: (None, 1), 3: (2, 2)}


def test_robust_outlier_stats_values(spark):
    """Median/MAD on a literal group: med and MAD interpolate halves
    exactly; the single wild value is the only outlier."""
    from genie_spark.operators.aggregations import robust_outlier_stats

    rows = [("g", float(v)) for v in (10, 12, 14, 16, 1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    r = robust_outlier_stats(df, ["k"], "v").first()
    # sorted: 10 12 14 16 1000 → med 14; dev 4 2 0 2 986 → MAD 2
    assert (r["n"], r["median_value"], r["mad_value"], r["n_outliers"]) == (
        5, 14.0, 2.0, 1,
    )


def test_batch_stream_funnel_parity(spark, tmp_path):
    """w6 ↔ §2.12: the streaming funnel's completed conversions must
    equal the batch ``funnel_times`` rows that reach the final step —
    same users, same per-step times — including a conversion whose
    steps STRADDLE micro-batches."""
    from pyspark.sql import types as T

    from genie_spark.operators.sessions import funnel_times
    from genie_spark.streaming.windows import funnel_stream

    base = 1_700_000_000
    import datetime as dt

    def stamp(t):
        return f"{dt.datetime.fromtimestamp(base + t, dt.timezone.utc):%Y-%m-%d %H:%M:%S}"

    # batch 1: A view+click; B full conversion; C click only (never
    # views); D view+click at the SAME second (click must not count)
    b1 = ["user_id,event_type,ts"]
    b2 = ["user_id,event_type,ts"]
    events = []

    def ev(u, et, t, batch):
        (b1 if batch == 1 else b2).append(f"{u},{et},{stamp(t)}")
        events.append((u, len(events), et, (base + t) * 1_000_000))

    ev("A", "view", 10, 1)
    ev("A", "click", 20, 1)
    ev("B", "view", 10, 1)
    ev("B", "click", 30, 1)
    ev("B", "purchase", 40, 1)
    ev("C", "click", 5, 1)
    ev("D", "view", 50, 1)
    ev("D", "click", 50, 1)
    # batch 2: A completes (straddling conversion); D's click arrives
    # later and now counts; C still never views
    ev("A", "purchase", 100, 2)
    ev("D", "click", 60, 2)

    src = tmp_path / "funnel_src"
    src.mkdir()
    (src / "b1.csv").write_text("\n".join(b1) + "\n")
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    out = str(tmp_path / "funnel_out")

    def run_available():
        # file sink (not memory): it supports checkpoint RECOVERY, so
        # the second availableNow run resumes the per-user state from
        # the first — the cross-batch contract under test
        q = (
            funnel_stream(
                spark.readStream.schema(schema)
                .option("header", "true")
                .csv(str(src)),
                steps=["view", "click", "purchase"],
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["key"]: (r["t_step1_s"], r["t_step2_s"], r["t_step3_s"])
            for r in spark.read.parquet(out).collect()
        }

    got1 = run_available()
    assert got1 == {"B": (base + 10, base + 30, base + 40)}
    (src / "b2.csv").write_text("\n".join(b2) + "\n")
    all2 = run_available()
    got2 = {k: v for k, v in all2.items() if k not in got1}
    # only the NEW completion is emitted (B emitted once, in batch 1)
    assert got2 == {"A": (base + 10, base + 20, base + 100)}

    # parity with the batch operator over the full event set
    batch = spark.createDataFrame(
        events, "user_id string, event_id long, event_type string, ts_us long"
    )
    want = {
        r["user_id"]: (
            r["t_step1_us"] // 1_000_000,
            r["t_step2_us"] // 1_000_000,
            r["t_step3_us"] // 1_000_000,
        )
        for r in funnel_times(batch, steps=["view", "click", "purchase"])
        .where("steps_reached = 3")
        .collect()
    }
    assert {**got1, **got2} == want
