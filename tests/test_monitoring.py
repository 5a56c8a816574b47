"""observe-based job metrics: computed in the same pass as the action,
values match an independent recompute."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators.monitoring import freshness_metrics, observed

RUN_TS = dt.datetime(2024, 6, 3, 0, 0, 0)


def _frame(spark):
    rows = [
        (1, dt.datetime(2024, 6, 1, 12, 0, 0)),
        (2, dt.datetime(2024, 6, 2, 18, 30, 0)),
        (3, None),
    ]
    return spark.createDataFrame(rows, "id bigint, ts timestamp")


def test_observed_metrics_match_recompute(spark):
    df = _frame(spark)
    out, obs = observed(df, "silver_write", freshness_metrics("ts", RUN_TS))
    out.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_null_ts"] == 1
    assert got["max_event_ts"] == dt.datetime(2024, 6, 2, 18, 30, 0)
    # freshest row is 2024-06-02 18:30 -> lag to run_ts 2024-06-03 00:00
    # is 5.5h; the *max* lag is the oldest non-null row (2024-06-01 12:00).
    assert got["max_lag_seconds"] == int((RUN_TS - dt.datetime(2024, 6, 1, 12, 0)).total_seconds())


def test_observed_metrics_ride_the_write_plan(spark):
    """The metrics must not trigger a second scan: observe rides the same
    plan, so observation.get is available right after the single action."""
    df = _frame(spark)
    out, obs = observed(df, "one_pass", [F.count(F.lit(1)).alias("n_rows")])
    assert out.count() == 3
    assert obs.get["n_rows"] == 3
