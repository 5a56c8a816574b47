"""Pipeline monitoring via `DataFrame.observe`: per-write row counts,
null-rate and freshness metrics collected DURING the job, not by a second
scan.

The reference monitors by baking `_dlt_synced_utc` / `_dlt_synced_lag_seconds`
into every silver row (Silver Lake Mainnet.sql:24-25) and querying them
later — a 100 TB anti-pattern when all you want is the per-batch lag.
`observe` attaches aggregates to the plan itself: executors fold them into
the same pass that writes the data, the driver reads one tiny map after the
action. Row-level audit columns remain available (plans/silver._audit) for
row provenance; this module covers the job-level metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def freshness_metrics(ts_col: str, run_ts, *extra: Column) -> list[Column]:
    """Standard silver-write metric set: volume, null keys, event-time
    freshness relative to the (deterministic) run timestamp.

    ``ts_col`` is a UTC timestamp column; ``run_ts`` the injected run time
    (the engine's replacement for the reference's per-row ``NOW()``).
    """
    run = F.lit(run_ts).cast("timestamp")
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(ts_col).isNull(), 1).otherwise(0)).alias("n_null_ts"),
        F.max(ts_col).alias("max_event_ts"),
        F.max(run.cast("long") - F.col(ts_col).cast("long")).alias("max_lag_seconds"),
        *extra,
    ]


def observed(df: DataFrame, name: str, metrics: list[Column]) -> tuple[DataFrame, Observation]:
    """Attach metrics to a DataFrame; returns (df_to_run, observation).

    Run any action on the returned frame (write, count, foreachBatch body),
    then read ``observation.get`` — a dict, computed in the same pass.
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
