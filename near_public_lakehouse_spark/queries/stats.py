"""Statistical and reshaping operators: moment statistics from exact sums,
PIVOT/UNPIVOT, exact percentiles.

Moment statistics (variance, stddev, correlation) are NOT computed with the
engines' streaming aggregators — those are order-dependent in float and
diverge between engines. Instead both sides compute the same DECIMAL sums
(x, y, x^2, y^2, xy) and apply the identical closed-form double expression
at the end: deterministic under any parallelism, and exactly what a
100 TB aggregation needs anyway (one pass, five exact sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.sources.tables import load_table

_D = "decimal(38,6)"


def _dsum2(a: str, b: str):
    return F.sum((F.col(a).cast(_D) * F.col(b).cast(_D)).cast(_D))


_DSUM2_SQL = "sum(CAST(CAST({a} AS DECIMAL(38,6)) * CAST({b} AS DECIMAL(38,6)) AS DECIMAL(38,6)))"


@query(
    "price_dispersion_stats",
    tags=("stats", "A4"),
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sq,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sp,
         CAST({_DSUM2_SQL.format(a="l_quantity", b="l_quantity")} AS DOUBLE) AS sqq,
         CAST({_DSUM2_SQL.format(a="l_extendedprice", b="l_extendedprice")} AS DOUBLE) AS spp,
         CAST({_DSUM2_SQL.format(a="l_quantity", b="l_extendedprice")} AS DOUBLE) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       sq / n AS mean_qty,
       (sqq - sq * sq / n) / (n - 1) AS var_qty,
       sqrt((spp - sp * sp / n) / (n - 1)) AS stddev_price,
       (sqp - sq * sp / n)
         / (sqrt(sqq - sq * sq / n) * sqrt(spp - sp * sp / n)) AS corr_qty_price
FROM s
ORDER BY l_returnflag
""",
)
def price_dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation per return flag, from five exact
    DECIMAL sums + one closed-form double expression (see module doc).

    Scale notes: one shuffle, five decimal partial aggregates — the same
    cost profile as any sum; no second pass, no order-dependent float
    accumulation, no mean-subtraction numerical blowup at row counts where
    it matters (the sums carry 38 digits).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(_D)).cast("double").alias("sq"),
        F.sum(F.col("l_extendedprice").cast(_D)).cast("double").alias("sp"),
        _dsum2("l_quantity", "l_quantity").cast("double").alias("sqq"),
        _dsum2("l_extendedprice", "l_extendedprice").cast("double").alias("spp"),
        _dsum2("l_quantity", "l_extendedprice").cast("double").alias("sqp"),
    )
    n = F.col("n")
    return (
        s.select(
            "l_returnflag",
            "n",
            (F.col("sq") / n).alias("mean_qty"),
            ((F.col("sqq") - F.col("sq") * F.col("sq") / n) / (n - 1)).alias("var_qty"),
            F.sqrt((F.col("spp") - F.col("sp") * F.col("sp") / n) / (n - 1)).alias(
                "stddev_price"
            ),
            (
                (F.col("sqp") - F.col("sq") * F.col("sp") / n)
                / (
                    F.sqrt(F.col("sqq") - F.col("sq") * F.col("sq") / n)
                    * F.sqrt(F.col("spp") - F.col("sp") * F.col("sp") / n)
                )
            ).alias("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "daily_event_pivot",
    tags=("stats", "pivot"),
    oracle=f"""
SELECT CAST(ts AS DATE) AS event_date,
       {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}" for t in EVENT_TYPES)}
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY event_date
""",
)
def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: events-per-type as columns, one row per day, via
    groupBy().pivot() with an explicit value list.

    Scale notes: the explicit value list matters twice — it makes the
    output schema static (no pre-pass to discover values, which at 100 TB
    is a full extra scan) and it keeps the pivot a single partial-agg
    shuffle, same as any GROUP BY.
    """
    from near_public_lakehouse_spark.functions.time import ns_to_date

    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy(ns_to_date("ts").alias("event_date"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    renamed = pivoted.select(
        "event_date",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )
    return renamed.orderBy("event_date")


@query(
    "part_metrics_unpivot",
    tags=("stats", "unpivot"),
    oracle="""
SELECT p_partkey, metric, value
FROM (
  SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
  UNION ALL
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
)
ORDER BY p_partkey, metric
""",
)
def part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long melt) of part metrics via `DataFrame.unpivot`
    — the inverse reshaping operator, one narrow generate per row, no
    shuffle."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_retailprice").cast("double").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot("p_partkey", ["retailprice", "size"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


PCTS = (0.25, 0.5, 0.75, 0.99)


@query(
    "quantity_percentiles",
    tags=("stats", "percentile"),
    oracle=f"""
SELECT l_returnflag,
       {", ".join(f"quantile_cont(l_quantity, {p}) AS p{int(p * 100)}" for p in PCTS)}
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`: both index the sorted values at (n-1)*p and
    interpolate — order statistics, so no float-order sensitivity).

    Scale notes: exact percentiles need the per-group sorted values; at
    100 TB swap in `approx_percentile` (t-digest, one pass, mergeable) and
    accept the documented error — the query shape is unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_quantity, {p})").alias(f"p{int(p * 100)}")
                for p in PCTS
            ]
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# table profiling: the ANALYZE-style per-column statistics pass

# (table, column, class) for the profiled tables. The testdata schema is
# fixed (TESTDATA.md); the SQL twin is generated from this same list.
_PROFILE_COLS = {
    "orders": (
        ("o_orderkey", "numeric"),
        ("o_custkey", "numeric"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "numeric"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ),
    "customer": (
        ("c_custkey", "numeric"),
        ("c_name", "string"),
        ("c_nationkey", "numeric"),
        ("c_acctbal", "numeric"),
        ("c_mktsegment", "string"),
    ),
}


def _profile_oracle() -> str:
    parts = []
    for tbl, cols in _PROFILE_COLS.items():
        for c, cls in cols:
            mn_num = f"CAST(min({c}) AS DOUBLE)" if cls == "numeric" else "NULL::DOUBLE"
            mx_num = f"CAST(max({c}) AS DOUBLE)" if cls == "numeric" else "NULL::DOUBLE"
            mn_str = f"min({c})" if cls == "string" else "NULL::VARCHAR"
            mx_str = f"max({c})" if cls == "string" else "NULL::VARCHAR"
            mn_dt = (
                f"min(CAST({c} AS DATE))" if cls == "timestamp" else "NULL::DATE"
            )
            mx_dt = (
                f"max(CAST({c} AS DATE))" if cls == "timestamp" else "NULL::DATE"
            )
            parts.append(
                f"SELECT '{tbl}' AS tbl, '{c}' AS col, '{cls}' AS cls,"
                f" CAST(count(*) AS BIGINT) AS n_rows,"
                f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
                f" CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,"
                f" {mn_num} AS min_num, {mx_num} AS max_num,"
                f" {mn_str} AS min_str, {mx_str} AS max_str,"
                f" {mn_dt} AS min_date, {mx_dt} AS max_date"
                f" FROM {tbl}"
            )
    return " UNION ALL ".join(parts) + " ORDER BY tbl, col"


@query("table_profile", tags=("stats", "maintenance"), oracle=_profile_oracle())
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for the warehouse tables: row
    count, null count, exact NDV, and class-appropriate min/max (numeric
    as double, string as string, timestamp as DATE — the canonical forms
    that survive every engine/timezone seam). This is the statistics
    pass a catalog feeds the optimizer (join reordering, broadcast
    decisions) and a data team reads as the freshness/skew dashboard.

    Scale shape: ONE aggregation pass per table — every column's
    count/ndv/min/max computed in a single agg (the multi-distinct
    Expand), one shuffle per table, never a per-column rescan. At 100 TB
    swap the exact NDV for the KMV sketch (`kmv_distinct_sketch`'s
    mergeable minima) and this becomes the standard incremental-ANALYZE
    job; exact is right at oracle-check scale."""
    pieces = []
    for tbl, cols in _PROFILE_COLS.items():
        df = load_table(spark, sf_dir, tbl)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c, cls in cols:
            aggs.append(F.count(c).alias(f"cnt__{c}"))
            aggs.append(F.countDistinct(c).alias(f"ndv__{c}"))
            if cls == "numeric":
                aggs.append(F.min(c).cast("double").alias(f"mnn__{c}"))
                aggs.append(F.max(c).cast("double").alias(f"mxn__{c}"))
            elif cls == "string":
                aggs.append(F.min(c).alias(f"mns__{c}"))
                aggs.append(F.max(c).alias(f"mxs__{c}"))
            else:  # timestamp -> DATE canonical form
                aggs.append(F.min(F.to_date(c)).alias(f"mnd__{c}"))
                aggs.append(F.max(F.to_date(c)).alias(f"mxd__{c}"))
        one = df.agg(*aggs)
        null_num = F.lit(None).cast("double")
        null_str = F.lit(None).cast("string")
        null_dt = F.lit(None).cast("date")
        structs = []
        for c, cls in cols:
            structs.append(
                F.struct(
                    F.lit(tbl).alias("tbl"),
                    F.lit(c).alias("col"),
                    F.lit(cls).alias("cls"),
                    F.col("n_rows").cast("bigint").alias("n_rows"),
                    (F.col("n_rows") - F.col(f"cnt__{c}"))
                    .cast("bigint")
                    .alias("n_nulls"),
                    F.col(f"ndv__{c}").cast("bigint").alias("ndv"),
                    (F.col(f"mnn__{c}") if cls == "numeric" else null_num).alias(
                        "min_num"
                    ),
                    (F.col(f"mxn__{c}") if cls == "numeric" else null_num).alias(
                        "max_num"
                    ),
                    (F.col(f"mns__{c}") if cls == "string" else null_str).alias(
                        "min_str"
                    ),
                    (F.col(f"mxs__{c}") if cls == "string" else null_str).alias(
                        "max_str"
                    ),
                    (F.col(f"mnd__{c}") if cls == "timestamp" else null_dt).alias(
                        "min_date"
                    ),
                    (F.col(f"mxd__{c}") if cls == "timestamp" else null_dt).alias(
                        "max_date"
                    ),
                )
            )
        pieces.append(
            one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl", "col")


# ---------------------------------------------------------------------------
# exact quantile selection by histogram refinement — no sort, ever

QSEL_PCTS = (0.25, 0.5, 0.9)
QSEL_BUCKETS = 4096
QSEL_COLLECT_MAX = 4096  # rows the final TakeOrdered may materialize


def kth_smallest(df: DataFrame, col: str, k: int) -> float:
    """Exact k-th smallest (1-based) of a numeric column by histogram
    refinement: count passes narrow a [lo, hi] value range until the
    in-range population fits a bounded TakeOrdered, then select directly.
    Every driver read is bounded ({QSEL_BUCKETS} histogram rows or
    {QSEL_COLLECT_MAX} final rows); the data is NEVER globally sorted —
    the 100 TB shape for exact order statistics, vs percentile()'s
    per-group sorted-values requirement."""
    rank = k  # rank within the current slice
    cur = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    first = True
    while True:
        # min/max of the ACTUAL slice (not arithmetic bucket bounds) so the
        # next round's bucket expression sees (v - lo) >= 0 exactly.
        lo, hi, cnt = cur.agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
        ).collect()[0]
        if first:
            assert 1 <= k <= cnt, (k, cnt)
            first = False
        if lo == hi:
            return float(lo)
        if cnt <= QSEL_COLLECT_MAX:
            rows = cur.orderBy("v").limit(rank).collect()  # TakeOrdered, bounded
            return float(rows[-1].v)
        width = (hi - lo) / QSEL_BUCKETS
        b = F.least(
            F.lit(QSEL_BUCKETS - 1),
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
        )
        hist = {
            r.b: r.c
            for r in cur.groupBy(b.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect()
        }
        acc = 0
        for bi in range(QSEL_BUCKETS):
            c = hist.get(bi, 0)
            if acc + c >= rank:
                rank -= acc
                # r6 ADVICE (stats.py:370): filter with the SAME bucket
                # expression the histogram counted with — recomputing the
                # boundary in Python doubles can mis-place edge values and
                # skew the rank bookkeeping by one.
                cur = cur.filter(b == F.lit(bi))
                break
            acc += c


def _qsel_oracle() -> str:
    parts = []
    for p in QSEL_PCTS:
        parts.append(
            f"SELECT {p} AS pct,"
            f" CAST(greatest(1, CAST(ceil({p} * (SELECT count(l_extendedprice) FROM lineitem)) AS BIGINT)) AS BIGINT) AS k,"
            f" (SELECT l_extendedprice FROM lineitem WHERE l_extendedprice IS NOT NULL"
            f"  ORDER BY l_extendedprice"
            f"  LIMIT 1 OFFSET greatest(1, CAST(ceil({p} * (SELECT count(l_extendedprice) FROM lineitem)) AS BIGINT)) - 1)"
            f" AS value"
        )
    return " UNION ALL ".join(parts) + " ORDER BY pct"


@query("quantile_select_exact", tags=("stats",), oracle=_qsel_oracle())
def quantile_select_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order statistics of l_extendedprice (p25/p50/p90 as the k-th
    smallest, k = ceil(p*n)) computed WITHOUT sorting the data: histogram
    refinement narrows the value range with counting passes until a
    bounded TakeOrdered finishes the selection — 2-3 passes in practice,
    every driver read bounded. This is the scale path
    `quantity_percentiles` documents as a trade-off: that operator's
    interpolating percentile() needs per-group sorted values and at
    100 TB degrades to approx_percentile, while selection-by-counting
    stays EXACT at any size. The oracle selects the same k-th element by
    ORDER BY ... OFFSET — two unrelated algorithms, one hash."""
    li = load_table(spark, sf_dir, "lineitem")
    n = li.agg(F.count("l_extendedprice").alias("n")).collect()[0].n
    rows = []
    for p in QSEL_PCTS:
        import math

        k = max(1, math.ceil(p * n))
        # empty input: the oracle's OFFSET over an empty subquery is a
        # NULL scalar — selection has nothing to select (r15 differential
        # fuzz, empty-table class)
        rows.append((p, k, kth_smallest(li, "l_extendedprice", k) if n else None))
    return spark.createDataFrame(rows, "pct double, k bigint, value double").orderBy(
        "pct"
    )


# ---------------------------------------------------------------------------
# robust outlier gate: median/MAD modified z-score (Iglewicz-Hoaglin)

MAD_Z_CUT = 3.5  # the standard modified-z threshold
MAD_CONSISTENCY = 0.6745  # Phi^-1(0.75): scales MAD to sigma-equivalent


@query(
    "quality_outliers_mad",
    tags=("text", "llm-pipeline", "quality"),
    oracle=f"""
WITH med AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars) AS med
  FROM documents GROUP BY source
),
dev AS (
  SELECT d.source, d.doc_id, d.n_chars, m.med, m.n_docs,
         abs(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m USING (source)
),
mad AS (
  SELECT source,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
  FROM dev GROUP BY source
),
z AS (
  SELECT v.source, v.n_docs, v.med, m.mad,
         CASE WHEN m.mad > 0
              THEN abs({MAD_CONSISTENCY} * (v.n_chars - v.med) / m.mad)
              ELSE 0 END AS mz
  FROM dev v JOIN mad m USING (source)
)
SELECT source,
       max(n_docs) AS n_docs,
       CAST(count(*) FILTER (mz > {MAD_Z_CUT}) AS BIGINT) AS n_outliers,
       round(max(med), 6) AS median_chars,
       round(max(mad), 6) AS mad_chars
FROM z GROUP BY source ORDER BY source
""",
)
def quality_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source length-outlier gate: modified z-score
    |{MAD_CONSISTENCY}*(x - median)/MAD| > {MAD_Z_CUT} (Iglewicz-Hoaglin)
    over `n_chars` — the outlier filter a curation pipeline runs where
    mean/stddev would be dragged by the very outliers it hunts. Exact
    interpolated medians via `percentile` on both engines (identical
    interpolation arithmetic -> deterministic); zero-MAD sources
    (constant length) flag nothing rather than dividing by zero.

    Scale: two per-source exact percentiles — group-bounded sorts here;
    at 100 TB swap `percentile` for `approx_percentile` and keep the
    identical downstream (the modified-z is threshold-insensitive to
    small quantile error at |z|=3.5)."""
    docs = load_table(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("percentile(n_chars, 0.5)").alias("med"),
    )
    dev = docs.join(med, "source").select(
        "source",
        "n_docs",
        "med",
        "n_chars",
        F.abs(F.col("n_chars") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("source").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    mz = F.when(
        F.col("mad") > 0,
        F.abs(MAD_CONSISTENCY * (F.col("n_chars") - F.col("med")) / F.col("mad")),
    ).otherwise(F.lit(0.0))
    return (
        dev.join(mad, "source")
        .select("source", "n_docs", "med", "mad", mz.alias("mz"))
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.sum((F.col("mz") > MAD_Z_CUT).cast("long")).cast("bigint").alias("n_outliers"),
            F.round(F.max("med"), 6).alias("median_chars"),
            F.round(F.max("mad"), 6).alias("mad_chars"),
        )
        .orderBy("source")
    )
