"""JSON extraction helpers.

The reference uses Databricks' ``col:a.b`` path operator pervasively
(Silver Lake Mainnet.sql:450-455,502-504,603; SCD tables.sql:66-67,103-104).
OSS translation is ``get_json_object(col, '$.a.b')``; `j` is the single
helper used everywhere so the mapping stays consistent and greppable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def j(col: Column | str, path: str) -> Column:
    """Databricks ``col:path`` -> OSS ``get_json_object``.

    `path` is dotted (``a.b.c``); bracket segments may be embedded but
    must be SINGLE-quoted (``a['weird key']``) — Spark's JSON-path parser
    silently returns NULL for every row on a double-quoted segment (r14
    review, verified), indistinguishable from the missing-key contract.
    Returns STRING (null on missing/malformed), the same permissive
    contract as the Databricks operator.
    """
    c = F.col(col) if isinstance(col, str) else col
    jsonpath = "$." + path if not path.startswith("$") else path
    return F.get_json_object(c, jsonpath)
