"""U6: engine UDFs registered into the SQL catalog are callable from SQL."""

from __future__ import annotations

import json

from near_public_lakehouse_spark.functions.register import register_sql_functions

from near_public_lakehouse_spark.plans.lockup import TRANSFERS_ENABLED_NS

DAY_NS = 86_400 * 10**9
T0 = TRANSFERS_ENABLED_NS
YOCTO = 10**24


def test_locked_amount_from_sql(spark):
    names = register_sql_functions(spark)
    assert "locked_amount" in names
    state = json.dumps(
        {"lockup_amount": str(100 * YOCTO), "release_duration": str(100 * DAY_NS)}
    )
    spark.createDataFrame(
        [(state, T0 + 25 * DAY_NS, "other")], "state string, ts long, code_hash string"
    ).createOrReplaceTempView("lockup_states")
    row = spark.sql(
        "SELECT locked_amount(state, ts, code_hash) AS locked FROM lockup_states"
    ).collect()[0]
    assert row.locked == str(75 * YOCTO)
    # idempotent re-registration
    register_sql_functions(spark)
