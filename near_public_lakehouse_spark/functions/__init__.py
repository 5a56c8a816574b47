from near_public_lakehouse_spark.functions.time import (  # noqa: F401
    ns_to_date,
    ns_to_epoch_hour,
    ns_to_micros,
    ns_to_seconds,
)
from near_public_lakehouse_spark.functions.json import j  # noqa: F401
from near_public_lakehouse_spark.functions.numeric import dsum, davg, yocto_to_near  # noqa: F401
