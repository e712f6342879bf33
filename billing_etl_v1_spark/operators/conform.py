"""S5: schema conformance toward the 37-column target table.

Mirrors ``_insert_calculated_data`` (reference
billing_calculation_service.py:330-425) as one declarative ``select``:

- add missing columns with type-appropriate defaults ('' for strings, 0.0
  for numerics, NULL preserved for customer_id/contract_id) (:354-371)
- NaN->'' for non-nullable strings (:382-388), NaN->0 for numerics (:390-394)
- mode -> int with default 0 (:407-411)
- usage_day -> date (:421-425)
- etl_time = current timestamp (:358,375) — injectable for deterministic tests
- fixed column order (:335-352)
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from billing_etl_v1_spark.schemas import (
    TARGET_COLUMNS,
    TARGET_NULLABLE_STRING_COLUMNS,
    TARGET_NUMERIC_COLUMNS,
    TARGET_STRING_COLUMNS,
)


def conform_to_target(
    df: DataFrame,
    etl_time: _dt.datetime | None = None,
    include_etl_time: bool = True,
) -> DataFrame:
    """Project onto the exact 37-column target schema with reference defaults."""
    present = set(df.columns)
    out: list[Column] = []
    for name in TARGET_COLUMNS:
        if name == "etl_time":
            if not include_etl_time:
                continue
            col = F.lit(etl_time).cast("timestamp") if etl_time else F.current_timestamp()
        elif name == "usage_day":
            col = F.col(name).cast("date")
        elif name == "mode":
            base = F.col(name) if name in present else F.lit(None)
            col = F.coalesce(base.cast("int"), F.lit(0))
        elif name in TARGET_NULLABLE_STRING_COLUMNS:
            col = (F.col(name) if name in present else F.lit(None)).cast("string")
        elif name in TARGET_STRING_COLUMNS:
            base = F.col(name) if name in present else F.lit(None)
            col = F.coalesce(base.cast("string"), F.lit(""))
        elif name in TARGET_NUMERIC_COLUMNS:
            base = F.col(name) if name in present else F.lit(None)
            col = F.coalesce(base.cast("double"), F.lit(0.0))
        else:  # pragma: no cover - exhaustive above
            col = F.col(name)
        out.append(col.alias(name))
    return df.select(*out)
