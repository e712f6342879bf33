"""Small column-expression helpers shared by queries and tests."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

QUANT_SCALE = 1_000_000.0


def quantize6(col):
    """Deterministic money quantization: floor(x*1e6 + 0.5)/1e6.

    Used instead of ROUND because engines disagree on decimal-tie breaking
    (Spark HALF_UP on the exact binary expansion vs DuckDB's scaled C round):
    with money inputs of few decimal digits, products land EXACTLY on
    .xxxxxx5 boundaries and a 1e-6 hash mismatch appears. This formula is
    pure IEEE double arithmetic, so both engines produce bit-identical
    results (the DuckDB oracle uses the same text — oracle._r6)."""
    return F.floor(col * F.lit(QUANT_SCALE) + F.lit(0.5)) / F.lit(QUANT_SCALE)


def round_doubles(df: DataFrame, _scale: int = 6) -> DataFrame:
    """Quantize every double column — canonical money rounding so the DuckDB
    oracle hash comparison is insensitive to representation-edge rounding
    (SURVEY §7.4)."""
    return df.withColumns(
        {
            f.name: quantize6(F.col(f.name))
            for f in df.schema.fields
            if isinstance(f.dataType, DoubleType)
        }
    )
