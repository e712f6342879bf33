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


def finite_or_null(col):
    """Non-finite doubles (NaN, ±Inf) to NULL at operator ingestion.

    At 100 TB a single corrupt measurement WILL occur, and the two failure
    modes are both job-level: NaN is absorbing under sum (one poisoned row
    turns a global total into NaN), and exact-cents casts raise
    CAST_OVERFLOW on NaN/Inf, killing the task. NULL is the semantic the
    rest of each aggregate already handles (skipped by sums, counted by
    nothing). The DuckDB oracle twins apply the identical rule via
    ``CASE WHEN isfinite(value) THEN value END`` so cross-engine parity
    holds on poisoned corpora too (tests/test_corrupt_floats.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))), c)


def finite_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Drop rows whose vector contains any non-finite component: a corrupt
    embedding must not poison centroid means or claim NaN-driven
    similarity ranks. Exclusion (not per-component nulling) is the ANN
    contract — distance to a partial vector is undefined. Twins mirror
    with ``list_aggregate(list_transform(v, x -> isfinite(x)), 'bool_and')``."""
    c = F.col(vec_col)
    return df.filter(
        F.forall(
            c,
            lambda x: x.isNotNull()
            & ~F.isnan(x.cast("double"))
            & (F.abs(x.cast("double")) != F.lit(float("inf"))),
        )
    )


_B = 1_000_000_000


def exact_sum(col) -> "F.Column":
    """Partition-order-proof SUM of a double column, primitive-long fast.

    Quantizes each value to an exact 1e-10 integer grid (round half toward
    +inf), accumulates as a sign-safe (hi, lo) BIGINT pair — lo = pmod(v,
    1e9) ∈ [0, 1e9), hi the exact co-quotient — and reassembles through
    DECIMAL(38,0) once per output row. Exact and associative like a
    DECIMAL(38,10) accumulation but ~3× faster (no BigDecimal boxing in
    the hot loop). Mirrored formula-for-formula by oracle._dsum so both
    engines agree bit-for-bit. Overflow envelope ~9e9 rows/group at
    1e5-scale values; use DECIMAL sums for whole-table totals beyond it.

    hi uses INTEGER division (IntegralDivide; DuckDB ``//`` in the oracle):
    a double division here would truncate hi off-by-one once |v10| exceeds
    2^53 (|value| ~9e5) because the difference is no longer representable.
    Integer div keeps hi exact across the full BIGINT range, so per-row
    |value| is bounded only by the 1e-10 grid itself (~9e8).
    """
    v10 = F.floor(col.cast("double") * F.lit(1e10) + F.lit(0.5)).cast("bigint")
    lo = ((v10 % _B) + _B) % _B
    hi = F.call_function("div", v10 - lo, F.lit(_B))  # exact: (v10-lo) % 1e9 == 0
    return (
        (F.sum(hi).cast("decimal(38,0)") * _B + F.sum(lo)).cast("double")
        / F.lit(1e10)
    )
