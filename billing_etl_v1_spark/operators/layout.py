"""Z-order (Morton) clustering — multi-dimensional data-skipping layout.

Min/max file skipping (parquet footer stats, Delta/Iceberg data skipping)
only prunes on dimensions the layout is sorted by. Sorting by ONE column
makes its ranges tight per file and every other column's ranges full-width;
at 100 TB that means a predicate on the second dimension reads everything.
Interleaving the bits of two dimensions' normalized cell ids (the Morton /
Z-order curve — Morton 1966, the layout behind Delta Lake's OPTIMIZE
ZORDER BY) gives a single sort key under which ranges of BOTH dimensions
shrink like 1/sqrt(n_files) — box predicates on either or both dimensions
skip most files.

Everything here is JVM column math (shift/and/or on BIGINT — whole-stage
codegen, no Python in the hot path):

- :func:`morton_key` — normalize two columns to 2^bits integer cells over
  their global min/max (one aggregate, broadcast back in the repo's 1-row
  crossJoin idiom), then interleave bits. Pure IEEE-double normalization,
  so the DuckDB twin (oracle_ext.zorder_stats_sql) reproduces every cell
  id bit-for-bit.
- :func:`zorder_stats` — clustering-quality report: bucket rows by a
  Z-key prefix and measure each bucket's per-dimension extents. Tight
  extents on BOTH dimensions are precisely what makes footer-stats
  skipping work; this is the registry-verified face of the operator.
- :func:`file_skip_stats` — per-file min/max manifest of a written
  layout (the same stats parquet footers carry) plus how many files a
  box predicate could skip; the measurable evidence that the Z-layout
  beats a single-column sort on cross-dimension predicates.

The layout WRITE step itself — range-partition + sort by the Morton key
— already exists as the k-column ``sources.writers.write_zordered`` sink
(round 3); this module adds the queryable faces around it. The 2-D cell
and interleave expressions here are deliberately fixed-form (not the
k-column loop) because they must mirror ``oracle_ext.zorder_stats_sql``
text-for-text so every cell boundary rounds identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from billing_etl_v1_spark.functions import finite_or_null, quantize6

__all__ = ["morton_key", "zorder_stats", "file_skip_stats"]


def _interleave(x, y, bits: int):
    """Morton-interleave two BIGINT cell columns in [0, 2^bits): bit i of
    x lands at position 2i, bit i of y at 2i+1. 2*bits OR-terms of
    shift/and — a flat codegen-friendly expression tree."""
    acc = F.lit(0).cast("bigint")
    for i in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return acc


def _cell(col, mn, mx, bits: int):
    """Normalized integer cell id: floor((v-mn)/(mx-mn) * 2^bits) clamped
    to [0, 2^bits-1]; a constant column (mx == mn) collapses to cell 0.
    Plain IEEE double ops in this exact order — the oracle twin uses the
    same text, so cell boundaries round identically in both engines."""
    scale = float(1 << bits)
    raw = F.floor((col - mn) / (mx - mn) * F.lit(scale)).cast("bigint")
    return F.when(mx > mn, F.least(raw, F.lit((1 << bits) - 1))).otherwise(
        F.lit(0).cast("bigint")
    )


def _with_morton(
    df: DataFrame, c1: str, c2: str, bits: int, out_col: str
) -> DataFrame:
    """Shared prep: sanitize doubles, drop NULL dims (a row without both
    coordinates has no place on the curve — mirrored in the twin), attach
    global min/max (1-row broadcast crossJoin), compute the Z-key."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    missing = {c1, c2} - set(df.columns)
    if missing:
        raise ValueError(f"missing dimension columns: {sorted(missing)}")
    reserved = {"_mn1", "_mx1", "_mn2", "_mx2", out_col} & set(df.columns)
    if reserved:
        raise ValueError(
            f"column names {sorted(reserved)} are reserved (internal "
            f"min/max stats or the requested output column)"
        )
    d = df
    for c in (c1, c2):
        if dict(d.dtypes)[c] == "double":
            d = d.withColumn(c, finite_or_null(c))
    d = d.filter(F.col(c1).isNotNull() & F.col(c2).isNotNull())
    stats = d.agg(
        F.min(F.col(c1).cast("double")).alias("_mn1"),
        F.max(F.col(c1).cast("double")).alias("_mx1"),
        F.min(F.col(c2).cast("double")).alias("_mn2"),
        F.max(F.col(c2).cast("double")).alias("_mx2"),
    )
    cell1 = _cell(F.col(c1).cast("double"), F.col("_mn1"), F.col("_mx1"), bits)
    cell2 = _cell(F.col(c2).cast("double"), F.col("_mn2"), F.col("_mx2"), bits)
    return (
        d.crossJoin(F.broadcast(stats))
        .withColumn(out_col, _interleave(cell1, cell2, bits))
        .drop("_mn1", "_mx1", "_mn2", "_mx2")
    )


def morton_key(
    df: DataFrame, c1: str, c2: str, bits: int = 8, out_col: str = "zkey"
) -> DataFrame:
    """``df`` plus a Z-order key column interleaving ``c1`` and ``c2``
    normalized to ``2^bits`` cells each (key range [0, 4^bits))."""
    return _with_morton(df, c1, c2, bits, out_col)


def zorder_stats(
    df: DataFrame, c1: str, c2: str, bits: int = 8, prefix_bits: int = 6
) -> DataFrame:
    """Clustering-quality report: split the keyed rows into ``2^prefix_bits``
    Z-prefix buckets (= the file boundaries :func:`write_zordered` would
    cut at this granularity) and measure per-bucket extents of both
    dimensions. The headline property — each bucket covers only a small
    box of the (c1, c2) plane, so min/max stats skip it for most box
    predicates — is directly readable from span_1/span_2 vs the global
    ranges. Deterministic integer + quantized-double output; twin:
    oracle_ext.zorder_stats_sql.
    """
    if not 0 <= prefix_bits <= 2 * bits:
        raise ValueError(
            f"prefix_bits must be in [0, 2*bits={2 * bits}], got {prefix_bits}"
        )
    keyed = _with_morton(df, c1, c2, bits, "_zkey")
    bucket = F.shiftright("_zkey", 2 * bits - prefix_bits).alias("zbucket")
    d1 = F.col(c1).cast("double")
    d2 = F.col(c2).cast("double")
    return (
        keyed.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            quantize6(F.min(d1)).alias("min_1"),
            quantize6(F.max(d1)).alias("max_1"),
            quantize6(F.min(d2)).alias("min_2"),
            quantize6(F.max(d2)).alias("max_2"),
        )
        .withColumn("span_1", quantize6(F.col("max_1") - F.col("min_1")))
        .withColumn("span_2", quantize6(F.col("max_2") - F.col("min_2")))
    )


def file_skip_stats(
    spark: SparkSession,
    path: str,
    c1: str,
    c2: str,
    box: tuple[float, float, float, float],
) -> tuple[int, int]:
    """(n_files, n_files_a_stats_reader_must_touch) for a box predicate
    ``box = (lo1, hi1, lo2, hi2)`` against the layout at ``path``.

    Builds the per-file min/max manifest (exactly the stats parquet
    footers expose to Spark's scan) with one aggregate over
    input_file_name(), then counts files whose stats-box intersects the
    predicate box — the files a footer-pruning reader reads; the rest are
    skipped without I/O. (Driver-side collect of ONE aggregated row — a
    diagnostics helper for tests/probes, not a data-plane operator.)"""
    lo1, hi1, lo2, hi2 = box
    manifest = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(F.col(c1).cast("double")).alias("mn1"),
            F.max(F.col(c1).cast("double")).alias("mx1"),
            F.min(F.col(c2).cast("double")).alias("mn2"),
            F.max(F.col(c2).cast("double")).alias("mx2"),
        )
    )
    hit = (
        (F.col("mn1") <= hi1)
        & (F.col("mx1") >= lo1)
        & (F.col("mn2") <= hi2)
        & (F.col("mx2") >= lo2)
    )
    counts = manifest.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(hit.cast("int")).alias("touched"),
    ).collect()[0]
    return int(counts["n"]), int(counts["touched"] or 0)
