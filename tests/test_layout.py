"""Z-order layout: Morton key vs a Python bit-interleave reference,
bucket extents (the clustering property that makes footer-stats skipping
work), NULL/non-finite exclusion, degenerate dimensions, and the
measurable payoff — a z-ordered parquet layout lets a min/max stats
reader skip files on BOTH dimensions where a single-column sort cannot.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from billing_etl_v1_spark.operators.layout import (
    file_skip_stats,
    morton_key,
    zorder_stats,
)
from billing_etl_v1_spark.sources.writers import write_zordered


def _ref_cell(v: float, mn: float, mx: float, bits: int) -> int:
    if mx <= mn:
        return 0
    return min(int(math.floor((v - mn) / (mx - mn) * (1 << bits))), (1 << bits) - 1)


def _ref_interleave(cx: int, cy: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((cx >> i) & 1) << (2 * i)
        z |= ((cy >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [(i, float(rng.randrange(1000)), rng.uniform(-50, 50)) for i in range(300)]
    df = spark.createDataFrame(rows, ["rid", "x", "y"])
    bits = 8
    got = {r["rid"]: r["zkey"] for r in morton_key(df, "x", "y", bits).collect()}
    xs, ys = [r[1] for r in rows], [r[2] for r in rows]
    mn1, mx1, mn2, mx2 = min(xs), max(xs), min(ys), max(ys)
    for rid, x, y in rows:
        want = _ref_interleave(
            _ref_cell(x, mn1, mx1, bits), _ref_cell(y, mn2, mx2, bits), bits
        )
        assert got[rid] == want, rid


def test_zorder_stats_buckets_are_tight_boxes(spark):
    """With prefix_bits = 6 and bits = 8, each bucket is (at most) a
    1/8 x 1/8 box of the plane plus one cell of rounding — per-bucket
    spans must be far below the global spans on BOTH dimensions."""
    rng = random.Random(13)
    rows = [(float(rng.uniform(0, 800)), rng.uniform(0, 64.0)) for _ in range(4000)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = zorder_stats(df, "x", "y", bits=8, prefix_bits=6).collect()
    assert 0 < len(out) <= 64
    assert sum(r["n_rows"] for r in out) == 4000
    for r in out:
        assert r["span_1"] <= 800 / 8 + 800 / 256 + 1e-6
        assert r["span_2"] <= 64 / 8 + 64 / 256 + 1e-6


def test_constant_dimension_collapses(spark):
    df = spark.createDataFrame([(float(i), 5.0) for i in range(64)], ["x", "y"])
    out = zorder_stats(df, "x", "y", bits=4, prefix_bits=2).collect()
    assert sum(r["n_rows"] for r in out) == 64
    assert all(r["min_2"] == 5.0 and r["max_2"] == 5.0 for r in out)


def test_null_and_nonfinite_rows_excluded(spark):
    rows = [
        (1.0, 1.0),
        (None, 2.0),
        (3.0, None),
        (float("nan"), 4.0),
        (5.0, float("inf")),
        (2.0, 2.0),
    ]
    df = spark.createDataFrame(rows, ["x", "y"])
    assert morton_key(df, "x", "y", 4).count() == 2


def test_contract_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0)], ["x", "y"])
    with pytest.raises(ValueError, match="bits"):
        morton_key(df, "x", "y", 0)
    with pytest.raises(ValueError, match="missing"):
        morton_key(df, "x", "nope", 4)
    with pytest.raises(ValueError, match="prefix_bits"):
        zorder_stats(df, "x", "y", bits=4, prefix_bits=9)


def test_reserved_internal_names_rejected(spark):
    """An input already carrying an internal stats column or the requested
    output column must fail loudly, not drop/overwrite it silently
    (VERDICT-r8 ADVICE — intervals had this guard, layout didn't)."""
    import pyspark.sql.functions as F

    base = spark.createDataFrame([(1.0, 2.0)], ["x", "y"])
    for clash in ("_mn1", "_mx1", "_mn2", "_mx2", "zkey"):
        with pytest.raises(ValueError, match="reserved"):
            morton_key(base.withColumn(clash, F.lit(0)), "x", "y", 4)
    with pytest.raises(ValueError, match="reserved"):
        zorder_stats(base.withColumn("_zkey", F.lit(0)), "x", "y", bits=4)
    # a user column named like the NON-default out_col also clashes
    with pytest.raises(ValueError, match="reserved"):
        morton_key(base.withColumn("mk", F.lit(0)), "x", "y", 4, out_col="mk")


def test_zorder_layout_beats_single_column_sort_for_skipping(spark, tmp_path):
    """The point of the whole module: on a uniform plane, a y-dimension
    box predicate lets a stats reader skip most z-ordered files but NO
    files of an x-sorted layout (every x-sorted file spans all of y)."""
    rng = random.Random(99)
    rows = [
        (i, float(rng.uniform(0, 1000)), float(rng.uniform(0, 1000)))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, ["rid", "x", "y"])
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "xsort")
    write_zordered(df, zpath, ("x", "y"), bits=16, num_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    assert spark.read.parquet(zpath).count() == 4000
    y_box = (0.0, 1000.0, 100.0, 160.0)  # all of x, 6% of y
    zn, zhit = file_skip_stats(spark, zpath, "x", "y", y_box)
    sn, shit = file_skip_stats(spark, spath, "x", "y", y_box)
    assert zn == 16 and sn == 16
    assert shit == 16, "x-sorted layout cannot skip on y"
    assert zhit <= 8, f"z-order should skip most files on y, touched {zhit}"

    # and the 2-D box is more selective still under z-order
    box2 = (100.0, 160.0, 100.0, 160.0)
    _, zhit2 = file_skip_stats(spark, zpath, "x", "y", box2)
    assert zhit2 <= zhit
