"""Empty-input robustness: every registered query must execute over
zero-row tables.

At 100 TB this is not an edge case — empty day partitions, a dimension
with no rows for a month, a source whose filter matches nothing, and
brand-new tables all produce zero-row inputs somewhere in a DAG every
day. A query that divides by an empty-group count, calls element_at on a
missing index, or feeds an empty frame to an iterative fixpoint must
degrade to an empty (or sensibly-null) result, never raise.

Verified green for all 125 registered queries when introduced (round 5);
this test keeps the property as operators evolve.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import TESTDATA_TABLES

# slow lane (see pytest.ini): excluded from the default run so the
# suite fits the driver's capture window; full evidence comes from the
# committed STRICT artifact / the round-end full run
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A testdata twin where every table has the real schema and 0 rows."""
    d = tmp_path_factory.mktemp("testdata_empty")
    for t in TESTDATA_TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(d / f"{t}.parquet"))
        )
    return str(d)


def test_every_registered_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, empty_sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:160]}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def nullish_sf_dir(spark, tmp_path_factory):
    """Testdata twin where the nullable payload columns are NULL for about
    half the rows — missing blobs, eventless pings, label-free vectors."""
    from pyspark.sql import functions as F

    nullable = {
        "documents": ["text", "lang", "source"],
        "events": ["value", "properties", "event_type"],
        "embeddings": ["embedding", "label"],
    }
    d = tmp_path_factory.mktemp("testdata_nulls")
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        for c in nullable.get(t, []):
            if c in df.columns:
                df = df.withColumn(
                    c,
                    F.when(
                        F.abs(F.hash(F.lit(c), F.col(df.columns[0]))) % 2 == 0,
                        F.col(c),
                    ),
                )
        df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


def test_every_registered_query_survives_null_payloads(spark, nullish_sf_dir):
    """NULL text/value/embedding on ~half the rows must never raise: this
    is the corrupt-blob / partial-record reality of a 100 TB corpus. The
    round-5 introduction of this sweep found the three multimodal Arrow
    UDFs crashing on len(None) — fixed to NULL-propagate, with the DuckDB
    twins matching bit-exactly on NULL-bearing input."""
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, nullish_sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:160]}")
    assert not failures, "\n".join(failures)
