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
