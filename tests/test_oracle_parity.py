"""Mirror of the driver's t2 check: every ``queries()`` entry vs its
``oracle_sql()`` twin on sf0.001 (fast; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL, assert_frames_match

# slow lane (see pytest.ini): excluded from the default run so the
# suite fits the driver's capture window; full evidence comes from the
# committed STRICT artifact / the round-end full run
pytestmark = pytest.mark.slow


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_declared():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may be declared without an oracle; keep the
    # list explicit so additions are deliberate (empty since round 3 —
    # multimodal_features gained a fixed-point oracle twin)
    allowed_weak: set[str] = set()
    assert missing <= allowed_weak


def test_weak_checked_queries_run(spark):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, SF_SMALL)
        assert df.count() > 0, name


@pytest.mark.parametrize("name", sorted(set(QUERIES) & set(ORACLES)))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMALL).toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    assert_frames_match(sdf, ddf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 36
