"""Every __spark_entry__ query vs its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01 — this is the local
fast loop)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from compare_util import duck_con, assert_frames_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        assert_frames_match(df, con, ORACLES[name])
    else:
        # non-SQL-expressible kernel ops: rows-only smoke (driver parity)
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj", "support", "max_score", "min_k"}
