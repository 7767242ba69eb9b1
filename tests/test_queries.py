"""Differential test: every registered query vs its DuckDB oracle.

This is a local replica of the driver's t2 gate (sf0.01, exact
order-insensitive match). Queries without an oracle get a rows-run
smoke check, mirroring the driver's weaker rows-only path.
"""

from __future__ import annotations

import pytest

from datafusion_rdbms_ext_spark.queries import REGISTRY

from .conftest import SF_DIR
from .oracle_util import assert_matches


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle(name, spark, oracle):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only: plan executes
        return
    duck_pdf = oracle.execute(spec.oracle).fetchdf()
    assert_matches(spark_pdf, duck_pdf, name)
