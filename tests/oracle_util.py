"""Order-insensitive exact comparison between a Spark result and a
DuckDB oracle result — models the driver's row-count + schema +
value-hash check (BASELINE.md "Our targets")."""

from __future__ import annotations

import math
from datetime import date, datetime

import numpy as np
import pandas as pd


def _norm_cell(v):
    """Normalize one value to a hashable, engine-neutral form."""
    if v is None:
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<nan>"
        return repr(f)  # exact round-trip repr: bit-identical floats only
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, float) and math.isnan(v):
        return "<nan>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_matches(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duckdb={sorted(duck_pdf.columns)}"
    )
    srows, drows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    if srows != drows:
        # Multiset difference, not positional zip: one extra/missing row
        # early in sort order must not misreport every later row.
        from collections import Counter

        only_s = list((Counter(srows) - Counter(drows)).elements())
        only_d = list((Counter(drows) - Counter(srows)).elements())
        raise AssertionError(
            f"{name}: {len(only_s)} spark-only / {len(only_d)} duckdb-only rows; "
            f"first spark-only: {only_s[:2]}; first duckdb-only: {only_d[:2]}"
        )
