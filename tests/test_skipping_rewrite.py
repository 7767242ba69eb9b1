"""Transparent skipping-rewrite contract (round 9, VERDICT r8 #6).

The rewrite must (a) serve an eligible point/range plan from the
index's pruned file list — the scan reads ONLY surviving files —
with values identical to the direct plan, and (b) fall through
UNCHANGED for every ineligible shape (the optimizer.rs:14-39
try-rewrite-else-fall-through contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.functions.compat import dsum
from datafusion_rdbms_ext_spark.plans.skipping import skipping_rewrite
from datafusion_rdbms_ext_spark.queries.base import ensure_tables
from datafusion_rdbms_ext_spark.sources.sinks import (
    _REWRITE_HI,
    _REWRITE_KEY,
    _REWRITE_LO,
    composed_skip_files,
    composed_skipping_index,
)

from .conftest import SF_DIR


@pytest.fixture()
def idx(spark):
    ensure_tables(spark, SF_DIR)
    return composed_skipping_index(spark, SF_DIR)


def _user_filter(spark):
    return spark.table("lineitem").filter(
        F.col("l_orderkey").between(_REWRITE_LO, _REWRITE_HI)
        & (F.col("l_suppkey") == _REWRITE_KEY)
    )


def test_rewrite_reads_only_surviving_files(spark, idx):
    """The served scan's input files must be exactly the index's
    doubly-surviving list — a strict subset of the layout."""
    served = skipping_rewrite(_user_filter(spark), idx, strict=True)
    _, files = composed_skip_files(
        spark, idx.root, idx.manifest, idx.m,
        _REWRITE_LO, _REWRITE_HI, _REWRITE_KEY,
    )
    read = {f.replace("file://", "") for f in served.inputFiles()}
    assert read == set(files), (sorted(read), sorted(files))
    assert 0 < len(read) < len(idx.manifest)  # real pruning happened


def test_rewrite_values_identical_to_direct_plan(spark, idx):
    user = _user_filter(spark).select("l_orderkey", "l_suppkey", "l_quantity")
    served = skipping_rewrite(user, idx, strict=True)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, user.collect())
    )


def test_rewrite_serves_grouped_aggregate(spark, idx):
    user = (
        _user_filter(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_quantity")).alias("qty"),
        )
    )
    served = skipping_rewrite(user, idx, strict=True)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, user.collect())
    )


def test_rewrite_zero_files_is_statically_empty(spark, idx):
    """A key absent from every surviving file prunes everything: the
    rewrite returns a zero-read, statically-empty frame."""
    user = spark.table("lineitem").filter(
        F.col("l_orderkey").between(_REWRITE_LO, _REWRITE_HI)
        & (F.col("l_suppkey") == 10**12 + 7)
    )
    served = skipping_rewrite(user, idx)
    # bloom fpp can leave <=1 ghost file; rows must still be 0
    assert served.count() == 0


def test_rewrite_range_only_uses_zonemap_stage(spark, idx):
    user = spark.table("lineitem").filter(
        F.col("l_orderkey").between(_REWRITE_LO, _REWRITE_HI)
    )
    served = skipping_rewrite(user, idx, strict=True)
    assert len(served.inputFiles()) < len(idx.manifest)
    assert served.count() == user.count()


def test_fall_through_shapes_return_original(spark, idx):
    """OR at top level, NOT, non-indexed column, half-open range,
    other table: every one returns the ORIGINAL frame object."""
    li = spark.table("lineitem")
    shapes = [
        li.filter(
            (F.col("l_orderkey") <= 900) | (F.col("l_suppkey") == 2)
        ),
        li.filter(~F.col("l_orderkey").between(300, 900)),
        li.filter(F.col("l_partkey") == 5),
        li.filter(F.col("l_orderkey") >= 300),  # half-open
        spark.table("orders").filter(F.col("o_orderkey") <= 900),
    ]
    for bad in shapes:
        assert skipping_rewrite(bad, idx) is bad
        with pytest.raises(ValueError):
            skipping_rewrite(bad, idx, strict=True)


def test_case_nested_comparison_is_not_a_conjunct_atom(spark, idx):
    """ADVICE r9 #1 regression: a comparison nested inside CASE WHEN
    (no OR/NOT anywhere, so the old string guard let it through) must
    NOT be treated as a top-level conjunct — the predicate below is
    a tautology matching EVERY row, and pruning by the non-binding
    ``l_suppkey = _REWRITE_KEY`` or range atoms would silently drop
    rows."""
    li = spark.table("lineitem")
    taut = F.expr(
        f"CASE WHEN l_suppkey = {_REWRITE_KEY} THEN 1 ELSE 1 END = 1"
    )
    user = li.filter(taut)
    assert skipping_rewrite(user, idx) is user  # no atoms -> fall through
    # range form: CASE-wrapped range comparisons are equally non-binding
    taut2 = F.expr(
        f"CASE WHEN l_orderkey >= {_REWRITE_LO} THEN 1 ELSE 1 END = 1"
        f" AND CASE WHEN l_orderkey <= {_REWRITE_HI} THEN 1 ELSE 1 END = 1"
    )
    user2 = li.filter(taut2)
    assert skipping_rewrite(user2, idx) is user2
    # and the sound mixed shape: a REAL conjunct range atom alongside a
    # CASE conjunct still rewrites, full predicate re-applied
    user3 = li.filter(
        F.col("l_orderkey").between(_REWRITE_LO, _REWRITE_HI) & taut
    )
    served = skipping_rewrite(user3, idx, strict=True)
    assert served.count() == user3.count()


def test_or_in_residual_conjunct_is_sound_and_served(spark, idx):
    """Tree-walk upgrade: an OR inside ANOTHER conjunct no longer
    forces fall-through — the range atom is still a top-level
    conjunct, so pruning by it is implied; the OR re-applies on the
    pruned scan."""
    li = spark.table("lineitem")
    user = li.filter(
        F.col("l_orderkey").between(_REWRITE_LO, _REWRITE_HI)
        & ((F.col("l_suppkey") == _REWRITE_KEY) | (F.col("l_quantity") > 10))
    )
    served = skipping_rewrite(user, idx, strict=True)
    assert len(served.inputFiles()) < len(idx.manifest)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, user.collect())
    )


def test_fall_through_literal_containing_atom_text(spark, idx):
    """A string literal that happens to contain an indexed atom's
    text must not make the plan eligible by regex accident — the
    extra conjunct is re-applied either way, so values are safe, but
    the quote-parity discipline (ADVICE r8 #1) still applies to the
    re-applied predicate."""
    li = spark.table("lineitem")
    user = li.filter(
        F.col("l_orderkey").between(_REWRITE_LO, _REWRITE_HI)
        & (F.col("l_suppkey") == _REWRITE_KEY)
        & (F.col("l_returnflag") != "lineitem.l_orderkey >= 1L")
    )
    served = skipping_rewrite(user, idx)
    assert served.count() == user.count()


def test_string_cast_comparison_is_not_an_atom(spark, idx):
    """ADVICE r10 #1: CAST(l_orderkey AS STRING) >= '300' is a
    LEXICOGRAPHIC comparison ('31' > '300' holds for value 31), so
    accepting it as a numeric range atom prunes files whose rows
    satisfy the real predicate. Non-numeric casts must reject the
    atom -> whole plan falls through unchanged."""
    li = spark.table("lineitem")
    user = li.filter(
        (F.col("l_orderkey").cast("string") >= f"{_REWRITE_LO}")
        & (F.col("l_orderkey").cast("string") <= f"{_REWRITE_HI}")
    )
    assert skipping_rewrite(user, idx) is user  # fall through
    # and the values the user gets are the lexicographic semantics
    lex = user.count()
    num = li.filter(
        F.col("l_orderkey").between(_REWRITE_LO, _REWRITE_HI)
    ).count()
    assert lex != num  # the two semantics genuinely differ on this data


def test_float_cast_comparison_is_not_an_atom(spark, idx):
    """ADVICE r11 #4: cast(col AS DOUBLE) rounds bigints beyond 2^53,
    so cast(col AS DOUBLE) >= L can hold while col < L — a float-cast
    atom could prune a file containing a matching row. float/double
    are no longer accepted widening targets: the plan falls through
    unchanged."""
    li = spark.table("lineitem")
    for tgt in ("double", "float"):
        user = li.filter(
            (F.col("l_orderkey").cast(tgt) >= float(_REWRITE_LO))
            & (F.col("l_orderkey").cast(tgt) <= float(_REWRITE_HI))
        )
        assert skipping_rewrite(user, idx) is user  # fall through


def test_numeric_widening_cast_still_accepts_atom(spark, idx):
    """Order-preserving casts (decimal widening of an integral
    column; float/double excluded per ADVICE r11 #4) still yield
    atoms — the r10 fix must not regress the
    Catalyst-inserted-cast path that makes integer comparisons work
    at all."""
    li = spark.table("lineitem")
    user = li.filter(
        (F.col("l_orderkey").cast("decimal(20,0)") >= _REWRITE_LO)
        & (F.col("l_orderkey").cast("decimal(20,0)") <= _REWRITE_HI)
        & (F.col("l_suppkey") == _REWRITE_KEY)
    )
    served = skipping_rewrite(user, idx, strict=True)
    assert len(served.inputFiles()) < len(idx.manifest)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, user.collect())
    )
