"""Transparent file-skipping rewrite — the composed zonemap+Bloom
index (sources/sinks.py) wired into the try-rewrite-else-fall-through
optimizer contract (/root/reference/src/optimizer.rs:14-39), the same
seam the MV rewrite (plans/mv.py) uses.

A user writes an ordinary filter/aggregate against the BASE table; if
the analyzed plan is a conjunctive point/range predicate over the
indexed columns above the base scan, the frame is rewritten to read
ONLY the index-surviving files (zonemap range overlap, then Bloom
membership over the survivors) with the FULL original predicate
re-applied below — so pruning only ever removes whole files the
predicate can't touch, never rows. Any other shape returns the
ORIGINAL frame unchanged: semantics-preserving or absent, never
wrong.

Eligibility is deliberately conservative: the predicate must be a
pure conjunction (any ``OR``/``NOT`` falls through — a disjunct
involving the range column would make file pruning by that range
unsound), and at least one indexed atom (``range_col >= / <= / =``
literals or ``point_col = literal``) must be present at the top
level. Residual conjuncts are fine: the whole predicate re-applies
on the pruned scan.

Scale: the zonemap stage is driver-side manifest metadata (KBs at
any table size); the Bloom stage reads bit-pruned slices of the
file-keyed index table; the data scan opens only the surviving files
— at 100 TB a point-in-range dashboard query touches a handful of
files instead of the clustered range's hundreds.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .mv import _base_matches, _seq, _strip_base_qualifier


@dataclass
class SkippingIndex:
    """Handle to a composed skipping index over one base table."""

    base_table: str  #: unqualified base table name (SubqueryAlias id)
    root: str  #: index root (manifest.json + bloom/ parquet)
    manifest: dict  #: file -> [min, max] zonemap over range_col
    m: int  #: bloom bitmap width
    range_col: str  #: zonemap column (e.g. l_orderkey)
    point_col: str  #: bloom column (e.g. l_suppkey)


def _strip_typed_suffix(n: str) -> int:
    return int(re.sub(r"(?:BD|[DLSYF])$", "", n))


def _extract_atoms(cond: str, idx: SkippingIndex):
    """(lo, hi, key) extracted from a pure conjunction, or None if
    the predicate shape is ineligible. Any atom may be absent."""
    u = f" {cond.upper()} "
    if " OR " in u or " NOT " in u or "NOT(" in u.replace(" ", ""):
        return None
    q = re.escape(f"{idx.base_table}.")
    # Catalyst renders the literal either bare (`300`, `300L`) or
    # wrapped in a widening cast (`CAST(300 AS BIGINT)`)
    num = r"(?:CAST\((\d+) AS [A-Z]+\)|(\d+)(?:BD|[DLSYF])?\b)"

    def one(col: str, op: str):
        ms = re.findall(rf"{q}{col} {re.escape(op)} {num}", cond)
        if len(ms) != 1:
            return None
        cast_n, bare_n = ms[0]
        return int(cast_n or bare_n)

    lo = one(idx.range_col, ">=")
    hi = one(idx.range_col, "<=")
    key = one(idx.point_col, "=")
    if lo is None and hi is None and key is None:
        return None  # nothing indexed in the predicate
    if (lo is None) != (hi is None):
        return None  # half-open range: zonemap probe API is closed
    return lo, hi, key


def _try_filter_scan(
    spark: SparkSession, node, idx: SkippingIndex
) -> DataFrame | None:
    """Rewrite ``Filter(base scan)`` to the pruned-file scan with the
    full predicate re-applied; None if not that shape."""
    from ..sources.sinks import composed_skip_files, zonemap_prune

    if node.getClass().getSimpleName() != "Filter":
        return None
    if not _base_matches(node.child(), idx.base_table):
        return None
    cond = node.condition().sql()
    atoms = _extract_atoms(cond, idx)
    if atoms is None:
        return None
    lo, hi, key = atoms
    if lo is None:
        bounds = [b for mm in idx.manifest.values() for b in mm]
        lo, hi = min(bounds), max(bounds)
    if key is None:
        files = zonemap_prune(idx.manifest, lo, hi)
    else:
        _, files = composed_skip_files(
            spark, idx.root, idx.manifest, idx.m, lo, hi, key
        )
    # re-apply the FULL original predicate (dequalified; typed
    # literal suffixes stripped outside string literals — the mv.py
    # discipline) on the pruned scan
    plain = re.sub(
        r"\b(\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)(?:BD|[DLSYF])\b",
        lambda m: (
            m.group(0) if cond.count("'", 0, m.start()) % 2 == 1 else m.group(1)
        ),
        cond,
    )
    plain = _strip_base_qualifier(plain, idx.base_table)
    if not files:
        # every file pruned: a zero-read scan of one file's schema,
        # statically empty
        files = sorted(idx.manifest)[:1]
        return spark.read.parquet(*files).filter(F.lit(False))
    out = spark.read.parquet(*files).filter(F.expr(plain))
    out.schema  # force analysis inside the guard
    return out


def _raise():
    raise ValueError("plan not servable from skipping index")


def skipping_rewrite(
    df: DataFrame, idx: SkippingIndex, strict: bool = False
) -> DataFrame:
    """Serve ``df`` through the skipping index if its plan is an
    eligible point/range filter over the base table (optionally under
    a Project or an Aggregate), else return ``df`` unchanged (or
    raise with ``strict=True``, for callers that must KNOW the pruned
    path executed)."""
    spark = df.sparkSession
    plan = df._jdf.queryExecution().analyzed()
    out = None
    try:
        nm = plan.getClass().getSimpleName()
        if nm == "Filter":
            out = _try_filter_scan(spark, plan, idx)
        elif nm in ("Project", "Aggregate"):
            inner = _try_filter_scan(spark, plan.child(), idx)
            if inner is not None:
                if nm == "Project":
                    sel = []
                    for e in _seq(plan.projectList()):
                        if e.getClass().getSimpleName() == "Alias":
                            e_in, name = e.child(), e.name()
                        else:
                            e_in, name = e, e.name()
                        sql = _strip_base_qualifier(e_in.sql(), idx.base_table)
                        sel.append(F.expr(sql).alias(name))
                    out = inner.select(*sel)
                else:
                    # grouping expressions must be plain column refs
                    # (computed dims fall through — the conservative
                    # contract)
                    group_sqls = []
                    for g in _seq(plan.groupingExpressions()):
                        if g.getClass().getSimpleName() != "AttributeReference":
                            return df if not strict else _raise()
                        group_sqls.append(
                            _strip_base_qualifier(g.sql(), idx.base_table)
                        )
                    agg_exprs, order = [], []
                    for e in _seq(plan.aggregateExpressions()):
                        if e.getClass().getSimpleName() == "Alias":
                            e_in, name = e.child(), e.name()
                        else:
                            e_in, name = e, e.name()
                        sql = _strip_base_qualifier(e_in.sql(), idx.base_table)
                        if sql in group_sqls:
                            order.append((sql, name))
                        else:
                            agg_exprs.append(F.expr(sql).alias(name))
                            order.append((name, name))
                    if not agg_exprs:
                        out = None
                    else:
                        res = (
                            inner.groupBy(*[F.col(s) for s in group_sqls]).agg(
                                *agg_exprs
                            )
                            if group_sqls
                            else inner.agg(*agg_exprs)
                        )
                        out = res.select(
                            *[F.col(src).alias(name) for src, name in order]
                        )
                if out is not None:
                    out.schema  # force analysis inside the guard
    except Exception:
        out = None
    if out is None:
        if strict:
            raise ValueError("plan not servable from skipping index")
        return df
    return out
