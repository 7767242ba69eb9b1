"""Transparent materialized-view rewrite — the reference's
try-rewrite-else-fall-through optimizer contract
(/root/reference/src/optimizer.rs:14-39), pointed at a maintained
rollup instead of a remote database.

A user writes an ordinary aggregate against the BASE table; if the
plan is derivable from a registered materialized view (group
dimensions a subset of the MV's, measures re-aggregable from the
MV's partial aggregates, filters touching only dimensions), the
DataFrame is rewritten to read the MV — typically orders of magnitude
smaller — and the partials are merged with SUM. Any mismatch returns
the ORIGINAL DataFrame unchanged, so the rewrite is always
semantics-preserving or absent, never wrong.

Matching is by CANONICAL CATALYST SQL of the analyzed expressions
(``Expression.sql()`` — qualified, case-normalized), the same plan
surface the transparent federation pushdown walks (sources/
pushdown.py): an expression matches a dimension or measure iff its
canonical string equals the registered one, so alias choices and
DataFrame-vs-SQL authoring don't matter, while anything structurally
new falls through safely.

Exactness: COUNT partials re-aggregate as SUM(cnt) (integers); SUM
partials are stored as DECIMAL so re-aggregation is associative and
the rewritten result is bit-identical to the direct plan — the same
decimal-money discipline as the TPC-H aggregates.

Scale: this is the 100 TB pattern for dashboard/rollup traffic — the
daily MV is (|days| x |types|) rows regardless of event volume, so a
query served from it skips the full scan entirely; maintenance is
the incremental-view-maintenance operator in sources/sinks.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MaterializedView:
    """One registered MV: base-table identity + derivation maps."""

    base_table: str  #: unqualified base table name (SubqueryAlias id)
    mv_table: str  #: session table the rewrite reads instead
    #: canonical Catalyst SQL of a grouping expression -> MV column
    dims: dict = field(default_factory=dict)
    #: canonical Catalyst SQL of an aggregate call -> MV partial
    #: column; partials merge with SUM (COUNT partials are SUMs of
    #: counts, SUM partials are SUMs of sums — both associative).
    measures: dict = field(default_factory=dict)


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


def _strip_base_qualifier(cond: str, base_table: str) -> str:
    """Strip ``base_table.`` qualifiers at identifier boundaries on
    BOTH sides (ADVICE r7 #3) and only outside string literals: a
    pass-through group dim renders base-qualified in a HAVING
    predicate even though it names the aggregate's output column.
    ``my_events.x`` and ``db.events.x`` name OTHER relations and must
    pass through untouched."""
    import re as _re

    return _re.sub(
        r"(?<![A-Za-z0-9_.])"
        + _re.escape(f"{base_table}.")
        + r"(?=[A-Za-z_])",
        lambda m: m.group(0) if cond.count("'", 0, m.start()) % 2 == 1 else "",
        cond,
    )


def _rewrite_dim_refs(cond: str, dims: dict) -> str:
    """Remap every dimension occurrence (canonical Catalyst SQL) in a
    filter predicate to its MV column — longest dim first, at
    identifier boundaries on BOTH sides (ADVICE r7 #3: a longer
    qualified name that merely ends with the dim must not be
    partially rewritten), and only OUTSIDE string literals (ADVICE
    r8 #1: a literal that happens to contain a dim's canonical SQL —
    ``label = 'events.event_type'`` — must pass through untouched,
    the same quote-parity guard as ``_strip_base_qualifier``)."""
    import re as _re

    for dim_sql in sorted(dims, key=len, reverse=True):
        col = dims[dim_sql]
        cond = _re.sub(
            r"(?<![A-Za-z0-9_.])" + _re.escape(dim_sql) + r"(?![A-Za-z0-9_])",
            lambda m, _col=col: (
                m.group(0)
                if cond.count("'", 0, m.start()) % 2 == 1
                else _col
            ),
            cond,
        )
    return cond


def _base_matches(node, base_table: str) -> bool:
    """Walk SubqueryAlias/View wrappers down to the relation and
    check the alias chain names the MV's base table."""
    name = None
    while True:
        nm = node.getClass().getSimpleName()
        if nm == "SubqueryAlias":
            ident = node.identifier().name()
            name = ident
            node = node.child()
        elif nm == "View":
            node = node.child()
        elif nm in ("LogicalRelation", "DataSourceV2Relation"):
            return name == base_table
        else:
            return False


def mv_rewrite(df: DataFrame, mv: MaterializedView, strict: bool = False) -> DataFrame:
    """Serve ``df`` from ``mv`` if derivable, else return ``df``
    unchanged (or raise with ``strict=True``, for callers that must
    KNOW the cheap path executed)."""
    plan = df._jdf.queryExecution().analyzed()
    out = _try_rewrite(df, plan, mv)
    if out is None and plan.getClass().getSimpleName() == "Filter":
        # HAVING shape: Filter ABOVE the aggregate. Rewrite the inner
        # aggregate, then re-apply the predicate — it references the
        # aggregate's OUTPUT aliases, which the rewritten frame
        # reproduces by construction. Spark renders typed literal
        # suffixes (100L) that F.expr can't parse back; strip them.
        # Any unresolvable reference fails analysis -> fall through.
        inner = _try_rewrite(df, plan.child(), mv)
        if inner is not None:
            import re as _re

            raw = plan.condition().sql()
            # Strip typed-literal suffixes ONLY outside single-quoted
            # spans: a string literal that merely looks typed (e.g.
            # label = '100L') must not be rewritten to '100' — a
            # silent value change the forced-analysis guard below
            # cannot catch because the mutated predicate still
            # analyzes (ADVICE r6 #5). Same ''-escape quote-parity
            # rule as pushdown._in_string.
            cond = _re.sub(
                r"\b(\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)(?:BD|[DLSYF])\b",
                lambda m: (
                    m.group(0)
                    if raw.count("'", 0, m.start()) % 2 == 1
                    else m.group(1)
                ),
                raw,
            )
            # Any OTHER surviving base reference after the strip is a
            # non-output leak and must fall through, not analyze by
            # accident (the forced-analysis guard below).
            cond = _strip_base_qualifier(cond, mv.base_table)
            try:
                out = inner.filter(F.expr(cond))
                out.schema  # force analysis now, inside the guard
            except Exception:
                out = None
    if out is None:
        if strict:
            raise ValueError(f"plan not derivable from MV {mv.mv_table}")
        return df
    return out


def _try_rewrite(df: DataFrame, plan, mv: MaterializedView) -> DataFrame | None:
    if plan.getClass().getSimpleName() != "Aggregate":
        return None
    child = plan.child()
    # Optional Filter below the aggregate: every dimension occurrence
    # in the predicate is remapped to its MV column; any residual
    # base-table reference means a non-dimension column leaked in ->
    # not derivable.
    mv_filter = None
    if child.getClass().getSimpleName() == "Filter":
        cond = child.condition().sql()
        cond = _rewrite_dim_refs(cond, mv.dims)
        if f"{mv.base_table}." in cond:
            return None
        mv_filter = cond
        child = child.child()
    if not _base_matches(child, mv.base_table):
        return None

    group_cols: list[str] = []
    for g in _seq(plan.groupingExpressions()):
        col = mv.dims.get(g.sql())
        if col is None:
            return None
        group_cols.append(col)

    # Output columns in the aggregate's own order, with its aliases:
    # dim passthroughs become MV-column selects, measures become
    # SUM-of-partials aggregates.
    agg_exprs = []
    sel: list[tuple[str, str]] = []  # (source column in rewritten frame, out name)
    for e in _seq(plan.aggregateExpressions()):
        if e.getClass().getSimpleName() == "Alias":
            inner, name = e.child(), e.name()
        else:
            inner, name = e, e.name()
        isql = inner.sql()
        if isql in mv.dims:
            sel.append((mv.dims[isql], name))
        elif isql in mv.measures:
            agg_exprs.append(F.sum(mv.measures[isql]).alias(name))
            sel.append((name, name))
        else:
            return None
    if not agg_exprs:
        return None  # pure-dim projection: not an aggregate rewrite

    base = df.sparkSession.table(mv.mv_table)
    if mv_filter is not None:
        base = base.filter(F.expr(mv_filter))
    result = base.groupBy(*[F.col(c) for c in group_cols]).agg(*agg_exprs)
    return result.select(*[F.col(src).alias(name) for src, name in sel])
