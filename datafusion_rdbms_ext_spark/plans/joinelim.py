"""Primary-key / foreign-key join elimination — the classical
redundant-join removal every warehouse optimizer ships (and the
reference's optimizer seam, /root/reference/src/optimizer.rs:14-39,
would host): an INNER equi-join from a fact to a dimension whose key
is unique can be dropped entirely when the query references no
dimension columns, because each surviving fact row matches exactly
one dimension row — the join changes neither cardinality nor values.

Soundness conditions (all three required):

1. the dimension key is UNIQUE (n-to-1, never n-to-m) — otherwise
   the join would duplicate fact rows;
2. every non-null fact FK value has a dimension match (referential
   integrity) — otherwise the inner join would DROP fact rows;
3. the rewritten plan keeps the inner join's implicit
   ``fk IS NOT NULL`` filter — a NULL FK never matches, so the
   filter preserves cardinality exactly (and pushes to the scan).

Conditions 1-2 are facts about the DATA, not the query, so they are
DECLARED once per relationship (``declare_fk``) the way production
warehouses declare RELY constraints (Snowflake/Oracle) or Spark
itself consumes informational constraints for this exact rewrite —
and ``validate_fk`` makes the declaration checkable: one distributed
anti-join + one duplicate-count, run at load time or in CI (the test
suite runs it on the fixtures), never per query.

Scale: this is the 100 TB rewrite with the single largest payoff per
line — it removes an entire shuffle (or broadcast build) of the fact
table. A BI layer that always joins its star schema emits thousands
of such queries where the dimension contributes nothing but the FK
itself.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: (fact_table, fk_col) -> (dim_table, pk_col); declared, validatable.
_DECLARED: dict[tuple[str, str], tuple[str, str]] = {}


@dataclass(frozen=True)
class FkViolation:
    """Outcome of :func:`validate_fk` — zero fields means sound."""

    orphan_fk_rows: int
    duplicate_pk_values: int

    @property
    def ok(self) -> bool:
        return self.orphan_fk_rows == 0 and self.duplicate_pk_values == 0


def declare_fk(fact: str, fk: str, dim: str, pk: str) -> None:
    """Register a RELY-style informational constraint."""
    _DECLARED[(fact, fk)] = (dim, pk)


def declared_fk(fact: str, fk: str) -> tuple[str, str] | None:
    return _DECLARED.get((fact, fk))


def validate_fk(
    spark: SparkSession, fact: str, fk: str, dim: str, pk: str
) -> FkViolation:
    """Check the two data conditions distributedly: an anti-join for
    orphans (non-null FK values with no dimension match) and a
    grouped count for PK duplicates. Both aggregate to one number —
    run once at load time, never inside the rewrite."""
    f = spark.table(fact).select(F.col(fk).alias("k")).where(
        F.col(fk).isNotNull()
    )
    d = spark.table(dim).select(F.col(pk).alias("k"))
    orphans = f.join(d, "k", "left_anti").count()
    dups = (
        d.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    return FkViolation(orphan_fk_rows=orphans, duplicate_pk_values=dups)


def fk_join(
    spark: SparkSession,
    fact: str,
    dim: str,
    fk: str,
    pk: str,
    needed: list[str],
) -> DataFrame:
    """Inner equi-join ``fact.fk = dim.pk`` projected to ``needed`` —
    OR the provably-equivalent join-free plan when ``needed`` touches
    no dimension column and the FK relationship is declared.

    Try-rewrite-else-fall-through: an undeclared relationship or any
    dimension column in ``needed`` builds the ordinary join, so the
    helper is never wrong, only sometimes faster (the optimizer.rs
    contract)."""
    dim_cols = set(spark.table(dim).columns)
    wants_dim = any(c in dim_cols for c in needed)
    if not wants_dim and declared_fk(fact, fk) == (dim, pk):
        # condition 3: inner-join cardinality == non-null-FK rows
        return (
            spark.table(fact)
            .where(F.col(fk).isNotNull())
            .select(*needed)
        )
    joined = spark.table(fact).join(
        spark.table(dim), F.col(fk) == F.col(pk), "inner"
    )
    return joined.select(*needed)
