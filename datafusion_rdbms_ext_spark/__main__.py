"""Engine CLI: ``python -m datafusion_rdbms_ext_spark [command]``.

Three commands, covering what a user of the reference does today
(issue SQL against the catalog) plus this engine's own surfaces:

* ``inventory`` (default) — the executable operator inventory (the
  machine-checked replacement for the reference's hand-maintained
  README checklist, /root/reference/README.md:44-87): one line per
  registered query with tags and oracle status.
* ``sql "SELECT ..."`` — run ad-hoc SQL against the registered
  catalog (region/nation/.../documents/embeddings as temp views),
  the reference's primary entry point (whole-query SQL execution,
  physical_plan.rs:27-132) re-expressed as ``spark.sql``.
* ``query <name>`` — run one registered query by name and print it.

Both runners take ``--sf-dir`` (default /root/testdata/sf0.01) and
``--explain`` to print the formatted physical plan instead of rows.
"""

from __future__ import annotations

import argparse
import sys

from .queries import REGISTRY


def _inventory() -> None:
    by_tag: dict[str, int] = {}
    print(f"{len(REGISTRY)} registered queries\n")
    for name, spec in REGISTRY.items():
        gate = "oracle" if spec.oracle else "rows-only"
        tags = ",".join(spec.tags)
        print(f"  {name:38s} [{gate:9s}] {tags}")
        for t in spec.tags:
            by_tag[t] = by_tag.get(t, 0) + 1
    print("\nby tag:", dict(sorted(by_tag.items())))
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    print(f"oracle-checked: {n_oracle}/{len(REGISTRY)}")


def _session(sf_dir: str):
    from .queries.base import ensure_tables
    from .session import get_spark

    spark = get_spark("engine-cli")
    ensure_tables(spark, sf_dir)
    return spark


def _emit(df, explain: bool, limit: int) -> None:
    if explain:
        df.explain("formatted")
    else:
        df.show(limit, truncate=False)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="python -m datafusion_rdbms_ext_spark")
    sub = ap.add_subparsers(dest="cmd")
    sub.add_parser("inventory", help="print the operator inventory (default)")
    for cmd, arg, help_ in (
        ("sql", "statement", "ad-hoc SQL against the registered catalog"),
        ("query", "name", "run one registered query by name"),
    ):
        p = sub.add_parser(cmd, help=help_)
        p.add_argument(arg)
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        p.add_argument("--explain", action="store_true")
        p.add_argument("--limit", type=int, default=50)
    args = ap.parse_args(argv)

    if args.cmd in (None, "inventory"):
        _inventory()
        return
    spark = _session(args.sf_dir)
    if args.cmd == "sql":
        _emit(spark.sql(args.statement), args.explain, args.limit)
        return
    if args.name not in REGISTRY:
        sys.exit(f"unknown query {args.name!r} — see `inventory`")
    _emit(
        REGISTRY[args.name].fn(spark, args.sf_dir), args.explain, args.limit
    )


if __name__ == "__main__":
    main()
