"""Inventory printer: ``python -m datafusion_rdbms_ext_spark``.

Prints the executable operator inventory (the machine-checked
replacement for the reference's hand-maintained README checklist,
/root/reference/README.md:44-87): one line per registered query with
its tags and whether it carries a full DuckDB oracle or the weaker
rows-only check.
"""

from __future__ import annotations

from .queries import REGISTRY


def main() -> None:
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


if __name__ == "__main__":
    main()
