"""Cool-host claim discipline (VERDICT r12 next #4 / ADVICE r12
medium): the committed BENCH_CLAIM.json must be the coolest available
run. The guard signal is the shared-row sum ratio against the prior
claim (loadavg does NOT separate warm from cool — the committed
history shows the cool r12 close at median loadavg 4.35 vs the warm
one's 3.63); --merge-min folds only genuinely-improved or new rows
into the prior claim."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "refresh_claim", os.path.join(_ROOT, "scripts", "refresh_claim.py")
)
rc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rc)


def _run(queries, median3=None, loadavg=None, errors=None):
    d = {
        "value": round(sum(queries.values()), 4),
        "value_median3": round(sum((median3 or queries).values()), 4),
        "queries": queries,
        "median3": median3 or dict(queries),
        "loadavg": loadavg or {k: 1.0 for k in queries},
        "sf": 0.1,
    }
    if errors:
        d["errors"] = errors
    return d


def _many(scale: float, n: int = 12) -> dict:
    return {f"q{i}": round(scale * (1 + i / 10), 4) for i in range(n)}


def test_shared_row_ratio():
    prior = rc.build_claim(_run(_many(1.0)), "prior")
    ratio, n = rc.shared_row_ratio(_run(_many(1.2)), prior)
    assert n == 12 and abs(ratio - 1.2) < 1e-6
    # tiny shared set -> no basis to refuse
    ratio, n = rc.shared_row_ratio(_run({"a": 9.0}), prior)
    assert (ratio, n) == (1.0, 0)


def test_warm_run_refused(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    prior = rc.build_claim(_run(_many(1.0)), "prior cool close")
    (tmp_path / "BENCH_CLAIM.json").write_text(json.dumps(prior))
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(_run(_many(1.2))))
    with pytest.raises(SystemExit, match="WARM"):
        rc.main(["note"])
    # the prior (cool) claim survives untouched
    assert json.loads((tmp_path / "BENCH_CLAIM.json").read_text()) == prior


def test_cool_run_claimed(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    prior = rc.build_claim(_run(_many(1.0)), "prior")
    (tmp_path / "BENCH_CLAIM.json").write_text(json.dumps(prior))
    local = _run(_many(1.05))  # within the noise band
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    rc.main(["note"])
    claim = json.loads((tmp_path / "BENCH_CLAIM.json").read_text())
    assert claim["value"] == local["value"]
    assert claim["n_queries"] == 12


def test_first_claim_has_no_prior_to_compare(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    local = _run({"a": 1.0, "b": 2.0})
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    rc.main(["note"])
    claim = json.loads((tmp_path / "BENCH_CLAIM.json").read_text())
    assert claim["value"] == 3.0


def test_incomplete_run_refused(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    local = _run({"a": 1.0}, errors={"b": "boom"})
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    with pytest.raises(SystemExit, match="incomplete"):
        rc.main(["note"])


def test_merge_min_keeps_cooler_rows_adds_new_drops_stale(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    prior = rc.build_claim(
        _run(
            {"a": 1.0, "b": 2.0, "gone": 9.0},
            median3={"a": 1.1, "b": 2.2, "gone": 9.9},
            loadavg={"a": 0.4, "b": 0.4, "gone": 0.4},
        ),
        "prior cool close",
    )
    (tmp_path / "BENCH_CLAIM.json").write_text(json.dumps(prior))
    # warm re-run: a slower (keep prior), b faster (take new),
    # new row appears, 'gone' dropped from the registry
    local = _run(
        {"a": 1.5, "b": 1.8, "new": 0.5},
        median3={"a": 1.6, "b": 1.9, "new": 0.6},
        loadavg={"a": 4.0, "b": 4.0, "new": 4.0},
    )
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    rc.main(["--merge-min", "r13 close"])
    claim = json.loads((tmp_path / "BENCH_CLAIM.json").read_text())
    assert claim["queries"] == {"a": 1.0, "b": 1.8, "new": 0.5}
    # per-row attribution follows the chosen sample's run
    assert claim["median3"] == {"a": 1.1, "b": 1.9, "new": 0.6}
    assert claim["loadavg"] == {"a": 0.4, "b": 4.0, "new": 4.0}
    assert claim["value"] == round(1.0 + 1.8 + 0.5, 4)
    assert claim["n_queries"] == 3
    assert "merge-min" in claim["note"]


def test_merge_min_without_prior_claims_fresh(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    local = _run({"a": 1.0})
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    rc.main(["--merge-min", "note"])
    claim = json.loads((tmp_path / "BENCH_CLAIM.json").read_text())
    assert claim["queries"] == {"a": 1.0}


def test_merge_min_legacy_prior_without_row_maps(tmp_path, monkeypatch):
    """ADVICE r13 low: a prior claim from before the per-row maps
    existed (totals + queries only) must fold without KeyError —
    median3 falls back to the chosen best-of value, loadavg to 0."""
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    prior = {
        "value": 3.0,
        "n_queries": 2,
        "sf": 0.1,
        "queries": {"a": 1.0, "b": 2.0},
        "note": "legacy",
    }
    (tmp_path / "BENCH_CLAIM.json").write_text(json.dumps(prior))
    local = _run({"a": 1.5, "b": 1.8})
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    rc.main(["--merge-min", "fold into legacy"])
    claim = json.loads((tmp_path / "BENCH_CLAIM.json").read_text())
    assert claim["queries"] == {"a": 1.0, "b": 1.8}
    assert claim["median3"]["a"] == 1.0  # fallback to the kept value
    assert claim["loadavg"]["a"] == 0.0


def test_merge_min_refuses_cross_generation_fold(tmp_path, monkeypatch):
    """ADVICE r13 low: per-row mins across fixture generations would
    commit a claim no single run produced — both sides carrying a
    fingerprint that disagrees must refuse."""
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    prior = rc.build_claim(
        _run({"a": 1.0, "b": 2.0}) | {"fixtures_fp": "gen_one"}, "prior"
    )
    (tmp_path / "BENCH_CLAIM.json").write_text(json.dumps(prior))
    local = _run({"a": 1.5, "b": 1.8}) | {"fixtures_fp": "gen_two"}
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    with pytest.raises(SystemExit, match="fixture generations"):
        rc.main(["--merge-min", "note"])
    # same generation folds fine, and the claim carries the fp
    local["fixtures_fp"] = "gen_one"
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    rc.main(["--merge-min", "note"])
    claim = json.loads((tmp_path / "BENCH_CLAIM.json").read_text())
    assert claim["fixtures_fp"] == "gen_one"
    assert claim["queries"] == {"a": 1.0, "b": 1.8}
