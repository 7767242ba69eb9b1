"""Cool-host claim discipline (VERDICT r12 next #4 / ADVICE r12
medium): the committed BENCH_CLAIM.json must be the coolest available
run — refresh_claim refuses a warm run outright, and --merge-min
folds only genuinely-improved or new rows into the prior claim."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

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


def test_median_loadavg():
    local = _run({"a": 1.0, "b": 2.0, "c": 3.0}, loadavg={"a": 0.5, "b": 3.0, "c": 6.0})
    assert rc.median_loadavg(local) == 3.0


def test_warm_run_refused(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    local = _run({"a": 1.0}, loadavg={"a": 5.0})
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    with pytest.raises(SystemExit, match="WARM"):
        rc.main(["note"])
    assert not (tmp_path / "BENCH_CLAIM.json").exists()


def test_cool_run_claimed(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    local = _run({"a": 1.0, "b": 2.0}, loadavg={"a": 0.5, "b": 1.5})
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    rc.main(["note"])
    claim = json.loads((tmp_path / "BENCH_CLAIM.json").read_text())
    assert claim["value"] == 3.0
    assert claim["n_queries"] == 2


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
    local = _run({"a": 1.0}, loadavg={"a": 0.5})
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    rc.main(["--merge-min", "note"])
    claim = json.loads((tmp_path / "BENCH_CLAIM.json").read_text())
    assert claim["queries"] == {"a": 1.0}
