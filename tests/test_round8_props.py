"""Property tests for the round-8 fold/sampling operators: each
distributed result is recomputed by an independent sequential Python
reference (hashlib md5, pure-int/IEEE arithmetic) — a second proof
alongside the DuckDB differential gate, immune to any shared-SQL
blind spot."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.queries import REGISTRY
from datafusion_rdbms_ext_spark.queries.base import ensure_tables

from .conftest import SMOKE_SF_DIR


def _phash_py(seed: str, value: str) -> int:
    """Python mirror of queries.llm._phash (60-bit md5 prefix)."""
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15], 16)


def _run(spark, name):
    return REGISTRY[name].fn(spark, SMOKE_SF_DIR).toPandas()


def test_cusum_matches_sequential_reference(spark):
    """The fold-based CUSUM equals a plain sequential loop over the
    day-ordered daily counts (exact integers end-to-end)."""
    ensure_tables(spark, SMOKE_SF_DIR)
    daily = (
        spark.table("events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(int(r["y"]))
    expect = {}
    for et, ys in series.items():
        n, s_tot = len(ys), sum(ys)
        slack, thresh = s_tot // 4, s_tot // 2
        s = t = npos = nneg = maxs = maxt = 0
        first = None
        days = [
            str(r["day"]) for r in daily if r["event_type"] == et
        ]
        for i, y in enumerate(ys):
            resid = n * y - s_tot
            s = max(0, s + resid - slack)
            t = max(0, t - resid - slack)
            if s > thresh:
                npos += 1
                if first is None:
                    first = days[i]
            if t > thresh:
                nneg += 1
            maxs, maxt = max(maxs, s), max(maxt, t)
        expect[et] = (n, npos, nneg, maxs, maxt, first)
    got = _run(spark, "ev_changepoint_cusum")
    assert len(got) == len(expect)
    for _, row in got.iterrows():
        n, npos, nneg, maxs, maxt, first = expect[row["event_type"]]
        assert (
            row["n_days"],
            row["pos_alarm_days"],
            row["neg_alarm_days"],
            row["max_cusum_up"],
            row["max_cusum_down"],
        ) == (n, npos, nneg, maxs, maxt), row["event_type"]
        got_first = (
            None
            if row["first_up_alarm_day"] is None
            else str(row["first_up_alarm_day"])
        )
        assert got_first == first, row["event_type"]


def test_priority_sample_matches_sequential_reference(spark):
    """Selection, tau and the floored-tau subset-sum estimate equal
    the sequential reference; strata with <= k docs estimate their
    total EXACTLY (tau = 0 -> est == true)."""
    from datafusion_rdbms_ext_spark.queries.llm import _PSAMP_K as K

    ensure_tables(spark, SMOKE_SF_DIR)
    docs = (
        spark.table("documents")
        .select("doc_id", "lang", "n_chars")
        .collect()
    )
    by_lang: dict[str, list[tuple[float, int, int]]] = {}
    true_tot: dict[str, int] = {}
    for r in docs:
        w = max(int(r["n_chars"]), 1)
        h = _phash_py("psam", str(r["doc_id"]))
        pri = float(w) * float(1 << 60) / (float(h) + 1.0)
        by_lang.setdefault(r["lang"], []).append((pri, int(r["doc_id"]), w))
        true_tot[r["lang"]] = true_tot.get(r["lang"], 0) + w
    got = _run(spark, "llm_sample_priority")
    for lang, rows in by_lang.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        tau = int(rows[K][0]) if len(rows) > K else 0
        samp = rows[:K]
        est = sum(max(w, tau) for _, _, w in samp)
        sub = got[got["lang"] == lang].sort_values("rk")
        assert list(sub["doc_id"]) == [d for _, d, _ in samp], lang
        assert set(sub["tau_floor"]) == {tau}, lang
        assert set(sub["est_total"]) == {est}, lang
        assert set(sub["true_total"]) == {true_tot[lang]}, lang
        if len(rows) <= K:
            assert est == true_tot[lang], lang


def test_span_corrupt_matches_sequential_reference(spark):
    """Corrupted/target strings equal a plain Python re-derivation of
    the span-masking rule for every reported document."""
    from datafusion_rdbms_ext_spark.queries.llm import (
        _SPAN_DOCS,
        _SPAN_EVERY,
    )

    ensure_tables(spark, SMOKE_SF_DIR)
    docs = (
        spark.table("documents")
        .filter(F.col("doc_id") < _SPAN_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    got = _run(spark, "llm_span_corrupt").set_index("doc_id")
    assert len(got) == len(docs)
    for r in docs:
        words = r["text"].split(" ")

        def start(j: int, doc_id=r["doc_id"]) -> bool:
            return j >= 0 and _phash_py(
                "t5span", f"{doc_id}:{j}"
            ) % _SPAN_EVERY == 0

        masked = [
            start(i) or start(i - 1) or start(i - 2)
            for i in range(len(words))
        ]
        out, runs = [], 0
        for i, (w, m) in enumerate(zip(words, masked)):
            if m:
                if i == 0 or not masked[i - 1]:
                    runs += 1
                    out.append("<X>")
            else:
                out.append(w)
        row = got.loc[r["doc_id"]]
        assert row["n_tokens"] == len(words)
        assert row["n_masked"] == sum(masked)
        assert row["n_spans"] == runs
        assert row["corrupted"] == " ".join(out)
        assert row["target"] == " ".join(
            w for w, m in zip(words, masked) if m
        )


def test_ohlc_matches_sequential_reference(spark):
    """min_by/max_by OHLC equals a plain Python scan picking first/
    last by (ts, event_id) and min/max values per (type, day)."""
    ensure_tables(spark, SMOKE_SF_DIR)
    rows = (
        spark.table("events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    bars: dict[tuple, dict] = {}
    for r in rows:
        key = (r["event_type"], str(r["ts"].date()))
        b = bars.setdefault(
            key,
            {"o": None, "ok": None, "h": r["value"], "l": r["value"],
             "c": None, "ck": None, "n": 0},
        )
        k = (r["ts"], r["event_id"])
        if b["ok"] is None or k < b["ok"]:
            b["o"], b["ok"] = r["value"], k
        if b["ck"] is None or k > b["ck"]:
            b["c"], b["ck"] = r["value"], k
        b["h"] = max(b["h"], r["value"])
        b["l"] = min(b["l"], r["value"])
        b["n"] += 1
    got = _run(spark, "ev_ohlc_bars")
    assert len(got) == len(bars)
    for _, row in got.iterrows():
        b = bars[(row["event_type"], row["day"])]
        assert (
            row["open"], row["high"], row["low"], row["close"], row["volume"]
        ) == (b["o"], b["h"], b["l"], b["c"], b["n"]), (
            row["event_type"], row["day"]
        )


def test_kmv_union_merge_property(spark):
    """The KMV merge theorem, proven directly on the engine output:
    the reported union sketch (k smallest of sketch(A) u sketch(B))
    must equal the k smallest hashes of the TRUE union — recomputed
    here in Python from the raw token hashes."""
    import re as _re

    from datafusion_rdbms_ext_spark.queries.llm import (
        _BM25_TOKRE,
        _KMV_A,
        _KMV_B,
        _KMV_K,
    )

    ensure_tables(spark, SMOKE_SF_DIR)
    docs = (
        spark.table("documents")
        .filter(F.col("source").isin(_KMV_A, _KMV_B))
        .select("source", "text")
        .collect()
    )
    hashes: set[int] = set()
    tokre = _re.compile(_BM25_TOKRE)
    for r in docs:
        for t in set(tokre.findall(r["text"].lower())):
            hashes.add(_phash_py("kmv", t))
    true_union_kmin = sorted(hashes)[:_KMV_K]
    got = _run(spark, "llm_kmv_distinct")
    urow = got[got["set_name"] == f"union:{_KMV_A}+{_KMV_B}"].iloc[0]
    assert urow["n_sk"] == len(true_union_kmin)
    assert urow["kth_hash"] == max(true_union_kmin)
    assert urow["exact_distinct"] == len(hashes)


def test_interval_coverage_matches_sequential_reference(spark):
    """The windowed gaps-and-islands merge equals a plain Python
    sweep-line union per user."""
    from datafusion_rdbms_ext_spark.operators.temporal import (
        _COVER_SPAN_US,
    )
    from datafusion_rdbms_ext_spark.functions.compat import ts_micros

    ensure_tables(spark, SMOKE_SF_DIR)
    rows = (
        spark.table("events")
        .filter(F.col("user_id") < 40)
        .select("user_id", ts_micros("ts").alias("t"))
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(int(r["t"]))
    expect = {}
    for u, ts in by_user.items():
        ivs = sorted((t, t + _COVER_SPAN_US) for t in ts)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        spans = [(e - s) // 1_000_000 for s, e in merged]
        expect[u] = (len(merged), sum(spans), max(spans))
    got = _run(spark, "op_interval_coverage")
    assert len(got) == len(expect)
    for _, row in got.iterrows():
        assert (
            row["n_islands"],
            row["covered_seconds"],
            row["longest_island_s"],
        ) == expect[row["user_id"]], row["user_id"]


def test_growth_accounting_conservation(spark):
    """The bookkeeping identities must hold exactly: wau = new +
    retained + resurrected for every week, and wau - prev_wau =
    new + resurrected - churned for every consecutive week pair."""
    got = _run(spark, "ev_growth_accounting").sort_values("week")
    assert len(got) >= 2
    prev_wau = None
    for _, r in got.iterrows():
        assert r["wau"] == r["new_users"] + r["retained"] + r["resurrected"]
        if prev_wau is not None:
            assert (
                r["wau"] - prev_wau
                == r["new_users"] + r["resurrected"] - r["churned"]
            ), r["week"]
        prev_wau = r["wau"]
