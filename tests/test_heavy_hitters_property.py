"""Property tests for the heavy-hitters sketch math.

The Spark query (llm_heavy_hitters) is only exact if the sketch
pipeline — per-partition Misra-Gries summaries, summed merge,
top-CAP truncation — provably retains every token with true
frequency > 2N/(CAP+1). The differential gate checks one corpus;
these properties check the guarantee over arbitrary streams,
partitionings, and batch splits with a deliberately tiny capacity so
the subtract/truncate paths (never triggered by the fixture's small
vocabulary) are exercised hard.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_rdbms_ext_spark.queries.llm import _mg_update

CAP = 4

tokens = st.lists(
    st.sampled_from("abcdefghij"), min_size=0, max_size=200
)
splits = st.lists(st.integers(min_value=1, max_value=7), max_size=8)


def _simulate(stream: list[str], cuts: list[int]) -> tuple[set, Counter]:
    """Run the exact pipeline shape of llm_heavy_hitters: partition
    the stream, per-partition MG over batch splits, merged sums,
    top-CAP truncation. Returns (candidate set, true counts)."""
    # partition the stream round-robin into len(cuts)+1 partitions,
    # then feed each partition to MG in batches sized by `cuts`.
    nparts = max(1, len(cuts))
    parts: list[list[str]] = [[] for _ in range(nparts)]
    for i, t in enumerate(stream):
        parts[i % nparts].append(t)
    merged: Counter = Counter()
    for p, part in enumerate(parts):
        summary: dict = {}
        step = cuts[p % len(cuts)] if cuts else len(part) or 1
        for i in range(0, len(part) or 1, step):
            batch = Counter(part[i : i + step])
            summary = _mg_update(summary, batch, CAP)
        merged.update(summary)
    top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:CAP]
    return {t for t, _ in top}, Counter(stream)


@given(tokens, splits)
@settings(max_examples=300, deadline=None)
def test_candidates_cover_all_heavy_tokens(stream, cuts):
    """Every token with true freq > 2N/(CAP+1) must survive both the
    per-partition sketch AND the merged top-CAP truncation."""
    cands, truth = _simulate(stream, cuts)
    n = sum(truth.values())
    for t, f in truth.items():
        if f * (CAP + 1) > 2 * n:
            assert t in cands, (t, f, n, cands)


@given(tokens, splits)
@settings(max_examples=300, deadline=None)
def test_filtered_recount_equals_brute_force(stream, cuts):
    """The full query semantics: exact recount of candidates filtered
    at 2N/(CAP+1) must equal the brute-force filter over ALL tokens —
    i.e. the sketch never changes the answer, only the cost."""
    cands, truth = _simulate(stream, cuts)
    n = sum(truth.values())
    via_sketch = {
        (t, f) for t, f in truth.items() if t in cands and f * (CAP + 1) > 2 * n
    }
    brute = {(t, f) for t, f in truth.items() if f * (CAP + 1) > 2 * n}
    assert via_sketch == brute


@given(tokens)
@settings(max_examples=200, deadline=None)
def test_summary_size_and_underestimate_bound(stream):
    """MG invariants on a single partition: summary never exceeds
    CAP entries, estimates never exceed true counts, and the total
    underestimate is bounded by N/(CAP+1) per subtraction round
    (i.e. est >= true - N/(CAP+1) * rounds is conservative; we check
    the standard aggregate bound est >= true - N/(CAP+1) summed)."""
    truth = Counter(stream)
    n = sum(truth.values())
    summary = _mg_update({}, truth, CAP)
    assert len(summary) <= CAP
    for t, est in summary.items():
        assert est <= truth[t]
    for t, f in truth.items():
        assert summary.get(t, 0) >= f - (n // (CAP + 1)) - 1
