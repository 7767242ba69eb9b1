"""Round-14 property pins: production-k k-center (pre-pick
composition, incremental running-min rewrite, early termination) and
the depth-b tree maintenance equivalences.

The k-center rewrite claims BIT-IDENTITY to the round-13 literal-array
form; these properties pin the invariants that identity rests on —
greedy prefix stability, pre-pick(nbuckets=1) == exact, and the
oracle-matching early termination at k >= N.
"""

from __future__ import annotations

import pytest

from datafusion_rdbms_ext_spark.catalog import register_tables

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def kc(spark):
    from datafusion_rdbms_ext_spark.queries.base import ensure_tables

    ensure_tables(spark, SF_DIR)
    from datafusion_rdbms_ext_spark.queries.llm import (
        kcenter_select,
        kcenter_select_prepick,
    )

    return kcenter_select, kcenter_select_prepick


def test_kcenter_prefix_equivalence_at_two_k(spark, kc):
    """VERDICT r13 next #5: greedy prefix property at two k values —
    the k=4 selection is EXACTLY the first 4 picks of the k=8 run
    (rk, vec_id AND d2 trace), so scaling k only extends the order."""
    kcenter_select, _ = kc
    k8 = [tuple(r) for r in kcenter_select(spark, k=8).collect()]
    k4 = [tuple(r) for r in kcenter_select(spark, k=4).collect()]
    assert k4 == k8[:4]
    # coverage radius trace is non-increasing after the seed
    d2s = [r[2] for r in k8[1:]]
    assert d2s == sorted(d2s, reverse=True)


def test_kcenter_prepick_single_bucket_bit_identity(spark, kc):
    """nbuckets=1 pre-pick == the exact distributed greedy, bit-equal
    including the d2 trace: greedy over the greedy-prefix pool
    reproduces the global greedy order (the induction the docstring
    states), so the composition's only approximation is bucketing."""
    kcenter_select, kcenter_select_prepick = kc
    exact = [tuple(r) for r in kcenter_select(spark, k=6).collect()]
    pp = [
        tuple(r)
        for r in kcenter_select_prepick(spark, k=6, nbuckets=1).collect()
    ]
    assert pp == exact


def test_kcenter_prepick_pool_covers_buckets(spark, kc):
    """Stage-1 sanity: with B buckets every bucket contributes its
    own seed (min vec_id of the bucket) to the pool, so the stage-2
    greedy chooses from a corpus-wide spread, never one partition's
    view."""
    _, kcenter_select_prepick = kc
    out = [tuple(r) for r in kcenter_select_prepick(spark, k=5, nbuckets=4).collect()]
    assert len(out) == 5
    assert [r[0] for r in out] == [1, 2, 3, 4, 5]
    d2s = [r[2] for r in out[1:]]
    assert d2s == sorted(d2s, reverse=True)


def test_kcenter_early_termination_when_k_exceeds_corpus(spark, kc):
    """ADVICE r13 #4: k >= N must return N rows (the oracle's
    recursive CTE simply stops), never raise — both the exact form
    and the pre-pick composition."""
    kcenter_select, kcenter_select_prepick = kc
    tiny = spark.table("embeddings").orderBy("vec_id").limit(3)
    tiny.createOrReplaceTempView("embeddings")
    try:
        got = [tuple(r) for r in kcenter_select(spark, k=10).collect()]
        assert len(got) == 3
        assert got[0][0] == 1 and got[0][2] == 0
        pp = [
            tuple(r)
            for r in kcenter_select_prepick(spark, k=10, nbuckets=2).collect()
        ]
        assert len(pp) == 3
        assert {r[1] for r in pp} == {r[1] for r in got}
    finally:
        register_tables(spark, SF_DIR)  # restore the fixture view


def test_tree_training_assignment_equals_frozen_assignment(spark):
    """The reuse claim the round-14 maintenance optimization rests
    on: the training chain's own assignment (every level assigns
    against its FINAL centroids) is BIT-IDENTICAL to walking the
    frozen tree with the exported centroids — so maintenance may
    skip re-assigning the rows it just trained on."""
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.queries.llm import (
        _quantize,
        tree_assign_frozen,
        tree_train_deep,
    )

    ensure_tables(spark, SF_DIR)
    q = _quantize(spark).localCheckpoint()
    cents1, keyed, train_asg = tree_train_deep(q, (4, 3))
    frozen = tree_assign_frozen(q, cents1, keyed)
    a = sorted(map(tuple, train_asg.collect()))
    b = sorted(map(tuple, frozen.collect()))
    assert a == b and len(a) == q.count()


def test_tree_maintain_gate_row_matches_oracle(spark, oracle):
    """End-to-end differential for the new gate row (the maintained
    tree == fresh tree equivalence IS the oracle), plus shape pins:
    one row per level-1 cell of the maintained tree, admission
    columns partition n_new."""
    from datafusion_rdbms_ext_spark.queries import REGISTRY

    spec = REGISTRY["llm_semdedup_tree_maintain"]
    got = [tuple(r) for r in spec.fn(spark, SF_DIR).collect()]
    exp = [tuple(r) for r in oracle.execute(spec.oracle).fetchall()]
    assert got == exp
    for _, n_vecs, n_moved, n_new, dc, dbo, adm in got:
        assert n_moved <= n_vecs
        assert dc + dbo + adm == n_new


def test_tree_beam1_equals_single_path_probes(spark):
    """The beam walk's generalization claim: beam=1 reproduces the
    single-path probe set BIT-IDENTICALLY — same level-1 argmin, and
    at the leaf level ranking by (dist, packed key) within one
    prefix coincides with the single-path (dist, cid) order (the
    packed key is monotone in cid at fixed prefix). So the gate
    row's beam=2 differs from llm_sim_topk_tree ONLY by multi-path
    prefix selection."""
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.queries.llm import (
        _SEM_NPROBE,
        _TREE_SEARCH_B,
        _quantize,
        tree_index_deep,
        tree_probe_beam,
        tree_train_deep,
    )

    ensure_tables(spark, SF_DIR)
    _, single = tree_index_deep(spark, _TREE_SEARCH_B, nprobe=_SEM_NPROBE)
    cents1, keyed, _ = tree_train_deep(_quantize(spark), _TREE_SEARCH_B)
    panel = _quantize(spark).filter(F.col("vec_id") < 30)
    beam1 = tree_probe_beam(panel, cents1, keyed, beam=1, nprobe=_SEM_NPROBE)
    a = sorted(map(tuple, single.filter(F.col("vec_id") < 30).collect()))
    b = sorted(map(tuple, beam1.collect()))
    assert a == b and len(b) == 30 * _SEM_NPROBE


def test_tree_beam_probes_nearer_leaves_at_same_budget(spark):
    """The same-budget improvement claim: per query, beam=2 still
    emits exactly nprobe leaves, and the summed centroid distance of
    its probed leaves is <= beam=1's — top-nprobe over a SUPERSET of
    candidate leaves (two prefixes' children vs one's) can only get
    nearer. Verified against the exported leaf centroids in exact
    integer arithmetic."""
    import numpy as np
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.queries.llm import (
        _SEM_NPROBE,
        _TREE_PACK,
        _TREE_SEARCH_B,
        _quantize,
        tree_probe_beam,
        tree_train_deep,
    )

    ensure_tables(spark, SF_DIR)
    cents1, keyed, _ = tree_train_deep(_quantize(spark), _TREE_SEARCH_B)
    leaf_cents = {
        (r["cell"], r["cid"]): np.array(r["cemb"], dtype=np.int64)
        for r in keyed[-1].collect()
    }
    panel = _quantize(spark).filter(F.col("vec_id") < 30).localCheckpoint()
    eq = {r["vec_id"]: np.array(r["eq"], dtype=np.int64) for r in panel.collect()}

    def dist_sum(probes):
        by_q: dict[int, int] = {}
        for r in probes.collect():
            prefix, cid = divmod(r["cell"], _TREE_PACK)
            d = leaf_cents[(prefix, cid)] - eq[r["vec_id"]]
            by_q[r["vec_id"]] = by_q.get(r["vec_id"], 0) + int(d @ d)
        return by_q

    d1 = dist_sum(tree_probe_beam(panel, cents1, keyed, beam=1, nprobe=_SEM_NPROBE))
    d2 = dist_sum(tree_probe_beam(panel, cents1, keyed, beam=2, nprobe=_SEM_NPROBE))
    assert set(d1) == set(d2) == set(eq)
    assert all(d2[q] <= d1[q] for q in d1)
    assert any(d2[q] < d1[q] for q in d1)  # the knob actually engages


def test_retrieval_eval_metric_invariants(spark, oracle):
    """The nDCG row's internal consistency, independent of the
    differential gate: DCG can never exceed the ideal DCG (so
    0 <= nDCG <= 1), P@10 is exactly hits * 100000 ppm over the
    10-deep cut, MRR is a reciprocal rank in (0, 1] or 0, and the
    graded gains follow 2^rel - 1 by construction (saturation guard:
    at least one query must NOT be perfect, or the relevance band
    has degenerated back to trivial)."""
    from datafusion_rdbms_ext_spark.queries import REGISTRY

    rows = [
        r.asDict()
        for r in REGISTRY["llm_retrieval_eval_ndcg"].fn(spark, SF_DIR).collect()
    ]
    assert [r["q_id"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["dcg10"] <= r["idcg10"]
        assert 0.0 <= r["ndcg10"] <= 1.0
        assert r["p10_ppm"] % 100000 == 0 and 0 <= r["p10_ppm"] <= 1000000
        assert r["mrr10"] == 0.0 or 0.0 < r["mrr10"] <= 1.0
        assert r["n_retrieved"] <= 10
        assert r["n_rel"] > 0
    assert any(r["ndcg10"] < 1.0 for r in rows)


def test_retrieval_arms_share_one_truth(spark, oracle):
    """The arm comparison's comparability contract: all three arms
    are scored against the SAME ideal (identical idcg10 and n_rel on
    every row — one truth, three rankers), each arm retrieves the
    full 10-deep cut, and the metric bounds hold per arm."""
    from datafusion_rdbms_ext_spark.queries import REGISTRY

    rows = [
        r.asDict()
        for r in REGISTRY["llm_retrieval_eval_arms"].fn(spark, SF_DIR).collect()
    ]
    assert [r["arm"] for r in rows] == ["bm25", "dense", "rrf"]
    assert len({r["idcg10"] for r in rows}) == 1
    assert len({r["n_rel"] for r in rows}) == 1
    for r in rows:
        assert r["n_retrieved"] == 10
        assert r["dcg10"] <= r["idcg10"]
        assert 0.0 <= r["ndcg10"] <= 1.0
        assert r["p10_ppm"] % 100000 == 0
