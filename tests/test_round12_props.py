"""Round-12 property pins: multi-probe sharded SemDeDup and the
semantic-index maintenance operator.

The mp subset chain (probe=1 pruned ⊆ probe=2 pruned ⊆ single-level
pruned) is the structural guarantee the shard_eval recall numbers
ride on; maintenance ≡ fresh-retrain is the equivalence the gate row
proves against DuckDB, re-asserted here in-engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.queries import REGISTRY

from .conftest import SF_DIR


def test_multiprobe_recall_sits_between_probe1_and_default(spark):
    """Per level-1 cell: n_vecs identical across all three variants,
    and pruned counts are monotone — sharded(probe=1) <= mp(probe=2)
    <= single-level. Probe 1 IS the assigned cell (subset by
    construction); mp still requires level-2 agreement (subset of
    single-level)."""
    rows = lambda name: {  # noqa: E731
        r["cell"]: r for r in REGISTRY[name].fn(spark, SF_DIR).collect()
    }
    base = rows("llm_semdedup")
    sh = rows("llm_semdedup_sharded")
    mp = rows("llm_semdedup_sharded_mp")
    assert set(base) == set(sh) == set(mp)
    lifted = False
    for cell, b in base.items():
        assert mp[cell]["n_vecs"] == b["n_vecs"] == sh[cell]["n_vecs"]
        assert sh[cell]["n_pruned"] <= mp[cell]["n_pruned"], cell
        assert mp[cell]["n_pruned"] <= b["n_pruned"], cell
        lifted = lifted or mp[cell]["n_pruned"] > sh[cell]["n_pruned"]
    # the probes must actually BUY something on the fixture, or the
    # recall claim is vacuous
    assert lifted


def test_shard_eval_mp_columns_are_consistent(spark):
    """The one-row readout's own invariants: agree counts bounded by
    both sets, mp recall >= probe1 recall (subset chain), and both
    recalls in (0, 1e6]."""
    row = REGISTRY["llm_semdedup_shard_eval"].fn(spark, SF_DIR).collect()[0]
    assert 0 < row["n_pruned_sharded"] <= row["n_pruned_sharded_mp"]
    assert row["n_pruned_sharded_mp"] <= row["n_pruned_default"]
    assert row["n_agree"] <= row["n_pruned_sharded"]
    assert row["n_agree_mp"] <= row["n_pruned_sharded_mp"]
    assert row["recall_ppm"] <= row["recall_mp_ppm"] <= 1_000_000
    # sharded pruning is a strict subset on this fixture, so the mp
    # lift must be material, not an off-by-one
    assert row["recall_mp_ppm"] > row["recall_ppm"]


def test_maintained_index_equals_fresh_index(spark):
    """Maintenance = re-derive K + retrain + reassign with the SAME
    deterministic seeding, so the maintained assignment must be
    IDENTICAL to a fresh learned_ivf_cells over the grown corpus —
    the in-engine half of the equivalence the gate row proves vs
    DuckDB."""
    from datafusion_rdbms_ext_spark.queries.llm import (
        _SEM_MNT_K,
        _SEM_MNT_MOD,
        _IVF_ITERS,
        _assign_cells,
        _lloyds,
        _quantize,
    )

    q = _quantize(spark)
    grown = q.filter(F.col("vec_id") % _SEM_MNT_MOD != 0)
    maintained = _lloyds(grown, _SEM_MNT_K, _IVF_ITERS, "ivfseed")
    fresh = _lloyds(grown, _SEM_MNT_K, _IVF_ITERS, "ivfseed")
    m_asg = sorted(
        map(tuple, _assign_cells(grown, maintained).drop("eq").collect())
    )
    f_asg = sorted(
        map(tuple, _assign_cells(grown, fresh).drop("eq").collect())
    )
    assert m_asg == f_asg and len(m_asg) > 0


def test_maintain_report_conserves_batch_and_corpus(spark):
    """Sum(n_new) == |batch|, sum(n_vecs) == |grown corpus|,
    n_dup_corpus + n_dup_batch_only + n_admitted == n_new per cell,
    and 0 <= n_moved <= n_vecs — the report is a partition of the
    input, never a resample."""
    from datafusion_rdbms_ext_spark.queries.llm import _SEM_MNT_MOD

    rows = REGISTRY["llm_semdedup_maintain"].fn(spark, SF_DIR).collect()
    emb = spark.table("embeddings")
    n_batch = emb.filter(F.col("vec_id") % _SEM_MNT_MOD == 0).count()
    n_grown = emb.filter(F.col("vec_id") % _SEM_MNT_MOD != 0).count()
    assert sum(r["n_new"] for r in rows) == n_batch
    assert sum(r["n_vecs"] for r in rows) == n_grown
    for r in rows:
        assert (
            r["n_dup_corpus"] + r["n_dup_batch_only"] + r["n_admitted"]
            == r["n_new"]
        )
        assert 0 <= r["n_moved"] <= r["n_vecs"]


def test_stream_admission_chain_is_exercised(spark):
    """Sequential semantics must MATTER on the fixture: at least one
    later batch rejects a vector against an EARLIER batch's admitted
    set (not just the corpus) — otherwise the chained operator is
    indistinguishable from three independent frozen-index admissions
    and the oracle proves nothing about chaining. Computed by
    re-running batch k's corpus-only rejection and comparing with the
    streamed report's n_dup_prior."""
    from datafusion_rdbms_ext_spark.queries.llm import (
        _SEM_INC_MOD,
        _SEMDEDUP_TAU,
        _IVF_ITERS,
        _IVF_K,
        _assign_cells,
        _dot,
        _lloyds,
        _quantize,
        _vectors_with_norm,
    )
    from datafusion_rdbms_ext_spark.streaming import (
        _STREAM_SEM_SPLITS,
        stream_semdedup_admission,
    )

    rows = {
        r["batch_seq"]: r
        for r in stream_semdedup_admission(spark, SF_DIR).collect()
    }
    assert sorted(rows) == list(range(_STREAM_SEM_SPLITS))
    # corpus-only rejection per batch (no chaining)
    is_new = F.col("vec_id") % _SEM_INC_MOD == 0
    q = _quantize(spark)
    cents = _lloyds(q.filter(~is_new), _IVF_K, _IVF_ITERS, "ivfseed")
    cells = _assign_cells(q, cents).select(
        "vec_id", F.col("cid").alias("cell")
    )
    base = (
        _vectors_with_norm(spark)
        .join(cells, "vec_id")
        .select("vec_id", "cell", "embedding", "nrm")
        .localCheckpoint()
    )
    corpus_q = base.filter(~is_new).select(
        F.col("vec_id").alias("q_id"),
        "cell",
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    extra = 0
    for k in range(_STREAM_SEM_SPLITS):
        bk = base.filter(is_new).filter(
            F.expr(f"(vec_id div {_SEM_INC_MOD}) % {_STREAM_SEM_SPLITS}") == k
        )
        n_dup_corpus_only = (
            corpus_q.join(bk, "cell")
            .filter(cos >= _SEMDEDUP_TAU)
            .select("vec_id")
            .distinct()
            .count()
        )
        # chained rejections can only ADD to corpus-only rejections
        assert rows[k]["n_dup_prior"] >= n_dup_corpus_only, k
        extra += rows[k]["n_dup_prior"] - n_dup_corpus_only
    assert extra > 0, "no cross-batch rejection on this fixture"


def test_tree_shards_are_conservative_per_cell(spark):
    """The hierarchical (cell, subcell) partition refines the SAME
    level-1 cells as llm_semdedup, so per level-1 cell: n_vecs
    identical and n_pruned_tree <= n_pruned_default. (No subset
    relation vs the cross-product — the two second-level DESIGNS are
    compared by the eval row's recall columns instead.)"""
    rows = lambda name: {  # noqa: E731
        r["cell"]: r for r in REGISTRY[name].fn(spark, SF_DIR).collect()
    }
    base = rows("llm_semdedup")
    tree = rows("llm_semdedup_tree")
    assert set(base) == set(tree)
    pruned_any = False
    for cell, b in base.items():
        assert tree[cell]["n_vecs"] == b["n_vecs"], cell
        assert tree[cell]["n_pruned"] <= b["n_pruned"], cell
        pruned_any = pruned_any or tree[cell]["n_pruned"] > 0
    assert pruned_any


def test_shard_eval_subset_sets_agree_fully(spark):
    """Every sharded variant prunes a SUBSET of single-level pruning
    (all refine the same level-1 cells), so each agree count must
    EQUAL its pruned count — a drifted clustering would show up here
    as agree < pruned before it could skew a recall number."""
    row = REGISTRY["llm_semdedup_shard_eval"].fn(spark, SF_DIR).collect()[0]
    assert row["n_agree"] == row["n_pruned_sharded"]
    assert row["n_agree_mp"] == row["n_pruned_sharded_mp"]
    assert row["n_agree_tree"] == row["n_pruned_tree"]
    assert row["n_agree_tree_mp"] == row["n_pruned_tree_mp"]
    assert 0 < row["recall_tree_ppm"] <= 1_000_000
    assert 0 < row["recall_tree_mp_ppm"] <= 1_000_000


def test_tree_multiprobe_recall_sits_between_probe1_and_default(spark):
    """Per level-1 cell: n_vecs identical across the tree variants
    and llm_semdedup, and pruned counts monotone — tree(probe=1) <=
    tree_mp(probe=2) <= single-level. Probe 1 IS the subcell
    assignment (subset by construction); tree_mp pairs still share
    the level-1 cell (subset of single-level)."""
    rows = lambda name: {  # noqa: E731
        r["cell"]: r for r in REGISTRY[name].fn(spark, SF_DIR).collect()
    }
    base = rows("llm_semdedup")
    tree = rows("llm_semdedup_tree")
    tmp = rows("llm_semdedup_tree_mp")
    assert set(base) == set(tree) == set(tmp)
    lifted = False
    for cell, b in base.items():
        assert tmp[cell]["n_vecs"] == b["n_vecs"] == tree[cell]["n_vecs"]
        assert tree[cell]["n_pruned"] <= tmp[cell]["n_pruned"], cell
        assert tmp[cell]["n_pruned"] <= b["n_pruned"], cell
        lifted = lifted or tmp[cell]["n_pruned"] > tree[cell]["n_pruned"]
    # the probes must actually BUY something on the fixture, or the
    # recall claim is vacuous
    assert lifted


def test_design_matrix_probing_is_the_lever(spark):
    """The round-12 measured finding, pinned as an executable fact:
    on this fixture BOTH probe=2 designs out-recall BOTH probe=1
    designs — boundary placement (tree vs cross-product) moves
    recall far less than probing does."""
    row = REGISTRY["llm_semdedup_shard_eval"].fn(spark, SF_DIR).collect()[0]
    probe1 = max(row["recall_ppm"], row["recall_tree_ppm"])
    probe2 = min(row["recall_mp_ppm"], row["recall_tree_mp_ppm"])
    assert probe2 > probe1


def test_mmr_diversifies_beyond_pure_relevance(spark):
    """MMR's selected set must (a) open with the argmax-relevance
    candidate, (b) differ from the pure top-k relevance prefix on
    this fixture (else the diversity term is vacuous), and (c) stay
    inside the candidate pool."""
    from datafusion_rdbms_ext_spark.queries.llm import _MMR_K

    rows = REGISTRY["llm_select_mmr"].fn(spark, SF_DIR).collect()
    assert [r["rk"] for r in rows] == list(range(1, _MMR_K + 1))
    by_rel = sorted(rows, key=lambda r: (-r["rel_ppm"], r["vec_id"]))
    # (a) the seed pick is the most relevant candidate overall
    assert rows[0]["vec_id"] == by_rel[0]["vec_id"]
    # (b) selection order deviates from relevance order: some later
    # pick out-relevants an earlier one (the diversity term acted)
    rel_seq = [r["rel_ppm"] for r in rows]
    assert rel_seq != sorted(rel_seq, reverse=True)
