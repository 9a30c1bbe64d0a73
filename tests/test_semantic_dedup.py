"""SemDeDup semantic dedup (operators/semantic_dedup.py): the cluster
approximation may only DROP pairs relative to the exact tier, never
invent or mis-score them; multi-assignment buys back recall. Value
parity vs the generated unrolled-training DuckDB twin runs in
tests/test_oracle_parity.py."""

from __future__ import annotations

from conftest import SF_DIR
from toymapreduce_go_spark.operators.dedup import embedding_near_dup
from toymapreduce_go_spark.operators.semantic_dedup import (
    _cell_block_replicas, semantic_dedup_pairs)


def test_subset_of_bruteforce_with_exact_cosines(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = {(r["id_a"], r["id_b"]): r["cos_sim"]
             for r in embedding_near_dup(emb).collect()}
    sem = {(r["id_a"], r["id_b"]): r["cos_sim"]
           for r in semantic_dedup_pairs(emb).collect()}
    # no false positives, and every found pair carries the EXACT cosine
    assert set(sem) <= set(brute)
    for p, c in sem.items():
        assert c == brute[p]
    # the multi-assign operating point recovers most of the exact tier
    # even on the fixture's weak geometry (real semantic dups cluster
    # far tighter); measured 0.97 at sf0.01, 1.0 at sf0.001
    assert len(sem) / len(brute) >= 0.9


def test_single_assignment_trades_recall_for_cost(spark):
    """n_assign=1 is the pure-SemDeDup operating point: strictly fewer
    (or equal) pairs than n_assign=3, still zero false positives."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    multi = {(r["id_a"], r["id_b"])
             for r in semantic_dedup_pairs(emb).collect()}
    single = {(r["id_a"], r["id_b"])
              for r in semantic_dedup_pairs(emb, n_assign=1).collect()}
    assert single <= multi
    assert len(single) < len(multi)


def test_assignment_is_scan_side_projection(spark):
    """The cell assignment must be a literal-model projection: no join
    or window anywhere before the per-cell shuffle — one Exchange on
    `cell` (plus the pair-dedup/order exchanges after the Python
    stage), never a corpus SortMergeJoin."""
    import contextlib
    import io

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        semantic_dedup_pairs(emb).explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Window" not in plan


def test_hot_cell_pairs_exact_and_blocking_invariant(spark):
    """Planted hot cell: N identical vectors — every vector lands in
    the same n_assign cells, the worst case the intra-cell block grid
    exists for. The blocking must not change the pair set: all C(N,2)
    pairs, each exactly once, exact cosine 1.0, and identical output
    at n_blocks=1 (one tile per cell, the pre-fix shape)."""
    n = 48
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)],
        "vec_id long, embedding array<float>")
    out = semantic_dedup_pairs(emb, threshold=0.9, n_blocks=4).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {
        (i, j) for i in range(n) for j in range(i + 1, n)}
    assert len(out) == n * (n - 1) // 2  # each pair exactly once
    assert all(r["cos_sim"] == 1.0 for r in out)
    single_tile = semantic_dedup_pairs(
        emb, threshold=0.9, n_blocks=1).collect()
    assert sorted((r["id_a"], r["id_b"], r["cos_sim"])
                  for r in single_tile) == sorted(
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in out)


def test_hot_cell_per_task_rows_are_capped(spark):
    """The per-task input bound, asserted directly on the replication
    frame the operator groups: a (cell, bi, bj) task receives at most
    TWO blocks of one cell — never the whole cell — even when one cell
    holds the entire corpus."""
    n, n_blocks = 64, 4
    assigned = spark.createDataFrame(
        [(i, [1.0, 0.0], 0) for i in range(n)],
        "vec_id long, embedding array<float>, cell int")
    sizes = (_cell_block_replicas(assigned, n_blocks)
             .groupBy("cell", "bi", "bj").count().collect())
    per_block = -(-n // n_blocks)  # ceil: ids 0..n-1 spread mod n_blocks
    assert len(sizes) == n_blocks * (n_blocks + 1) // 2
    assert max(r["count"] for r in sizes) <= 2 * per_block
    assert max(r["count"] for r in sizes) < n  # never the whole cell


def test_bruteforce_negative_vec_ids_are_not_dropped(spark):
    """review r14: embedding_near_dup keys its block grid on
    pmod(vec_id), like _cell_block_replicas — a signed % routed
    negative synthetic chunk ids to a negative blk whose inline()
    grid replicas covered only one join side, so their pairs were
    silently dropped. The pair set must be invariant under an
    order-preserving shift of every id into the negatives."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pos = sorted(tuple(r) for r in embedding_near_dup(emb).collect())
    assert pos
    shift = 10_000_000
    neg = emb.selectExpr(f"vec_id - {shift}L as vec_id", "embedding")
    got = sorted(tuple(r) for r in embedding_near_dup(neg).collect())
    assert got == [(a - shift, b - shift, c) for a, b, c in pos]


def test_negative_vec_ids_are_not_dropped(spark):
    """review r10: the block grid keys on pmod(vec_id), so the
    pipeline's NEGATIVE synthetic chunk ids land in the grid and their
    near-dup pairs survive (a signed % routed them to a blk no grid
    row matched — silently empty)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pos = sorted(tuple(r) for r in semantic_dedup_pairs(emb).collect())
    assert pos
    # order-preserving shift into the negatives: same training sample,
    # same centroids, same cells — the pair set must be the identical
    # set under the id shift (a signed % made it empty)
    shift = 10_000_000
    neg = emb.selectExpr(f"vec_id - {shift}L as vec_id", "embedding")
    got = sorted(tuple(r) for r in semantic_dedup_pairs(neg).collect())
    assert got == [(a - shift, b - shift, c) for a, b, c in pos]
