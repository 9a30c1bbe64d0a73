"""Skew utilities + sink round-trips."""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import functions as F

from toymapreduce_go_spark.operators.skew import (replicated_skew_join,
                                                  salted_count, salted_sum)
from toymapreduce_go_spark.sources.registry import load_table
from toymapreduce_go_spark.sources.sinks import (write_csv, write_json,
                                                 write_parquet, write_text_kv)


def test_salted_count_matches_plain(spark):
    """Salted two-stage count == plain groupBy count, including on a
    deliberately skewed input (90% one key)."""
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))).alias("k"))
    got = {(r.k, r.cnt) for r in salted_count(df, "k").collect()}
    want = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
    assert got == want


def test_salted_sum_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    got = {(r.l_returnflag, round(r.sum_value, 2))
           for r in salted_sum(li, "l_returnflag", "l_quantity").collect()}
    want = {(r.l_returnflag, round(r.s, 2))
            for r in li.groupBy("l_returnflag")
                       .agg(F.sum("l_quantity").alias("s")).collect()}
    assert got == want


def test_replicated_skew_join_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name") \
        .withColumnRenamed("c_custkey", "o_custkey")
    got = replicated_skew_join(orders, customer, "o_custkey", n_salts=4)
    want = orders.join(customer, "o_custkey")
    assert got.count() == want.count()
    assert got.select(F.sum("o_orderkey")).collect()[0][0] == \
           want.select(F.sum("o_orderkey")).collect()[0][0]


def test_parquet_partitioned_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = f"file://{tmp_path}/docs"
    write_parquet(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition pruning: a lang filter must prune to one directory
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("lang") == "en").explain(True)
    assert "PartitionFilters" in buf.getvalue()


def test_csv_json_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_DIR, "region")
    write_csv(df, f"file://{tmp_path}/r_csv")
    write_json(df, f"file://{tmp_path}/r_json")
    assert spark.read.option("header", "true").csv(
        f"file://{tmp_path}/r_csv").count() == df.count()
    assert spark.read.json(f"file://{tmp_path}/r_json").count() == df.count()


def test_text_kv_sink_single_file(spark, tmp_path):
    """Reference oracle layout: one sorted 'key value' text file
    (mrsequential.go:62-84)."""
    df = spark.createDataFrame(
        [("b", "2"), ("a", "1"), ("c", "3")], "key string, value string")
    out_dir = tmp_path / "kv"
    write_text_kv(df, f"file://{out_dir}", single_file=True)
    parts = sorted(out_dir.glob("part-*"))
    assert len(parts) == 1
    assert parts[0].read_text().splitlines() == ["a 1", "b 2", "c 3"]


def test_approx_stats_error_bounds(spark):
    """approx_stats is the one declared query without a DuckDB oracle
    (sketch internals are engine-specific); pin its semantics instead:
    HLL count-distinct within its documented ~2-5% relative error of the
    exact distinct count, approximate median within the value span of
    the exact median's neighborhood. Deterministic for a fixed fixture."""
    from toymapreduce_go_spark.plans.queries import QUERIES
    from toymapreduce_go_spark.sources.registry import load_table
    from conftest import SF_DIR
    from pyspark.sql import functions as F

    got = {r.event_type: r for r in
           QUERIES["approx_stats"](spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    exact = {r.event_type: r for r in
             ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("users"),
                 F.expr("percentile(value, 0.5)").alias("median"),
                 F.count("*").alias("n")).collect()}
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        assert g.n_events == e.n  # count is exact
        assert abs(g.approx_users - e.users) <= max(0.05 * e.users, 2), (
            et, g.approx_users, e.users)
        # percentile_approx returns a real value element; 10% span slack
        assert abs(g.approx_median_value - e.median) <= 0.1 * abs(e.median) + 1, (
            et, g.approx_median_value, e.median)


def test_aqe_splits_planted_skew_join(spark):
    """r4/r5 advice: prove the AQE layer of the skew defense actually
    fires. Plant ~100:1 key skew on the build side of a non-broadcast
    sort-merge join; after execution the adaptive plan must carry the
    skew=true SMJ marker (OptimizeSkewedJoin split the hot partition).
    Salting (tested above) is the contrast path for skew AQE can't see
    (aggregations); this is the path it can."""
    confs = {
        # force SMJ: a broadcast join has no skewed shuffle to split
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # shrink thresholds so a ~MB-scale fixture counts as skewed
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 200_000
        # 50% of the left table lands on key 0; the rest spreads over 1k keys
        left = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string"),
                     F.lit("x" * 64)).alias("pad"))
        right = spark.range(1000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim-"), F.col("id").cast("string")).alias("name"))
        # Aggregate over pad so column pruning can't drop it before the
        # join shuffle (the skewed partition must actually be heavy), and
        # group on the DIM's key, not the join key: a downstream groupBy
        # on the join key would reuse the join's hash partitioning, and
        # OptimizeSkewedJoin declines any split that forces an extra
        # shuffle (forceOptimizeSkewedJoin stays at its default false —
        # that refusal is itself correct scale behavior).
        joined = (left.join(right, "k").groupBy("name")
                  .agg(F.count("*").alias("cnt"),
                       F.sum(F.length("pad")).alias("pad_bytes")))
        got = {(r.name, r.cnt) for r in joined.collect()}
        # correctness: hot key kept every row
        assert ("dim-0", n // 2) in got
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "OptimizeSkewedJoin did not fire; adaptive plan:\n" + plan[:2000])
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_orc_partitioned_roundtrip(spark, tmp_path):
    from toymapreduce_go_spark.sources.sinks import write_orc
    docs = load_table(spark, SF_DIR, "documents")
    out = f"file://{tmp_path}/docs_orc"
    write_orc(docs, out, partition_by=["lang"])
    back = spark.read.orc(out)
    assert back.count() == docs.count()
    # same pushdown contract as parquet: partition pruning on lang
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("lang") == "en").explain(True)
    assert "PartitionFilters" in buf.getvalue()
    # value fidelity, not just counts
    a = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert a == b


def test_compact_parquet_reduces_files_keeps_data(spark, tmp_path):
    from toymapreduce_go_spark.sources.sinks import compact_parquet

    docs = load_table(spark, SF_DIR, "documents")
    frag = f"file://{tmp_path}/frag"
    docs.repartition(32).write.parquet(frag)  # micro-batch-style litter
    before_ids = sorted(r["doc_id"] for r in
                        spark.read.parquet(frag).select("doc_id").collect())
    n_before, n_after = compact_parquet(spark, frag, target_mb=1)
    assert n_before == 32
    assert n_after < n_before
    import glob
    n_disk = len(glob.glob(f"{tmp_path}/frag/*.parquet"))
    assert n_disk == n_after
    after_ids = sorted(r["doc_id"] for r in
                       spark.read.parquet(frag).select("doc_id").collect())
    assert after_ids == before_ids


def test_compact_parquet_rerunnable_after_stale_residue(spark, tmp_path):
    """r7 advice: leftover __compact_tmp / __compact_old dirs from a
    crashed attempt must not block the next run, and a crash INSIDE the
    rename window (live dir gone, data at __compact_old) must be
    recovered, not error."""
    import os
    import shutil

    from toymapreduce_go_spark.sources.sinks import compact_parquet

    docs = load_table(spark, SF_DIR, "documents")
    frag = f"file://{tmp_path}/frag2"
    local = f"{tmp_path}/frag2"
    docs.repartition(8).write.parquet(frag)
    want = sorted(r["doc_id"] for r in
                  spark.read.parquet(frag).select("doc_id").collect())
    # stale residue from a "crashed" previous attempt
    os.makedirs(f"{local}__compact_tmp/junkdir")
    os.makedirs(f"{local}__compact_old")
    compact_parquet(spark, frag, target_mb=1)
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(frag).select("doc_id").collect())
    assert got == want
    # simulate a crash between the two renames: live -> old, tmp absent
    shutil.rmtree(f"{local}__compact_old", ignore_errors=True)
    os.rename(local, f"{local}__compact_old")
    compact_parquet(spark, frag, target_mb=1)
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(frag).select("doc_id").collect())
    assert got == want
    assert not os.path.exists(f"{local}__compact_old")
    assert not os.path.exists(f"{local}__compact_tmp")


def test_compact_parquet_preserves_hive_partitioning(spark, tmp_path):
    """r7 advice: compacting a hive-partitioned dataset silently rewrote
    it unpartitioned, destroying partition pruning. The partition
    column must survive compaction (and pruning must still plan)."""
    import glob

    from toymapreduce_go_spark.sources.sinks import compact_parquet

    docs = load_table(spark, SF_DIR, "documents")
    part = f"file://{tmp_path}/part"
    (docs.repartition(16).write.partitionBy("source").parquet(part))
    want = sorted((r["doc_id"], r["source"]) for r in
                  spark.read.parquet(part)
                  .select("doc_id", "source").collect())
    n_before, n_after = compact_parquet(spark, part, target_mb=64)
    back = spark.read.parquet(part)
    assert sorted((r["doc_id"], r["source"]) for r in
                  back.select("doc_id", "source").collect()) == want
    # layout preserved: source=... dirs still exist, fewer files
    part_dirs = glob.glob(f"{tmp_path}/part/source=*")
    assert part_dirs, "hive partition dirs were destroyed by compaction"
    n_disk = len(glob.glob(f"{tmp_path}/part/source=*/*.parquet"))
    assert n_disk < n_before
    # partition pruning still works on the compacted layout
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.filter("source = 'wiki'").explain(True)
    assert "PartitionFilters" in buf.getvalue()


def test_dup_spans_survives_corpus_wide_boilerplate(spark):
    """Skew posture: ONE boilerplate line shared by every document makes
    the hottest possible gram keys. dup_spans must stay a count
    aggregation (map-side combinable — never a pair join that would go
    quadratic on the hot key) and return exact counts."""
    import time

    from toymapreduce_go_spark.operators.dedup import dup_span_stats

    boiler = "all rights reserved contact the webmaster for details"
    docs = spark.createDataFrame(
        [(i, "w", f"document number {i} unique words here. {boiler}")
         for i in range(500)],
        "doc_id long, source string, text string")
    t0 = time.time()
    rows = dup_span_stats(docs, k=20).collect()
    wall = time.time() - t0
    r = rows[0]
    assert r["n_docs"] == 500
    assert r["docs_with_dup"] == 500
    # every doc carries ~len(boiler)-19 duplicated grams from the line
    assert r["dup_grams"] >= 500 * (len(boiler) - 19 - 2)
    # a quadratic pair path would blow far past this at 500 docs
    assert wall < 30, wall


def test_top_k_tournament_matches_window_on_skewed_groups(spark):
    """top_k_per_group is exact by composition — on a deliberately
    skewed frame (one group holds 5000 of 5150 rows, with duplicate
    scores and duplicate full keys) it must equal the naive window
    formulation row for row, at several salt counts (partitioning
    invariance of the tournament)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from toymapreduce_go_spark.operators.relational import top_k_per_group

    rows = [("hot", i, (i * 37) % 101) for i in range(5000)]
    rows += [("cold%d" % g, 10_000 + g * 100 + i, (i * 13) % 17)
             for g in range(15) for i in range(10)]
    rows += [("hot", 90_001, 100), ("hot", 90_002, 100)]  # dup scores
    rows += [("hot", 90_003, 100), ("hot", 90_003, 100)]  # dup FULL keys
    df = spark.createDataFrame(rows, "grp string, rid long, score long")
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(),
                                          F.col("rid").asc())
    want = sorted(
        (r.grp, r.rank, r.rid, r.score) for r in
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7).collect())
    key = F.struct(F.col("score"), (-F.col("rid")).alias("neg_id"))
    for n_salts in (1, 8, 64):
        got = sorted(
            (r.grp, r.rank, -r.key.neg_id, r.key.score) for r in
            top_k_per_group(df, "grp", key, k=7, n_salts=n_salts)
            .collect())
        assert got == want, n_salts


def test_top_docs_plan_has_no_window(spark):
    """Plan contract: the declared face runs the two-stage tournament —
    NO Window operator anywhere (the per-group window is exactly the
    single-reducer plan this operator replaces), two aggregate stages,
    no Python."""
    from test_explain_plans import plan_of

    from conftest import SF_DIR
    from toymapreduce_go_spark.operators.relational import \
        top_docs_per_source
    from toymapreduce_go_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(top_docs_per_source(docs))
    assert "Window" not in plan, plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_merge_snapshot_semantics(spark):
    """Latest-wins CDC merge on constructed frames: newer ts wins, the
    UPDATE wins an exact ts tie, duplicate keys on either side
    collapse to one winner, and keys present on only one side survive
    untouched. No Window in the plan — the winner is a combinable
    struct-max aggregate."""
    import pyspark.sql.functions as F
    from datetime import datetime

    from test_explain_plans import plan_of

    from toymapreduce_go_spark.operators.relational import merge_snapshot

    d = datetime
    base = spark.createDataFrame(
        [(1, "base", d(2024, 1, 1)), (2, "base", d(2024, 1, 5)),
         (3, "base", d(2024, 1, 1)), (4, "base-dup-a", d(2024, 1, 1)),
         (4, "base-dup-b", d(2024, 1, 2))],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp")
    upd = spark.createDataFrame(
        [(1, "upd", d(2024, 1, 3)),      # newer -> wins
         (2, "upd", d(2024, 1, 4)),      # older -> base keeps
         (3, "upd", d(2024, 1, 1)),      # tie -> update wins
         (9, "upd", d(2024, 1, 9))],     # insert
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp")
    got = {r.o_orderkey: (r.o_orderstatus, r.o_orderdate)
           for r in merge_snapshot(base, upd).collect()}
    assert got[1] == ("upd", d(2024, 1, 3))
    assert got[2] == ("base", d(2024, 1, 5))
    assert got[3] == ("upd", d(2024, 1, 1))
    assert got[4] == ("base-dup-b", d(2024, 1, 2))
    assert got[9] == ("upd", d(2024, 1, 9))
    assert len(got) == 5
    plan = plan_of(merge_snapshot(base, upd))
    assert "Window" not in plan, plan


def test_dir_fingerprint_boundary_rests_on_writer_naming(spark, tmp_path):
    """r12 verdict advisory 3, pinned both ways: (a) two Spark-written
    generations of the SAME rows never fingerprint-collide (part-file
    names embed a per-write UUID — the naming convention the manifest
    staleness guard rests on); (b) the disclosed boundary is real — a
    hand-rolled writer reusing exact names AND sizes fools the
    (name, size) fingerprint, and differing sizes do not."""
    from toymapreduce_go_spark.sources.sinks import _dir_fingerprint

    df = spark.range(100).selectExpr("id", "id * 2 AS x")
    a, b = str(tmp_path / "gen_a"), str(tmp_path / "gen_b")
    df.coalesce(2).write.parquet(a)
    df.coalesce(2).write.parquet(b)
    fa, fb = _dir_fingerprint(a), _dir_fingerprint(b)
    assert fa != fb                      # UUID names: no collision
    parts_a = {n for n, _ in fa if n.startswith("part-")}
    parts_b = {n for n, _ in fb if n.startswith("part-")}
    assert parts_a and parts_b and parts_a.isdisjoint(parts_b)

    # the boundary: fixed names + equal sizes collide (disclosed)
    c, d = tmp_path / "hand_a", tmp_path / "hand_b"
    for p, payload in ((c, b"aaaa"), (d, b"bbbb")):
        p.mkdir()
        (p / "data.bin").write_bytes(payload)
    assert _dir_fingerprint(str(c)) == _dir_fingerprint(str(d))
    (d / "data.bin").write_bytes(b"bbbbb")     # size differs -> caught
    assert _dir_fingerprint(str(c)) != _dir_fingerprint(str(d))
