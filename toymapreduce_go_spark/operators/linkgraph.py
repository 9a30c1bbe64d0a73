"""Link-graph analytics — damped PageRank (Page et al. 1999), the
canonical MapReduce workload, in the fixed-point INTEGER arithmetic
this repo uses wherever cross-engine bit-equality matters: ranks are
held in micro-units (``scale`` = 1e6), every update is
``base + 85·inflow div 100`` with truncating integer division, and
every inflow is a SUM of integers — order-independent, so the
distributed aggregation is bit-deterministic and DuckDB replays all
iterations exactly (unrolled CTEs, the Lloyd's-twin convention).
Float PageRank would hash-mismatch on summation order alone.

Reference scope: the reference is a MapReduce engine and PageRank is
the poster MapReduce application (one join + one reduce per
iteration); it ships no such app (SURVEY.md §2c), so this is coverage
of the workload class its own architecture was built for.

Because the fixture carries no link column, the graph is synthesized
deterministically (the ``multimodal/binary.py`` convention): every
document links to ``fanout`` targets ``pmod(doc_id·7 + j, n)`` —
constant out-degree, so a node's contribution is exactly
``rank div fanout``. PRECONDITION (asserted): doc_ids are the
contiguous ``0..n-1`` fixture universe, so every synthesized target
exists and no dangling-mass correction is needed.

100 TB shape: each iteration is ONE corpus-sized equi-join
(edges ⋈ ranks on the source node — at scale both sides bucket by
node id and co-locate) plus ONE count-combinable groupBy(target);
iterations are a fixed small constant (power iteration converges
geometrically; pipelines run 10-20). Rank frames are
``localCheckpoint``-ed per iteration — the repo's iterative-loop
lineage discipline (connected components, Lloyd's). The registered
rollup is bounded by sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD

PR_SCALE = 1_000_000   # micro-rank units
PR_FANOUT = 3          # synthesized out-degree (constant)
PR_ITERS = 3           # unrolled in the DuckDB twin


def synthesize_links(documents: DataFrame, n_docs: int,
                     fanout: int = PR_FANOUT) -> DataFrame:
    """(u, v) edge list: doc u links to ``pmod(u·7 + j, n)`` for
    j = 1..fanout. Scan-side explode — no shuffle."""
    return documents.select(
        F.col("doc_id").alias("u"),
        F.explode(F.array(*[F.lit(j) for j in
                            range(1, fanout + 1)])).alias("j")
    ).select("u", F.pmod(F.col("u") * 7 + F.col("j"),
                         F.lit(n_docs)).alias("v"))


def pagerank_ranks(documents: DataFrame, iters: int = PR_ITERS,
                   fanout: int = PR_FANOUT,
                   scale: int = PR_SCALE) -> DataFrame:
    """(v, r): integer micro-unit ranks after ``iters`` damped power
    iterations. See ``pagerank_state`` for the full contract."""
    return pagerank_state(documents, iters, fanout, scale)[2]


def pagerank_state(documents: DataFrame, iters: int = PR_ITERS,
                   fanout: int = PR_FANOUT,
                   scale: int = PR_SCALE,
                   ranks: DataFrame | None = None
                   ) -> tuple[int, DataFrame, DataFrame]:
    """(n, edges, ranks): the full PageRank state — node count, the
    checkpointed synthesized edge list, and the final integer ranks.
    Consumers that need the graph alongside the ranks (the crawl
    frontier) take this form so the corpus is counted once and the
    edge synthesis is built once (r11 review: the frontier used to
    re-count and re-synthesize).

    ``ranks`` short-circuits the iteration loop with a PRE-COMPUTED
    (v, r) frame — the r14 warm-cycle composition: a fetch cycle
    feeds the persisted rank store's warm-started converged ranks
    (``crawl_cycle_ranks``) through the frontier instead of paying
    the cold fixed-iteration build; the contiguity guard and edge
    synthesis still run (the frontier needs the graph either way).
    r0 = scale div n for every node;
    r_{t+1}(w) = (15·scale div 100) div n
                 + 85·Σ_{u→w}(r_t(u) div fanout) div 100."""
    # ONE corpus scan collects the row count and the contiguity probe
    # together (r14: count() + a second agg paid two driver-blocking
    # jobs per consumer — the fetch list builds this state once per
    # cycle, so every extra action is a serialized corpus pass)
    ids = documents.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
        F.count_distinct("doc_id").alias("nd")).collect()[0]
    n = int(ids["n"])
    spark = documents.sparkSession
    if n == 0:
        empty = spark.createDataFrame([], "v long, r long")
        return 0, spark.createDataFrame([], "u long, v long"), empty
    if int(ids["lo"]) != 0 or int(ids["hi"]) != n - 1 \
            or int(ids["nd"]) != n:
        raise ValueError(
            "pagerank_ranks: the synthesized graph requires the "
            "contiguous 0..n-1 doc_id universe (targets are "
            "pmod(u*7+j, n)); got "
            f"[{ids['lo']}, {ids['hi']}] with {ids['nd']} distinct "
            f"ids over n={n}")
    # eager=False (r14, guide §2.4/§2.6): the lineage cut is what bounds
    # plan depth, and a LAZY checkpoint cuts lineage exactly like an
    # eager one — but defers execution into the consumer's ONE action,
    # so the iteration stages pipeline inside a single job instead of
    # paying a driver-blocking job per checkpoint (measured ~5 s of
    # serialized scheduling in crawl_frontier/fetch_list construction
    # at sf0.1; on a cluster the same barriers serialize real stages).
    # The fixed-iteration loop has no driver-side reads, so nothing
    # forces materialization before the consuming action.
    edges = synthesize_links(documents, n, fanout).localCheckpoint(
        eager=False)
    if ranks is not None:
        return n, edges, ranks.select("v", "r")
    nodes = documents.select(F.col("doc_id").alias("v"))
    ranks = nodes.select("v", F.lit(scale // n).cast("long").alias("r"))
    base = (15 * scale // 100) // n
    for it in range(iters):
        inflow = (edges
                  .join(ranks.select(F.col("v").alias("u"), "r"), "u")
                  .groupBy("v")
                  .agg(F.sum(F.expr(f"r div {fanout}")).alias("inf")))
        ranks = (nodes.join(inflow, "v", "left")
                 .select("v", (F.lit(base) + F.expr(
                     "(85 * coalesce(inf, 0L)) div 100"))
                     .cast("long").alias("r")))
        # iterative-loop lineage discipline, amortized (r14): even a
        # LAZY localCheckpoint pays a driver-blocking plan-compile
        # (~0.5 s each here), so cut every 4th round instead of every
        # round — a 4-deep join+agg nest analyzes once for the same
        # cost as one round, so the default fixed 3-iteration build
        # compiles NO intra-loop plan. Each intermediate is consumed
        # exactly once (the next round), so no compute-once guarantee
        # is lost; ``edges`` (consumed by every round AND the
        # frontier) keeps its own cut above.
        if (it + 1) % 4 == 0 and it != iters - 1:
            ranks = ranks.localCheckpoint(eager=False)
    # the FINAL ranks are the multi-consumer artifact (rank join,
    # rollups) — one cut here keeps the loop's join nest out of every
    # consumer's plan, exactly like the per-iteration form did, for
    # one compile instead of ``iters`` (A/B at sf0.1: total unchanged
    # vs no cut, construct −1.4 s vs the per-iteration form)
    return n, edges, ranks.localCheckpoint(eager=False)


# ---------------------------------------------------------------------------
# Warm-start / incremental PageRank across refresh cycles (r12 verdict
# item 6). The crawl loop's index and corpus refreshes are
# delta-driven; rank recomputation was the remaining from-scratch
# stage. ``pagerank_converge`` iterates a GENERAL graph (explicit
# edge frame, arbitrary out-degrees — contribution is
# ``r div outdeg(u)``) from any initial ranks frame until successive
# iterates differ by at most ``tol_micro`` anywhere, so a refresh
# cycle re-iterates from the PREVIOUS cycle's ranks instead of
# uniform. DISCLOSED divergence bound (the refresh_training_corpus
# convention): integer truncation gives the damped map a noise floor,
# so two runs stopping at successive-delta ≤ tol land within
# ~2·tol/(1−0.85) µ-units of each other, NOT bit-equal — the test
# pins |warm − cold| ≤ PR_WARM_BOUND_MICRO and that warm-start takes
# strictly fewer iterations on a recrawl-shaped delta. Bit-exactness
# is pinned where it is true: the whole trajectory (every iterate AND
# the stopping iteration) replays bit-for-bit in a pure-Python
# reference (integer sums are order-independent).
#
# 100 TB shape: per iteration ONE corpus-sized equi-join (edges ⋈
# ranks, bucket-colocatable on u) + ONE count-combinable groupBy +
# one max-agg for the stopping test; ranks localCheckpoint-ed per
# iteration (the repo's iterative-loop lineage discipline). Warm-start
# converts the refresh cycle's rank stage from ~20 iterations to the
# few the delta actually needs.

PR_TOL_MICRO = 2          # successive-delta stopping tolerance
PR_WARM_BOUND_MICRO = 20  # disclosed warm-vs-cold landing bound
PR_HUB = 64               # skewed-fixture hub modulus


def synthesize_links_skewed(documents: DataFrame, n_docs: int,
                            relink: bool = False) -> DataFrame:
    """(u, v): the SKEWED fixture graph for warm-start tests — two
    shift edges ``(u·7+j) mod n`` plus one hub edge ``u mod PR_HUB``
    (hub in-degree ~n/64, so the fixed point is far from uniform; the
    regular ``synthesize_links`` graph has in-degree == out-degree
    everywhere and uniform IS its fixed point, which makes warm-start
    vacuous there). ``relink=True`` is the recrawl delta: pages
    ``u % 40 == 0`` re-point their shift edges to ``(u·11+j) mod n``
    — a local change, the production refresh shape."""
    mult = (F.when(F.pmod(F.col("u"), F.lit(40)) == 0, F.lit(11))
            .otherwise(F.lit(7)) if relink else F.lit(7))
    base = documents.select(F.col("doc_id").alias("u"))
    shifts = base.select(
        "u", F.explode(F.array(F.lit(1), F.lit(2))).alias("j")
    ).select("u", F.pmod(F.col("u") * mult + F.col("j"),
                         F.lit(n_docs)).alias("v"))
    hub = base.select("u", F.pmod(F.col("u"), F.lit(PR_HUB)).alias("v"))
    return shifts.unionByName(hub)


def pagerank_converge(nodes: DataFrame, edges: DataFrame,
                      prior_ranks: DataFrame | None = None,
                      tol_micro: int = PR_TOL_MICRO,
                      max_iters: int = 64,
                      scale: int = PR_SCALE
                      ) -> tuple[DataFrame, int]:
    """(ranks, n_iters): damped integer PageRank over an EXPLICIT
    graph — ``nodes`` (v), ``edges`` (u, v), arbitrary out-degrees —
    iterated from ``prior_ranks`` (v, r; nodes it misses start at the
    uniform base, nodes it has that left the graph are dropped — the
    added/removed handling a crawl_diff delta needs) or uniform when
    None, until no node's rank moves by more than ``tol_micro``
    between iterations. Raises loudly when ``max_iters`` is exhausted
    (a truncation cycle wider than the tolerance), never returns an
    unconverged frame silently."""
    if max_iters < 1:
        raise ValueError(
            f"pagerank_converge: max_iters must be >= 1, got "
            f"{max_iters} (review r13: the exhaustion path would "
            "otherwise reference an unbound delta)")
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_converge: empty node set")
    base = (15 * scale // 100) // n
    uni = scale // n
    outdeg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("od"))
    ed = edges.join(outdeg, "u").localCheckpoint()
    if prior_ranks is None:
        ranks = nodes.select(
            "v", F.lit(uni).cast("long").alias("r")).localCheckpoint()
    else:
        ranks = (nodes.join(prior_ranks.select("v", "r"), "v", "left")
                 .select("v", F.coalesce("r", F.lit(uni))
                         .cast("long").alias("r"))
                 .localCheckpoint())
    for i in range(1, max_iters + 1):
        inflow = (ed.join(ranks.select(F.col("v").alias("u"), "r"), "u")
                  .groupBy("v")
                  .agg(F.sum(F.expr("r div od")).alias("inf")))
        nxt = (nodes.join(inflow, "v", "left")
               .select("v", (F.lit(base) + F.expr(
                   "(85 * coalesce(inf, 0L)) div 100"))
                   .cast("long").alias("r"))
               .localCheckpoint())
        delta = (ranks.select("v", F.col("r").alias("r0"))
                 .join(nxt, "v")
                 .agg(F.max(F.abs(F.col("r") - F.col("r0")))
                      .alias("d")).collect()[0]["d"])
        ranks = nxt
        if delta is not None and delta <= tol_micro:
            return ranks, i
    raise ValueError(
        f"pagerank_converge: no fixed point within {max_iters} "
        f"iterations (last successive delta {delta} > {tol_micro})")


# ---------------------------------------------------------------------------
# Persisted rank store — threading ``pagerank_converge`` into the
# fetch cycle (r13 verdict item 5): converged ranks persist next to
# the band/vector indexes under the SAME crash-safety protocol
# (``sources.sinks`` staged-tmp → manifest-commit → swap), and each
# cycle warm-starts from the stored frame instead of paying the cold
# ~20 iterations. The fixed-iteration ``pagerank_state`` remains the
# DECLARED queries' form (bit-replayable by the unrolled DuckDB twin);
# the store is the refresh-cycle composition around it.

def write_rank_store(ranks: DataFrame, path: str, n_iters: int,
                     cycle_id: int) -> None:
    """Persist converged ranks (v, r) + a meta row (cycle_id, n_iters)
    at ``path`` through the staged-tmp/manifest/swap protocol — a
    crash mid-write can never leave a half-replaced store (recovery
    rolls the manifest forward on the next call). Ranks write
    UNPARTITIONED (node-keyed, one row per node — the 100 TB layout
    buckets by v so the next cycle's prior-join co-locates)."""
    import os

    from ..sources.sinks import commit_swap, recover_swap, swap_paths
    local, tmp, old = swap_paths(path, "rankstore")
    recover_swap(local, tmp, old, "rankstore")
    spark = ranks.sparkSession
    # explicit file:// like every other swap-protocol writer (review
    # r14): the staged tree MUST land on the local filesystem the
    # os.rename-based commit operates on, whatever the session's
    # default filesystem is
    ranks.select("v", "r").write.mode("overwrite") \
        .parquet(f"file://{os.path.join(tmp, 'ranks')}")
    spark.createDataFrame(
        [(int(cycle_id), int(n_iters))],
        "cycle_id long, n_iters long",
    ).coalesce(1).write.mode("overwrite") \
        .parquet(f"file://{os.path.join(tmp, 'meta')}")
    commit_swap(local, tmp, old, "rankstore")


def read_rank_store(spark, path: str):
    """(ranks, meta) from a committed store, or (None, None) when no
    store exists yet (the first cycle's cold start). Heals a crashed
    prior writer first — a reader never sees a torn store."""
    import os

    from ..sources.sinks import recover_swap, swap_paths
    local, tmp, old = swap_paths(path, "rankstore")
    recover_swap(local, tmp, old, "rankstore")
    if not os.path.isdir(os.path.join(local, "ranks")):
        return None, None
    meta = spark.read.parquet(
        f"file://{os.path.join(local, 'meta')}").first()
    return (spark.read.parquet(f"file://{os.path.join(local, 'ranks')}"),
            {"cycle_id": int(meta["cycle_id"]),
             "n_iters": int(meta["n_iters"])})


def crawl_cycle_ranks(spark, path: str, nodes: DataFrame,
                      edges: DataFrame,
                      tol_micro: int = PR_TOL_MICRO,
                      max_iters: int = 64,
                      scale: int = PR_SCALE
                      ) -> tuple[DataFrame, int, bool]:
    """One fetch cycle's rank stage: warm-start ``pagerank_converge``
    from the persisted store when present (added/removed nodes handled
    by the converge contract), persist the converged ranks back, and
    return (ranks, n_iters, warm). On a recrawl-shaped delta the warm
    iteration count is strictly below cold (pinned in
    tests/test_linkgraph.py) — the refresh cycle's rank stage costs
    what the delta needs, not the cold power-iteration budget."""
    prior, meta = read_rank_store(spark, path)
    ranks, n_iters = pagerank_converge(
        nodes, edges, prior_ranks=prior, tol_micro=tol_micro,
        max_iters=max_iters, scale=scale)
    cycle = (meta["cycle_id"] + 1) if meta else 0
    write_rank_store(ranks, path, n_iters, cycle)
    return ranks, n_iters, prior is not None


def link_pagerank(documents: DataFrame, iters: int = PR_ITERS,
                  fanout: int = PR_FANOUT,
                  scale: int = PR_SCALE) -> DataFrame:
    """The registered rollup: per source — node count, total and max
    micro-rank, the top-ranked doc (ties → lowest doc_id, the
    min-struct argmax convention), and a mod-prime (node·rank)
    checksum pinning every node's exact final rank."""
    ranks = pagerank_ranks(documents, iters, fanout, scale)
    term = F.pmod(F.col("v") * F.pmod(F.col("r"), F.lit(CKSUM_MOD)),
                  F.lit(CKSUM_MOD))
    return (documents.select(F.col("doc_id").alias("v"), "source")
            .join(ranks, "v")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.sum("r").alias("total_rank"),
                 F.max("r").alias("max_rank"),
                 F.min(F.struct((-F.col("r")).alias("nr"),
                                F.col("v").alias("v")))["v"]
                 .alias("top_doc_id"),
                 F.sum(term).alias("rank_checksum"))
            .orderBy("source"))
