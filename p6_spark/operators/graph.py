"""Distributed connected components — exact duplicate clustering.

The greedy near-dedup in pipelines/llm_corpus.py drops the larger id of
every LSH candidate pair; that can over-drop when pairs chain (a-b,
b-c: exact clustering keeps one of {a,b,c}, greedy may keep none... it
keeps a only). Connected components computes the true duplicate
clusters from the pair graph, so exactly one representative per cluster
survives.

Algorithm: iterative min-label propagation (the standard Spark shape —
GraphFrames does the same under the hood):

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each iteration is one shuffle on the node id;
convergence takes O(graph diameter) rounds — duplicate clusters are
tiny and dense, so 3-5 rounds in practice. localCheckpoint every round
truncates the lineage so the plan doesn't grow exponentially (the
classic iterative-Spark trap).

Cluster-deployment note (applies to every iterative operator in this
module — CC, k-core, BFS, pagerank, cheapest-path): ``localCheckpoint``
pins the cut lineage to executor-local block storage, which is the
right call in local mode and on short jobs, but the blocks die with the
executor — on a 1000-executor / 100 TB run a single executor loss would
fail the job instead of recomputing. There, set a checkpoint dir
(``spark.sparkContext.setCheckpointDir('hdfs://...')``) and set
``P6_SPARK_RELIABLE_CHECKPOINT=1``: every lineage cut in this module
goes through ``_materialize``, which swaps in reliable
``DataFrame.checkpoint()`` — same semantics, blocks land on HDFS/object
storage and survive executor churn, at the cost of one write+read
round-trip per round. ``localCheckpoint`` stays the default because the
harness runs single-JVM; the reliable mode is smoke-tested
(tests/test_graph.py) so the swap can't bit-rot.

Not SQL-expressible in one query (recursive), so the registry entry is
rows-only; correctness is pinned by tests against a driver-side
union-find on the same edges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Broadcast/exchange crossover for the per-round label joins in the
# iterative loops below, in NODES (two bigints + hash-relation overhead:
# 1M nodes is a few tens of MB — comfortably inside executor broadcast,
# far under the 8 GB / 512M-row relation cap). Same scalar-bound class
# as plans/scalar_bounds.DECON_BROADCAST_MAX_BENCH_DOCS: the harness
# duplicate-cluster graphs are thousands of nodes (broadcast path), a
# 100 TB pair graph is corpus-sized (exchange path).
_CC_BROADCAST_MAX_NODES = 1_000_000


def _materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Lineage cut for the iterative loops in this module:
    ``localCheckpoint`` by default (single-JVM / short jobs); with
    ``P6_SPARK_RELIABLE_CHECKPOINT=1`` and a configured checkpoint dir,
    reliable ``checkpoint()`` instead — see the module docstring's
    cluster-deployment note.

    ``eager=False`` marks the cut but defers materialization to the
    caller's NEXT action over the frame (guide §1.2 — fewer jobs, same
    work): the loops below always follow a lineage cut with a driver
    scalar (convergence count, frontier count), so running that count
    over the lazily-marked frame materializes the blocks and computes
    the scalar in ONE job instead of a checkpoint job plus a count job.
    Semantics are unchanged — the blocks the next round reads are the
    same either way."""
    if os.environ.get("P6_SPARK_RELIABLE_CHECKPOINT") == "1":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; the
    component id is the smallest node id in the component.

    Semantics are the SAME bounded synchronous min-label fixpoint the
    DuckDB twins replay (_sql_bounded_cc: l0..l{max_iter}): after k
    rounds label(v) = min{u : dist(u, v) <= k}. Round-11 optimization
    (guide §2.4 — remove shuffles/jobs, identical results):

    - The init round is FUSED: l1 = min(u, min over neighbors v) is one
      groupBy over the symmetric edge list, replacing the distinct-node
      init plus a full first propagation round (which at l0 reduces to
      exactly that expression because every label still equals its node
      id). The loop then runs at most max_iter - 1 further rounds, so
      the reachable bound stays l{max_iter} exactly.
    - Convergence detection carries the previous label through the
      round's projection and counts label != _old on the materialized
      blocks — a cheap scan instead of the old join of two checkpoints
      (one full shuffle join + exchange per round removed).
    - Size-guarded broadcast rounds (guide §3.1 — pick the strategy
      deliberately): localCheckpoint loses partitioning AND statistics
      (LogicalRDD reports UnknownPartitioning and default sizeInBytes),
      so every per-round join was a full-exchange SMJ regardless of
      label-table size — ~3 exchanges per round of driver-latency-bound
      fixed cost on duplicate-cluster graphs whose label table is tiny.
      One cheap count of the materialized label blocks picks the plan:
      at or below _CC_BROADCAST_MAX_NODES the round joins broadcast the
      label/neighbor-min tables (1 exchange per round, the groupBy);
      above it the exchange plans stay (a 100 TB pair graph has a
      corpus-sized node table — broadcasting it would OOM the driver,
      the dd_decontam_ngram13 crossover lesson). Identical arithmetic
      and round structure on both paths.
    """
    sym = _materialize(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct(),
        eager=False,
    )
    # fused round 1 (see docstring): every node appears as u in sym
    labels = _materialize(
        sym.groupBy("u").agg(
            F.least(F.col("u"), F.min("v")).alias("label")
        ).select(F.col("u").alias("node"), "label"),
        eager=False,
    )
    # driver-side scalar bound (the plans/scalar_bounds.py class): node
    # count decides join strategy — and, with the lazy cuts above, this
    # ONE job also materializes the sym + labels blocks every later
    # round reads (previously two checkpoint jobs plus this count)
    small = labels.count() <= _CC_BROADCAST_MAX_NODES
    for _ in range(max_iter - 1):
        neighbor_min = (
            sym.join(
                F.broadcast(labels) if small else labels,
                sym.v == labels.node,
            )
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = _materialize(  # truncate lineage each round
            labels.join(
                F.broadcast(neighbor_min) if small else neighbor_min,
                labels.node == neighbor_min.u,
                "left",
            )
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            ),
            eager=False,
        )
        # one job: materializes the round's blocks AND counts changes
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact cluster-aware dedup: keep the minimum-id document of every
    connected component of the candidate-pair graph (and every document
    that appears in no pair)."""
    cc = connected_components(pairs)
    losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Fixed-point integer PageRank (damping 0.85) — the second iterative
    algorithm certified by the quantize-first trick (see operators/ivf.py
    for k-means): ranks live as x1e9 bigints, every step is integer
    truncating division and associative integer sums, so an unrolled
    DuckDB replay is bit-identical and the result is hash-exact under any
    partitioning.

    Per round: rank(v) <- (0.15*scale)/N + 0.85 * sum over in-edges of
    rank(u)/outdeg(u), all in trunc-div integer space. Dangling-node mass
    (sinks with no out-edges) is dropped, not redistributed — documented
    simplification, identical on both engines.

    Scale shape: each round is ONE shuffle of edge contributions grouped
    by dst (the canonical distributed PageRank); the rank and out-degree
    tables are node-sized and join back onto the edge list. N arrives as
    a broadcast 1-row scalar, never a driver literal.
    """
    # materialize the (deduped) edge list once: every damping round and
    # the degree/node derivations reuse it, instead of re-running the
    # upstream joins per round (the iterative-Spark lineage trap —
    # same localCheckpoint pattern as connected_components)
    e = _materialize(
        edges.select(F.col("src"), F.col("dst")).distinct(), eager=False
    )
    nodes = _materialize(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        eager=False,
    )
    # one job: materializes e + nodes AND picks the round join strategy
    # (rank/degree tables are node-sized — broadcast them when bounded
    # so no damping round exchanges the edge list; see
    # connected_components for the crossover rationale)
    small = nodes.count() <= _CC_BROADCAST_MAX_NODES
    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    deg = _materialize(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), eager=False
    )
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{scale}L div n").alias("rank")
    )
    for _ in range(iters):
        rsrc = ranks.select(F.col("node").alias("src"), "rank")
        contribs = (
            e.join(F.broadcast(deg) if small else deg, "src")
            .join(F.broadcast(rsrc) if small else rsrc, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div outdeg")).alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(
                F.broadcast(contribs) if small else contribs,
                nodes.node == contribs.dst,
                "left",
            )
            .select(
                "node",
                (
                    F.expr(f"{15 * scale}L div (100 * n)")
                    + F.expr("(85 * coalesce(s, 0L)) div 100")
                ).alias("rank"),
            )
        )
        # materialize each round once: without this, round k's lazy
        # lineage re-executes every earlier round on each reference.
        # Lazy cut: the next round's broadcast/collect (or the caller's
        # action) materializes the blocks — no standalone job per round.
        ranks = _materialize(ranks, eager=False)
    return ranks


def bfs_hops(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    seed_mod: int = 10,
    max_hops: int = 4,
) -> DataFrame:
    """Bounded multi-source BFS: (node, hop) with hop = shortest hop
    distance (<= max_hops) from the seed set {node : node % seed_mod == 0};
    hop is NULL for nodes no seed reaches within the bound.

    Frontier BFS, the Pregel shape: each round equi-joins the edge list
    against ONLY the nodes discovered last round, anti-joins out the
    already-reached set, and stops early once the frontier drains. On a
    dense duplicate graph (the LSH candidate graph at sf0.1 is ~5k nodes
    x ~9M pairs) this beats min-label propagation by a large factor:
    full-relabel joins touch every edge every round, while the frontier
    variant touches an edge only the round its source is discovered.
    The hop BOUND keeps the worst case fixed-cost on a 100 TB graph
    (unbounded diameters belong to connected_components' fixpoint loop).
    Seeds come from a deterministic id predicate so reruns and the
    DuckDB recursive-CTE twin agree exactly.

    `edges` must be a distinct pair list (as lsh_candidate_pairs emits).
    The pair list is materialized ONCE in its single direction and each
    round probes it from both ends — half the bytes of materializing a
    symmetrized copy, the win that matters when the edge list is the
    biggest thing in the job.
    """
    e = _materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")), eager=False
    )
    nodes = _materialize(
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct(),
        eager=False,
    )
    # One job: materializes e + nodes blocks AND yields the scalar that
    # picks the per-round join strategy (same size-guarded broadcast as
    # connected_components: frontier/reached are node-bounded, so when
    # the node table is small every round's probe of the big edge list
    # is a broadcast hash join — no exchange of e per round; above the
    # bound the exchange plans stay).
    small = nodes.count() <= _CC_BROADCAST_MAX_NODES
    reached = _materialize(
        nodes.filter(F.col("node") % seed_mod == 0).withColumn("hop", F.lit(0)),
        eager=False,
    )
    frontier = reached.select("node")
    for k in range(1, max_hops + 1):
        fa = frontier.withColumnRenamed("node", "a")
        fb = frontier.withColumnRenamed("node", "b")
        fwd = e.join(F.broadcast(fa) if small else fa, "a").select(
            F.col("b").alias("node")
        )
        bwd = e.join(F.broadcast(fb) if small else fb, "b").select(
            F.col("a").alias("node")
        )
        seen = reached.select("node")
        discovered = _materialize(
            fwd.union(bwd)
            .distinct()
            .join(F.broadcast(seen) if small else seen, "node", "left_anti")
            .withColumn("hop", F.lit(k)),
            eager=False,
        )
        # one job: materializes the frontier blocks AND tests drain
        # (count replaces isEmpty — the eager checkpoint computed every
        # partition anyway, so this is strictly fewer jobs, not more
        # work)
        if discovered.count() == 0:
            break
        reached = _materialize(reached.union(discovered), eager=False)
        frontier = discovered.select("node")
    final = reached.select("node", "hop")
    return nodes.join(
        F.broadcast(final) if small else final, "node", "left"
    ).select("node", "hop")
