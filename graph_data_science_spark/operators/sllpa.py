"""Speaker-Listener Label Propagation (SLLPA) — overlapping communities.

Reference analog: ``alpha/alpha-proc/.../pregel/SpeakerListenerLPA.java``
(``gds.alpha.sllpa``): every node keeps a memory of ``maxIterations`` label
slots, initialized to its own id. Each round every node SPEAKS — sends one
label drawn from its filled memory slots to each out-neighbor — and
LISTENS — writes the most frequent incoming label (ties → smallest) into
the next slot. After the last round each node PRUNES: it reports every
label whose relative frequency in its memory exceeds
``min_association_strength``. Nodes can retain several labels, which is the
point: communities OVERLAP.

Spark-first re-expression on the engine's Pregel driver (plans/pregel.py):
the vertex state is ``(node_id, labels: array<long>)`` — ~``maxIterations``
longs per node, the same O(n·k) memory the reference's HugeObjectArray
holds. One superstep is one shuffle-hash message join + one
(dst, label)-keyed partial-agg mode; the label-array update is a pure
``transform`` projection, so a superstep's plan shape is identical to the
engine's LPA superstep with an extra array column riding along.

Determinism: the reference draws the spoken slot from a per-thread
``SplittableRandom`` (run-to-run nondeterministic; its own test pins a
seed). Here the draw is ``xxhash64(src, dst, round, seed) mod round`` — a
fixed function of the edge and round, so results are bit-identical at any
parallelism and across reruns, the same discipline as the engine's other
seeded samplers. The reference runs asynchronously (asyncronous=true);
this is the synchronous BSP variant: every listener sees exactly the
messages spoken in the previous round, which the deterministic draw makes
reproducible (documented divergence, same contract as LPA's sync mode).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.plans.partitioning import shuffle_hash
from graph_data_science_spark.plans.pregel import ACTIVE_COL, Pregel


@dataclass
class SllpaResult:
    #: (node_id, community_ids: array<long> ascending)
    communities: DataFrame
    ran_iterations: int
    converged: bool


def sllpa(
    g: Graph,
    max_iterations: int = 10,
    min_association_strength: float = 0.2,
    seed: int = 42,
    checkpoint_dir: str | None = None,
) -> SllpaResult:
    """Run SLLPA; returns per-node OVERLAPPING community ids.

    ``labels[0] = node_id``; rounds ``t = 1..max_iterations-1`` fill slot t:
    each edge (u→v) carries ``labels_u[xxhash64(u,v,t,seed) mod t]`` to v;
    v's slot t becomes the plurality label (ties → seeded hash draw, see
    step()), or stays v's own id when v has no in-edges
    (SpeakerListenerLPA.init: "vote for itself").
    Prune keeps labels with frequency/max_iterations strictly greater than
    ``min_association_strength`` (SpeakerListenerLPA.prune).
    """
    if max_iterations < 2:
        raise ValueError("sllpa needs max_iterations >= 2")
    k = int(max_iterations)
    spark = g.nodes.sparkSession
    edges = g.edges.select("src", "dst")

    init = g.nodes.select(
        "node_id",
        F.array_repeat(F.col("node_id"), k).alias("labels"),
        F.lit(1).alias(ACTIVE_COL),
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        t = superstep + 1  # slot being filled; draws come from slots 0..t-1
        sender = state.select(
            F.col("node_id").alias("src"), F.col("labels").alias("_sl"))
        msgs = (
            edges.join(shuffle_hash(sender), "src")
            .select(
                F.col("dst").alias("node_id"),
                F.element_at(
                    "_sl",
                    (F.pmod(F.xxhash64("src", "dst", F.lit(t), F.lit(seed)),
                            F.lit(t)) + 1).cast("int"),
                ).alias("_lab"),
            )
        )
        # plurality with a HASHED tie-break: a min-label rule would be
        # systematically biased (a node with exactly two in-neighbors would
        # deterministically adopt the smaller clique's label every round and
        # never overlap — the opposite of SLLPA's point). xxhash64(node,
        # label, round, seed) is an unbiased stand-in for the reference's
        # random tie resolution that stays bit-deterministic at any
        # parallelism; the trailing label term makes the order total.
        winners = (
            msgs.groupBy("node_id", "_lab").agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("node_id")
            .agg(F.max(F.struct(
                F.col("_c"),
                F.xxhash64("node_id", "_lab", F.lit(t), F.lit(seed))
                .alias("_h"),
                F.col("_lab").alias("_l"))).alias("_w"))
            .select("node_id", F.col("_w._l").alias("_win"))
        )
        return (
            state.join(winners, "node_id", "left")
            .select(
                "node_id",
                F.transform(
                    "labels",
                    lambda x, i: F.when(
                        i == t, F.coalesce(F.col("_win"), x)).otherwise(x),
                ).alias("labels"),
                # fixed-round schedule: stay active until the last slot fills
                F.lit(1 if t < k - 1 else 0).alias(ACTIVE_COL),
            )
        )

    driver = Pregel(
        spark,
        max_iterations=k - 1,
        checkpoint_dir=checkpoint_dir,
        manifest={"algorithm": "sllpa", "max_iterations": k,
                  "min_association_strength": min_association_strength,
                  "seed": seed},
    )
    res = driver.run(init, step)

    thr = float(min_association_strength)
    labels = F.col("labels")
    communities = res.state.select(
        "node_id",
        F.sort_array(
            F.filter(
                F.array_distinct(labels),
                lambda v: F.size(F.filter(labels, lambda x: x == v))
                / F.lit(float(k)) > F.lit(thr),
            )
        ).alias("community_ids"),
    )
    return SllpaResult(communities, res.ran_iterations, res.converged)
