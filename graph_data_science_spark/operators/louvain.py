"""Louvain / Leiden / modularity optimization — community detection by
modularity-ascent local moving + graph coarsening.

Reference semantics:
- ``gds.louvain`` — algo/src/main/java/org/neo4j/gds/louvain/Louvain.java:49
  (levels of ModularityOptimization + graph aggregation).
- ``gds.beta.modularityOptimization`` — algo/.../modularityoptimization/
  ModularityOptimization.java:63, which implements Lu–Halappanavar–
  Kalyanaraman "Parallel heuristics for scalable community detection"
  (Parallel Computing 47, 2015): nodes are partitioned into color classes
  and each class moves SYNCHRONOUSLY against the previous assignment.
- ``gds.leiden`` — algo/.../leiden/Leiden.java:42 (local moving +
  refinement + aggregation; refinement guarantees connected communities).

Determinism contract (this engine's divergence from GDS, documented): GDS's
parallel local moving is concurrency-dependent (its own docs say results
vary run to run). Here the move schedule is FIXED — nodes move in
``classes`` round-robin id classes (``node_id % classes``), each sub-round
synchronous against the previous assignment — so results are bit-identical
at any parallelism AND expressible as an unrolled SQL recurrence, which is
what the DuckDB value-hash oracle checks. The reference's color classes play
the same role (sync within a class); fixed id classes trade a little move
quality for reproducibility.

Move rule (standard Louvain gain, resolution γ=1): for node v with weighted
degree k_v, candidate community C (any neighbor community or its own),

    score(C) = k_{v,C} − k_v · (vol(C) − [v ∈ C]·k_v) / (2m)

rounded to 6dp (the cross-engine float contract; on integer-weighted graphs
every operand is exact so both engines agree bit-for-bit). v moves to the
argmax (ties → smaller community id) iff that strictly beats its current
community's score. A level converges when a full pass moves nobody; the
graph is then coarsened (communities → supernodes, ALL adjacency weights
summed — the row-sum convention below makes this one groupBy) and the next
level runs on the coarse graph. Community labels are relabeled to the
minimum ORIGINAL member node id after every level, so final ids are stable,
meaningful, and portable.

Adjacency convention: ``adj`` holds each u≠v edge twice (both directions)
and each self-loop ONCE with doubled weight, so that
``k_u = Σ w over rows with src=u`` and coarsening = one groupBy-sum.
``m = Σ_all w / 2`` is invariant across levels.

Spark plan per sub-round: volumes = one partial-agg sum over the assignment;
candidate tallies = adj ⋈ assignment (shuffle-hash on the state side) + one
partial-agg sum; argmax per node = one more partial-agg max(struct) — no
windows, no Python in the loop. Sub-rounds are FUSED per iteration into one
lazy plan (see _local_move) and each block's output is truncated via a
parquet-round-trip scratch snapshot (same discipline as plans/pregel —
chained localCheckpoint is 10× slower here, see its module doc #1).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.plans.partitioning import shuffle_hash

# edge-weight mass (m = Σw/2 ≈ edge count unweighted) above which fused
# sub-round chains disable AQE during scratch writes — below it AQE's
# partition coalescing is worth 3× at local scale (_Scratch docstring);
# above it static ReuseExchange dedup wins (docs/SCALE_NOTES.md §11)
_AQE_OFF_MIN_M = float(os.environ.get("SPARK_GRAFT_AQE_OFF_MIN_M", "2000000"))

# stream row count below which _Scratch auto mode truncates in memory
# instead of via parquet round-trip — the same 1M-row gate (and the same
# reasoning) as plans/pregel._AQE_OFF_MIN_ROWS: small states are job-floor
# bound, large states rescan faster from columnar parquet
_MEM_TRUNC_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_AQE_OFF_MIN_ROWS", "1000000"))

# adjacency ROW count (mirrored, ≈ 2× edges) at or below which the remaining
# levels finish on the driver (_local_solve) instead of paying the per-job
# scheduling floor per sub-round. This is the standard two-phase design of
# every distributed Louvain (and what the single-node reference IS): level 0
# on a 100 TB graph stays fully distributed, but each coarsening shrinks the
# supernode graph by orders of magnitude, and once it fits in driver memory
# (~2M rows ≈ 50 MB Arrow) the fixed sub-round schedule is pure scheduling
# floor — finish it locally, bit-identically. 0 disables.
_LOCAL_FINISH_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_LOUVAIN_LOCAL_MAX", "2000000"))


class _Scratch:
    """Per-stream loop-state truncation: parquet round-trip OR retired
    in-memory checkpoints, SIZE-gated per truncate.

    Parquet mode (the 100 TB path): two alternating slots per named stream
    bound disk to the last two states; rescans are vectorized columnar
    batch reads (measured 2× faster than serialized-checkpoint rescans at
    the 8M-row north-rule scale — plans/pregel.py truncation notes).

    Memory mode (below the gate): eager SERIALIZED ``localCheckpoint``
    with the GRANDPARENT checkpoint retired per truncate — the same
    two-states-per-stream validity window as the parquet slots (a
    stream's previous state stays readable until the stream truncates
    twice more), so the two modes are drop-in interchangeable. At small
    state sizes this removes the ~0.3 s/truncate write+read floor that
    dominates fixed sub-round schedules (measured at sf0.1: pagerank ~2×).

    ``mode="auto"`` (default) picks per call: the first truncate of a
    stream is parquet (row count unknown — the scale-safe side), then the
    stream's own observed row count (the count rides the materializing job
    via ``Observation`` — no extra action) gates subsequent calls at
    ``_MEM_TRUNC_MAX_ROWS``. ``SPARK_GRAFT_TRUNCATION`` pins a mode.

    ``aqe_off`` is SIZE-gated by the caller, not hardwired: disabling AQE
    protects static ReuseExchange dedup inside fused sub-round chains
    (docs/SCALE_NOTES.md §11), which pays off only when the per-stage data
    is large enough that re-executed exchanges dominate. Below that, AQE's
    partition coalescing wins outright — measured at sf0.1 (600k edges,
    local[32]) a 2-level Louvain is 97.6 s with AQE off vs 31.8 s with AQE
    on (3×: every 32-task stage of a ~17-sub-round schedule is scheduling
    floor, not work), while the §11 depth-2 chain at 14M edges runs ~1.5×
    better with AQE off."""

    def __init__(self, spark, aqe_off: bool = False, mode: str | None = None):
        import tempfile
        self.spark = spark
        self.dir = tempfile.mkdtemp(prefix="gds_louvain_")
        self._n: dict[str, int] = {}
        self.aqe_off = aqe_off
        if mode is None:
            mode = os.environ.get("SPARK_GRAFT_TRUNCATION", "auto")
        if mode not in ("memory", "parquet", "auto"):
            raise ValueError(f"unknown truncation {mode!r}")
        self.mode = mode
        self._rows: dict[str, int] = {}   # stream -> last observed row count
        self._hist: dict[str, list] = {}  # stream -> live checkpoint RDDs

    def truncate(self, df: DataFrame, stream: str,
                 rows_hint: int | None = None) -> DataFrame:
        """``rows_hint`` seeds the auto-mode gate for a stream's FIRST
        truncate (callers using per-level stream names pass the previous
        level's observed count); the stream's own observation takes over
        from the second truncate on."""
        import os
        from pyspark.sql import Observation
        known = self._rows.get(stream, rows_hint)
        use_mem = self.mode == "memory" or (
            self.mode == "auto"
            and (known if known is not None else _MEM_TRUNC_MAX_ROWS)
            < _MEM_TRUNC_MAX_ROWS)
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        rdd = None
        if use_mem:
            from pyspark.storagelevel import StorageLevel

            from graph_data_science_spark.plans.loop_state import (
                strip_origin_stats)
            new = df.localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
            try:
                rdd = new._jdf.queryExecution().analyzed().rdd()
            except Exception:  # pragma: no cover - plan shape changed
                pass
            # drop carried-forward origin stats — chained checkpoints
            # compound join-size estimates exponentially (nested Borůvka/
            # min-label loops overflow BigInteger; loop_state.py docstring)
            new = strip_origin_stats(new)
        else:
            c = self._n.get(stream, 0)
            path = os.path.join(self.dir, f"{stream}-{c % 2}")
            if self.aqe_off:
                from graph_data_science_spark.plans.pregel import no_aqe
                with no_aqe(self.spark):
                    df.write.mode("overwrite").parquet(path)
            else:
                df.write.mode("overwrite").parquet(path)
            self._n[stream] = c + 1
            new = self.spark.read.parquet(path)
        self._rows[stream] = int(obs.get["rows"] or 0)
        hist = self._hist.setdefault(stream, [])
        hist.append(rdd)
        if len(hist) > 2:
            old = hist.pop(0)
            if old is not None:
                try:
                    old.unpersist(False)
                except Exception:  # pragma: no cover
                    pass
        return new

    def cleanup(self) -> None:
        """Reclaim scratch: parquet slots AND any live memory checkpoints.
        Same caller contract as the parquet-only version — a result that
        must outlive the scratch is detached with its own terminal
        ``localCheckpoint(eager=True)`` before cleanup."""
        import shutil
        shutil.rmtree(self.dir, ignore_errors=True)
        for hist in self._hist.values():
            for rdd in hist:
                if rdd is not None:
                    try:
                        rdd.unpersist(False)
                    except Exception:  # pragma: no cover
                        pass
        self._hist.clear()


@dataclass
class CommunityResult:
    communities: DataFrame  # (node_id, community)
    modularity: float
    ran_levels: int
    ran_iterations: int
    converged: bool


def _adjacency(graph: Graph, weighted: bool = True) -> DataFrame:
    """Mirrored adjacency with the row-sum degree convention (module doc)."""
    e = graph.edges
    w = (F.col("weight").cast("double") if weighted and "weight" in e.columns
         else F.lit(1.0))
    e = e.select("src", "dst", w.alias("w"))
    nonloop = e.where(F.col("src") != F.col("dst"))
    mirrored = nonloop.unionByName(
        nonloop.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    loops = e.where(F.col("src") == F.col("dst")).select(
        "src", "dst", (F.col("w") * 2.0).alias("w"))
    return mirrored.unionByName(loops).groupBy("src", "dst").agg(
        F.sum("w").alias("w"))


def _sub_round(adj: DataFrame, comm: DataFrame, k: DataFrame, m: float,
               p: int, n_classes: int,
               gamma: float = 1.0) -> DataFrame:
    """One synchronous move pass for class ``node_id % n_classes == p``,
    as a LAZY plan: ``comm`` (node_id, comm, _mvd) → same schema, with
    ``_mvd`` ORed with this pass's per-node moved bit. ``gamma`` is the
    Leiden resolution (LeidenBaseConfig.java:38; γ=1 = classic modularity):
    it scales the expected-edges term of the gain.

    The caller chains sub-rounds and truncates/observes at block ends
    (plans/pregel.py fusion discipline). Chaining is safe because each
    reference to the previous sub-round's output re-executes only its
    post-shuffle map work — the aggregations below it end in identical
    exchanges that Spark's ReuseExchange dedupes — and the reference count
    per level (~5) keeps Catalyst's tree-walk cost bounded for one-iteration
    blocks (see _local_move)."""
    vol = (comm.join(k, "node_id")
           .groupBy("comm").agg(F.sum("k").alias("vol")))
    movers = comm.where(F.pmod(F.col("node_id"), F.lit(n_classes)) == p)

    c_of = shuffle_hash(comm.select(F.col("node_id").alias("dst"),
                                    F.col("comm").alias("C")))
    kuc = (
        adj.where(F.col("src") != F.col("dst"))
        .where(F.pmod(F.col("src"), F.lit(n_classes)) == p)
        .join(c_of, "dst")
        .groupBy("src", "C").agg(F.sum("w").alias("kuc"))
    )
    # the current community is always a candidate (k_{v,cur} may be 0)
    cur0 = movers.select(F.col("node_id").alias("src"),
                         F.col("comm").alias("C"), F.lit(0.0).alias("kuc"))
    cand = kuc.unionByName(cur0).groupBy("src", "C").agg(
        F.sum("kuc").alias("kuc"))

    scored = (
        cand.join(movers.select(F.col("node_id").alias("src"),
                                F.col("comm").alias("cur")), "src")
        .join(vol.withColumnRenamed("comm", "C"), "C")
        .join(k.withColumnRenamed("node_id", "src"), "src")
    )
    own = F.when(F.col("C") == F.col("cur"), F.col("k")).otherwise(F.lit(0.0))
    s = F.round(F.col("kuc")
                - F.lit(float(gamma)) * F.col("k") * (F.col("vol") - own) / (2.0 * m), 6)
    best = (
        scored.select("src", "cur", "C", s.alias("s"))
        .groupBy("src", "cur")
        .agg(
            F.max(F.struct(F.col("s"), (-F.col("C")).alias("negC"),
                           F.col("C").alias("C"))).alias("b"),
            F.max(F.when(F.col("C") == F.col("cur"), F.col("s"))).alias("cur_s"),
        )
    )
    upd = best.select(
        F.col("src").alias("node_id"),
        F.when(F.col("b.s") > F.col("cur_s"), F.col("b.C"))
        .otherwise(F.col("cur")).alias("_new"),
    )
    return comm.join(shuffle_hash(upd), "node_id", "left").select(
        "node_id",
        F.coalesce(F.col("_new"), F.col("comm")).alias("comm"),
        F.greatest(
            F.col("_mvd"),
            (F.coalesce(F.col("_new"), F.col("comm")) != F.col("comm"))
            .cast("int")).alias("_mvd"),
    )


def _local_move(adj, sup_nodes, k, m, max_iterations, n_classes, scratch,
                gamma: float = 1.0, fuse: int | None = None):
    """Run class-restricted sync local moving to convergence on one level.
    Returns (assignment, total_moves, iterations_ran).

    Sub-round FUSION (plans/pregel.py module doc #4, docs/SCALE_NOTES.md
    §10): whole iterations (``n_classes`` sub-rounds each) are chained as
    one lazy plan and truncated/observed only at block ends, dividing the
    per-sub-round job barrier + scratch round-trip — the non-scaling cost
    component, and at correctness scale the ~1 s/job floor that dominates
    the fixed 2×4×2 schedule — by the block size. Blocks are whole
    iterations: one iteration per block by default (each sub-round
    references its predecessor ~5×, so Catalyst's tree walk grows
    ~5^depth; one iteration ≈ 25 instances is cheap, three ≈ 15k is not).
    Convergence checks the block-accumulated per-node moved bit: a strict
    improvement rule makes a converged assignment a fixpoint, so a block
    straddling convergence runs identity sub-rounds and the result is
    bit-identical to the unfused schedule.

    Fusion is SIZE-gated with the AQE toggle as a package (``fuse=0`` =
    truncate per sub-round): below the gate AQE stays on, AQE defeats the
    ReuseExchange dedup that makes chained sub-rounds cheap, so a fused
    block replays its predecessor's exchanges ~5× — at sf0.1 the unfused
    schedule is what the per-sub-round convergence check wants anyway
    (measured r2: 26.6 s unfused vs 31.8–35.7 s fused at 600k edges).
    An explicit ``fuse`` argument or SPARK_GRAFT_FUSE env bypasses the
    gate (the sweep/probe scripts set it deliberately)."""
    if fuse is None:
        env = os.environ.get("SPARK_GRAFT_FUSE")
        if env is not None:
            fuse = max(1, int(env) // max(1, n_classes))
        elif not scratch.aqe_off:
            fuse = 0  # below the size gate: per-sub-round truncation
        else:
            fuse = 1
    comm = sup_nodes.select("node_id", F.col("node_id").alias("comm"))
    comm = scratch.truncate(comm, "comm")
    from pyspark.sql import Observation
    total = 0
    it = 0
    moves = 0
    if int(fuse) == 0:
        # unfused schedule: one truncate/Observation per sub-round;
        # convergence = a whole iteration (all classes) with zero moves
        while it < max_iterations:
            iter_moves = 0
            for p in range(n_classes):
                new = comm.select("node_id", "comm",
                                  F.lit(0).cast("int").alias("_mvd"))
                new = _sub_round(adj, new, k, m, p, n_classes, gamma)
                obs = Observation()
                new = new.observe(obs, F.sum("_mvd").alias("moves"))
                new = scratch.truncate(new, "comm")
                iter_moves += int(obs.get["moves"] or 0)
                comm = new.select("node_id", "comm")
            moves = iter_moves
            total += iter_moves
            it += 1
            if iter_moves == 0:
                break
        return comm, total, it, moves == 0
    while it < max_iterations:
        blk = min(int(fuse), max_iterations - it)
        new = comm.select("node_id", "comm", F.lit(0).cast("int").alias("_mvd"))
        for _ in range(blk):
            for p in range(n_classes):
                new = _sub_round(adj, new, k, m, p, n_classes, gamma)
        obs = Observation()
        new = new.observe(obs, F.sum("_mvd").alias("moves"))
        new = scratch.truncate(new, "comm")
        moves = int(obs.get["moves"] or 0)
        comm = new.select("node_id", "comm")
        total += moves
        it += blk
        if moves == 0:
            break
    # converged = the LAST block moved nothing (fixpoint reached), whether
    # the loop broke early or landed exactly on the iteration cap
    return comm, total, it, moves == 0


def _relabel_min_member(comm: DataFrame) -> DataFrame:
    lab = comm.groupBy("comm").agg(F.min("node_id").alias("_new"))
    return comm.join(lab, "comm").select(
        "node_id", F.col("_new").alias("comm"))


def _coarsen(adj: DataFrame, comm: DataFrame) -> DataFrame:
    cu = comm.select(F.col("node_id").alias("src"), F.col("comm").alias("cs"))
    cv = comm.select(F.col("node_id").alias("dst"), F.col("comm").alias("cd"))
    return (
        adj.join(cu, "src").join(cv, "dst")
        .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .agg(F.sum("w").alias("w"))
    )


def _degrees(adj: DataFrame, sup_nodes: DataFrame) -> DataFrame:
    k = adj.groupBy(F.col("src").alias("node_id")).agg(F.sum("w").alias("k"))
    return sup_nodes.join(k, "node_id", "left").select(
        "node_id", F.coalesce("k", F.lit(0.0)).alias("k"))


def _modularity_value(adj: DataFrame, comm: DataFrame, m: float,
                      gamma: float = 1.0) -> float:
    """Q_γ = Σ_C [ intra_rowsum(C)/(2m) − γ·(vol(C)/(2m))² ] on the row-sum
    convention (intra_rowsum already counts each internal edge twice);
    γ=1 is classic modularity."""
    cu = comm.select(F.col("node_id").alias("src"), F.col("comm").alias("cs"))
    cv = comm.select(F.col("node_id").alias("dst"), F.col("comm").alias("cd"))
    tagged = adj.join(cu, "src").join(cv, "dst")
    intra = (tagged.where(F.col("cs") == F.col("cd"))
             .groupBy("cs").agg(F.sum("w").alias("i")))
    vol = tagged.groupBy("cs").agg(F.sum("w").alias("vol"))
    parts = vol.join(intra, "cs", "left").select(
        (F.coalesce("i", F.lit(0.0)) / (2.0 * m)
         - F.lit(float(gamma))
         * (F.col("vol") / (2.0 * m)) * (F.col("vol") / (2.0 * m))).alias("q"))
    return float(parts.agg(F.sum("q")).first()[0] or 0.0)


def _refine_connectivity(adj: DataFrame, comm: DataFrame,
                         scratch: _Scratch | None = None,
                         max_rounds: int = 50) -> DataFrame:
    """Leiden refinement, reduced to its deterministic core: split every
    community into the connected components of its induced subgraph (min-id
    label propagation restricted to intra-community edges). Guarantees the
    property Leiden exists to restore — no disconnected communities
    (Traag/Waltman/van Eck 2019 §2; leiden/Leiden.java refinement phase) —
    while staying deterministic (no random θ sampling)."""
    cu = comm.select(F.col("node_id").alias("src"), F.col("comm").alias("cs"))
    cv = comm.select(F.col("node_id").alias("dst"), F.col("comm").alias("cd"))
    own_scratch = scratch is None
    if scratch is None:
        scratch = _Scratch(adj.sparkSession)
    intra = (adj.where(F.col("src") != F.col("dst"))
             .join(cu, "src").join(cv, "dst")
             .where(F.col("cs") == F.col("cd"))
             .select("src", "dst"))
    intra = scratch.truncate(intra, "intra")
    lab = comm.select("node_id", F.col("node_id").alias("lab"))
    lab = scratch.truncate(lab, "lab")
    for _ in range(max_rounds):
        msgs = intra.join(
            lab.select(F.col("node_id").alias("src"), F.col("lab").alias("_l")),
            "src").groupBy(F.col("dst").alias("node_id")).agg(
            F.min("_l").alias("_m"))
        new = lab.join(msgs, "node_id", "left").select(
            "node_id",
            F.least(F.col("lab"), F.coalesce(F.col("_m"), F.col("lab"))).alias("lab"),
            (F.least(F.col("lab"), F.coalesce(F.col("_m"), F.col("lab")))
             < F.col("lab")).cast("int").alias("_ch"),
        )
        from pyspark.sql import Observation
        obs = Observation()
        new = new.observe(obs, F.sum("_ch").alias("ch"))
        new = scratch.truncate(new, "lab")
        changed = obs.get["ch"] or 0
        lab = new.select("node_id", "lab")
        if changed == 0:
            break
    out = lab.select("node_id", F.col("lab").alias("comm"))
    if own_scratch:
        out = out.localCheckpoint(eager=True)
        scratch.cleanup()
    return out


def _theta_refine(adj: DataFrame, orig: DataFrame, k: DataFrame, m: float,
                  gamma: float, theta: float, seed: int,
                  scratch: _Scratch, rounds: int = 3) -> DataFrame:
    """θ-randomized Leiden refinement (Leiden.java:189 RefinementPhase,
    θ default LeidenBaseConfig.java:43), reduced to a bounded distributed
    pass: fragments start as SINGLETONS inside each local-move community
    and repeatedly merge along intra-community edges.

    Per round, for adjacent fragments r, r' of the same original community:
    gain(r→r') = e(r,r')/(2m) − γ·vol(r)·vol(r')/(2m)² (the CPM/modularity
    merge delta). Each fragment picks a positive-gain target drawn
    ∝ exp(gain/θ) via the Gumbel-max trick over the hash-u01 stream —
    deterministic per ``seed`` (the reference takes randomSeed), emulating
    the reference's randomized-refinement distribution without
    run-to-run nondeterminism. Merges apply only "uphill" (into strictly
    larger volume, ties → smaller id), so each round's merge relation is
    acyclic. Every merge follows an edge, so every produced fragment is
    CONNECTED — the invariant Leiden refinement exists to restore — and
    fragments never cross local-move community boundaries.

    The result is a partition finer than (or equal to) the local-move
    partition, as in the reference; subsequent levels' local moving
    re-merges fragments when γ-modularity favors it. Merges require
    positive gain, so the pass never degrades γ-modularity below the
    singleton-refined start."""
    from graph_data_science_spark.operators.embeddings import _u01

    o_src = orig.select(F.col("node_id").alias("src"), F.col("comm").alias("_o1"))
    o_dst = orig.select(F.col("node_id").alias("dst"), F.col("comm").alias("_o2"))
    intra = (adj.where(F.col("src") != F.col("dst"))
             .join(o_src, "src").join(o_dst, "dst")
             .where(F.col("_o1") == F.col("_o2"))
             .select("src", "dst", "w"))
    intra = scratch.truncate(intra, "th_intra")

    comm = orig.select("node_id", F.col("node_id").alias("comm"))
    comm = scratch.truncate(comm, "th_comm")
    for rnd in range(int(rounds)):
        c_r = comm.select(F.col("node_id").alias("src"), F.col("comm").alias("r"))
        c_r2 = comm.select(F.col("node_id").alias("dst"), F.col("comm").alias("r2"))
        vol = (comm.join(k, "node_id").groupBy("comm")
               .agg(F.sum("k").alias("vol")))
        e_rr = (intra.join(c_r, "src").join(c_r2, "dst")
                .where(F.col("r") != F.col("r2"))
                .groupBy("r", "r2").agg(F.sum("w").alias("e")))
        cand = (e_rr
                .join(vol.select(F.col("comm").alias("r"),
                                 F.col("vol").alias("vr")), "r")
                .join(vol.select(F.col("comm").alias("r2"),
                                 F.col("vol").alias("vr2")), "r2"))
        gain = (F.col("e") / (2.0 * m)
                - F.lit(float(gamma)) * F.col("vr") * F.col("vr2")
                / ((2.0 * m) * (2.0 * m)))
        uphill = ((F.col("vr2") > F.col("vr"))
                  | ((F.col("vr2") == F.col("vr")) & (F.col("r2") < F.col("r"))))
        u = _u01(F.col("r"), F.col("r2"), F.lit("theta"), F.lit(rnd),
                 F.lit(int(seed)))
        gumbel = -F.log(-F.log(
            F.greatest(F.lit(1e-12), F.least(u, F.lit(1.0 - 1e-12)))))
        scored = (cand.where(uphill)
                  .select("r", "r2", gain.alias("g"),
                          (gain / F.lit(float(theta)) + gumbel).alias("pri"))
                  .where(F.col("g") > 0.0))
        pick = (scored.groupBy("r")
                .agg(F.max(F.struct(F.col("pri"), (-F.col("r2")).alias("n2"),
                                    F.col("r2").alias("tgt"))).alias("b"))
                .select(F.col("r").alias("comm"), F.col("b.tgt").alias("tgt")))
        from pyspark.sql import Observation
        obs = Observation()
        merged = comm.join(pick, "comm", "left").select(
            "node_id", F.coalesce("tgt", "comm").alias("comm"),
            F.col("tgt").isNotNull().cast("int").alias("_mg"))
        merged = merged.observe(obs, F.sum("_mg").alias("mg"))
        merged = scratch.truncate(merged, "th_comm")
        moved = obs.get["mg"] or 0
        comm = merged.select("node_id", "comm")
        if moved == 0:
            break
    return scratch.truncate(_relabel_min_member(comm), "th_out")


def modularity_optimization(
    graph: Graph,
    max_iterations: int = 10,
    n_classes: int = 2,
    weighted: bool = True,
    local_finish_max_rows: int | None = None,
) -> CommunityResult:
    """``gds.beta.modularityOptimization`` analog: ONE level of local moving
    (no coarsening) → (node_id, community), community = min member id."""
    spark = graph.nodes.sparkSession
    scratch = _Scratch(spark)
    try:
        adj = scratch.truncate(_adjacency(graph, weighted), "adj")
        nodes = graph.nodes.select("node_id")
        m = float(adj.agg(F.sum("w")).first()[0] or 0.0) / 2.0
        # size gate for the fused-chain AQE toggle (class docstring): only
        # graphs big enough that exchange re-execution outweighs AQE's
        # partition coalescing turn it off
        scratch.aqe_off = m >= _AQE_OFF_MIN_M
        if m == 0.0:
            return CommunityResult(
                nodes.select("node_id", F.col("node_id").alias("community")),
                0.0, 1, 0, True)
        # same size-gated local finish as _multilevel (one level here)
        lf_max = (_LOCAL_FINISH_MAX_ROWS if local_finish_max_rows is None
                  else local_finish_max_rows)
        adj_rows = scratch._rows.get("adj")
        if (0 < lf_max and adj_rows is not None
                and adj_rows <= lf_max
                and nodes.count() <= lf_max):
            import numpy as np
            import pandas as pd
            pa = adj.select("src", "dst", "w").toPandas()
            ids = np.sort(nodes.toPandas()["node_id"]
                          .to_numpy(dtype=np.int64))
            labels, _, lf_iters, lf_conv = _local_solve(
                pa["src"].to_numpy(), pa["dst"].to_numpy(),
                pa["w"].to_numpy(), ids, m, 1, max_iterations,
                n_classes, 1.0)
            q = _modularity_local(
                pa["src"].to_numpy(), pa["dst"].to_numpy(),
                pa["w"].to_numpy(), labels, ids, m, 1.0)
            out = spark.createDataFrame(pd.DataFrame(
                {"node_id": ids, "community": labels.astype("int64")}))
            out = out.localCheckpoint(eager=True)
            return CommunityResult(out, q, 1, lf_iters, lf_conv)
        k = scratch.truncate(_degrees(adj, nodes), "k")
        comm, moves, iters, lm_conv = _local_move(adj, nodes, k, m,
                                                  max_iterations,
                                                  n_classes, scratch)
        comm = _relabel_min_member(comm)
        q = _modularity_value(adj, comm, m)
        out = comm.select("node_id", F.col("comm").alias("community")) \
            .localCheckpoint(eager=True)
        return CommunityResult(out, q, 1, iters, lm_conv)
    finally:
        scratch.cleanup()


def _round6_half_up(v):
    """Bit-parity replica of Spark's ``F.round(col, 6)`` on doubles
    (HALF_UP on the shortest-decimal expansion, java.math.BigDecimal).
    Vectorized floor(|x|·1e6 + 0.5) fast path; values within float error
    of a .5 decimal boundary re-rounded exactly via ``decimal`` on the
    shortest repr (Python ``repr`` = Double.toString's shortest-roundtrip
    contract)."""
    import numpy as np
    scaled = v * 1e6
    a = np.abs(scaled)
    r = np.sign(scaled) * np.floor(a + 0.5) / 1e6
    frac = np.abs(a - np.floor(a) - 0.5)
    near = frac <= np.maximum(1e-9, 8.0 * np.spacing(a))
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal
        q = Decimal("1e-6")
        idx = np.nonzero(near)[0]
        for i in idx:
            r[i] = float(Decimal(repr(float(v[i])))
                         .quantize(q, ROUND_HALF_UP))
    return r


def _local_solve(src, dst, w, ids, m, max_levels, max_iterations,
                 n_classes, gamma):
    """Driver-side replica of the distributed level loop (unfused
    ``_local_move`` schedule + ``_relabel_min_member`` + ``_coarsen``),
    bit-identical on integer-weight graphs (module docstring: the 6dp
    rounding contract makes every score operand exact there, so the
    NumPy and Catalyst evaluations agree bit-for-bit; ``_round6_half_up``
    replicates ``F.round`` semantics).

    Inputs are the mirrored row-sum adjacency arrays (each u≠v edge twice,
    self-loops once with doubled w) and the current supernode ids. Returns
    ``(labels, levels_run, total_iters, converged)`` with ``labels[i]`` =
    final community (min original member id) of ``ids[i]``."""
    import numpy as np

    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    ids = np.sort(np.asarray(ids, dtype=np.int64))

    # fpos[i] = position of ORIGINAL node ids0[i] in the CURRENT level's ids
    fpos = np.arange(len(ids), dtype=np.int64)
    out_labels = ids.copy()
    levels = 0
    total_iters = 0
    moves_last_level = 1
    level_conv = True

    for _ in range(int(max_levels)):
        n = len(ids)
        sp = np.searchsorted(ids, src)
        dp = np.searchsorted(ids, dst)
        k = np.bincount(sp, weights=w, minlength=n)
        # community as a POSITION into ids: positions are order-isomorphic
        # to labels (ids sorted ascending), so every label comparison and
        # tie-break below is done on positions
        comm = np.arange(n, dtype=np.int64)
        # per-class edge subsets / movers (fixed for the whole level)
        nonloop = src != dst
        cls_e = np.mod(src, n_classes)
        by_class = []
        for p in range(n_classes):
            sel = nonloop & (cls_e == p)
            by_class.append((
                sp[sel].astype(np.int64), dp[sel], w[sel],
                np.nonzero(np.mod(ids, n_classes) == p)[0].astype(np.int64),
            ))
        level_moves = 0
        it = 0
        last_iter_moves = 1
        while it < max_iterations:
            iter_moves = 0
            for p in range(n_classes):
                se, de, we, movers = by_class[p]
                # candidate tallies k_{v,C} over edges + (v, cur, 0)
                key = np.concatenate([
                    se * n + comm[de],
                    movers * n + comm[movers],
                ])
                kw = np.concatenate([we, np.zeros(len(movers))])
                uk, inv = np.unique(key, return_inverse=True)
                kuc = np.bincount(inv, weights=kw)
                vpos = uk // n
                cpos = uk % n
                # volumes from the PREVIOUS assignment (sync within class)
                volv = np.bincount(comm, weights=k, minlength=n)
                cur_of_v = comm[vpos]
                kv = k[vpos]
                own = np.where(cpos == cur_of_v, kv, 0.0)
                # mirror Spark's evaluation order:
                # kuc - ((gamma * k) * (vol - own)) / (2m), rounded 6dp
                s = _round6_half_up(
                    kuc - ((gamma * kv) * (volv[cpos] - own)) / (2.0 * m))
                # argmax per v: max s, tie -> smaller C
                order = np.lexsort((cpos, -s, vpos))
                first = np.unique(vpos[order], return_index=True)[1]
                b_v = vpos[order][first]
                b_c = cpos[order][first]
                b_s = s[order][first]
                # score of the CURRENT community (always a candidate)
                is_cur = cpos == cur_of_v
                cur_s = np.empty(n)
                cur_s[vpos[is_cur]] = s[is_cur]
                mv = b_s > cur_s[b_v]
                changed = int(np.count_nonzero(mv))
                if changed:
                    comm[b_v[mv]] = b_c[mv]
                iter_moves += changed
            level_moves += iter_moves
            it += 1
            last_iter_moves = iter_moves
            if iter_moves == 0:
                break
        total_iters += it
        level_conv = last_iter_moves == 0
        # relabel to min member id (positions -> min member position)
        lab_min = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(lab_min, comm, np.arange(n, dtype=np.int64))
        comm = lab_min[comm]
        out_labels = ids[comm[fpos]]
        levels += 1
        moves_last_level = level_moves
        if level_moves == 0:
            break
        # coarsen: group (comm[src], comm[dst]) sum w
        upos = np.unique(comm)
        new_ids = ids[upos]
        nn = len(new_ids)
        ren = np.empty(n, dtype=np.int64)
        ren[upos] = np.arange(nn, dtype=np.int64)
        ck = ren[comm[sp]] * nn + ren[comm[dp]]
        uk, inv = np.unique(ck, return_inverse=True)
        w = np.bincount(inv, weights=w)
        src = new_ids[(uk // nn).astype(np.int64)]
        dst = new_ids[(uk % nn).astype(np.int64)]
        fpos = ren[comm[fpos]]
        ids = new_ids

    converged = (moves_last_level == 0) or level_conv
    return out_labels, levels, total_iters, converged


def _modularity_local(src, dst, w, labels_by_pos, ids, m, gamma):
    """Driver-side ``_modularity_value`` on the mirrored row-sum arrays."""
    import numpy as np
    ids = np.asarray(ids, dtype=np.int64)
    sp = np.searchsorted(ids, np.asarray(src, dtype=np.int64))
    dp = np.searchsorted(ids, np.asarray(dst, dtype=np.int64))
    w = np.asarray(w, dtype=np.float64)
    lab = np.asarray(labels_by_pos, dtype=np.int64)
    ulab, lpos = np.unique(lab, return_inverse=True)
    intra = np.bincount(
        lpos[sp], weights=np.where(lab[sp] == lab[dp], w, 0.0),
        minlength=len(ulab))
    vol = np.bincount(lpos[sp], weights=w, minlength=len(ulab))
    return float(np.sum(intra / (2.0 * m)
                        - gamma * (vol / (2.0 * m)) ** 2))


def _multilevel(graph, max_levels, max_iterations, n_classes, weighted,
                refine: bool, gamma: float = 1.0, theta: float = 0.0,
                seed: int = 42, local_finish_max_rows: int | None = None):
    lf_max = (_LOCAL_FINISH_MAX_ROWS if local_finish_max_rows is None
              else local_finish_max_rows)
    spark = graph.nodes.sparkSession
    scratch = _Scratch(spark)
    try:
        adj0 = scratch.truncate(_adjacency(graph, weighted), "adj0")
        nodes = graph.nodes.select("node_id")
        m = float(adj0.agg(F.sum("w")).first()[0] or 0.0) / 2.0
        scratch.aqe_off = m >= _AQE_OFF_MIN_M  # see _Scratch docstring
        identity = nodes.select("node_id", F.col("node_id").alias("community"))
        if m == 0.0:
            return CommunityResult(identity, 0.0, 0, 0, True)

        mapping = nodes.select("node_id", F.col("node_id").alias("super"))
        adj = adj0
        sup = nodes
        levels = 0
        total_iters = 0
        level_conv = True
        moves = 0
        adj_stream = "adj0"
        for _ in range(max_levels):
            # local finish (module constant doc): once the current level's
            # graph fits under the gate, the remaining levels are pure
            # per-job scheduling floor distributed — run them bit-identically
            # on the driver instead. Level 0 of a 100 TB graph never takes
            # this path; coarsened levels usually do.
            adj_rows = scratch._rows.get(adj_stream)
            if (not refine and 0 < lf_max
                    and adj_rows is not None
                    and adj_rows <= lf_max):
                sup_rows = (scratch._rows.get("sup") if levels > 0
                            else sup.count())
                if (sup_rows is not None
                        and sup_rows <= lf_max):
                    import numpy as np
                    import pandas as pd
                    pa = adj.select("src", "dst", "w").toPandas()
                    ids = np.sort(sup.select("node_id").toPandas()
                                  ["node_id"].to_numpy(dtype=np.int64))
                    labels, lf_levels, lf_iters, lf_conv = _local_solve(
                        pa["src"].to_numpy(), pa["dst"].to_numpy(),
                        pa["w"].to_numpy(), ids, m,
                        max_levels - levels, max_iterations, n_classes,
                        gamma)
                    lab_pdf = pd.DataFrame(
                        {"super": ids, "community": labels.astype("int64")})
                    if levels == 0:
                        # mapping is still the identity: emit directly
                        final = spark.createDataFrame(
                            lab_pdf.rename(columns={"super": "node_id"}))
                        q = _modularity_local(
                            pa["src"].to_numpy(), pa["dst"].to_numpy(),
                            pa["w"].to_numpy(), labels, ids, m, gamma)
                    else:
                        final = mapping.join(
                            F.broadcast(spark.createDataFrame(lab_pdf)),
                            "super").select("node_id", "community")
                        q = _modularity_value(
                            adj0,
                            final.select("node_id",
                                         F.col("community").alias("comm")),
                            m, gamma)
                    final = final.localCheckpoint(eager=True)
                    return CommunityResult(final, q, levels + lf_levels,
                                           total_iters + lf_iters, lf_conv)
            k = scratch.truncate(_degrees(adj, sup), "k")
            comm, moves, iters, level_conv = _local_move(
                adj, sup, k, m, max_iterations, n_classes, scratch, gamma)
            total_iters += iters
            if refine:
                # aggregate on the refined (connectivity-split) partition:
                # every community the next level sees is connected — the
                # invariant Leiden's refinement exists to restore (full
                # Leiden additionally seeds the next level's move start from
                # the unrefined partition; local moving re-merges the splits
                # when modularity favors it)
                if theta and theta > 0.0:
                    # θ-randomized refinement from singletons: fragments are
                    # connected by construction (every merge follows an edge)
                    comm = _theta_refine(adj, comm, k, m, gamma, theta,
                                         seed, scratch)
                else:
                    comm = _refine_connectivity(adj, comm, scratch)
            comm = scratch.truncate(_relabel_min_member(comm), "rl")
            mapping = scratch.truncate(mapping.join(
                comm.withColumnRenamed("node_id", "super"), "super"
            ).select("node_id", F.col("comm").alias("super")), "map")
            levels += 1
            if moves == 0:
                break
            adj = scratch.truncate(_coarsen(adj, comm), "cadj")
            adj_stream = "cadj"
            sup = scratch.truncate(
                comm.select(F.col("comm").alias("node_id")).distinct(), "sup")
        final = mapping.select("node_id", F.col("super").alias("community"))
        q = _modularity_value(
            adj0, final.select("node_id", F.col("community").alias("comm")),
            m, gamma)
        final = final.localCheckpoint(eager=True)
        # converged = the last level's local moving reached a fixpoint
        # (either it broke the level loop with moves == 0, or its final
        # block moved nothing at the iteration cap); a run that exhausted
        # max_levels while still moving is honestly reported unconverged
        converged = (moves == 0) or level_conv
        return CommunityResult(final, q, levels, total_iters, converged)
    finally:
        scratch.cleanup()


def louvain(
    graph: Graph,
    max_levels: int = 10,
    max_iterations: int = 10,
    n_classes: int = 2,
    weighted: bool = True,
    local_finish_max_rows: int | None = None,
) -> CommunityResult:
    """``gds.louvain`` analog (Louvain.java:49). Deterministic schedule —
    see module docstring; community ids = min original member node id."""
    return _multilevel(graph, max_levels, max_iterations, n_classes, weighted,
                       refine=False,
                       local_finish_max_rows=local_finish_max_rows)


def leiden(
    graph: Graph,
    max_levels: int = 10,
    max_iterations: int = 10,
    n_classes: int = 2,
    weighted: bool = True,
    gamma: float = 1.0,
    theta: float = 0.01,
    seed: int = 42,
) -> CommunityResult:
    """``gds.leiden`` analog (Leiden.java:42): local moving at resolution
    ``gamma`` (LeidenBaseConfig.java:38, scaled into the gain the same way
    the reference folds its modularityScaleCoefficient into γ), then
    refinement between local moving and aggregation:

    1. connectivity split — every community is split into the connected
       components of its induced subgraph (the invariant Leiden exists to
       restore: no disconnected communities);
    2. θ-randomized merge (LeidenBaseConfig.java:43, default 0.01) — each
       split fragment may merge back into an adjacent fragment of the SAME
       original community when the γ-modularity gain is positive, the
       target drawn ∝ exp(gain/θ) via the Gumbel-max trick over the
       hash-u01 stream: deterministic given ``seed`` (the reference takes
       randomSeed too), reproducing the reference's randomized-refinement
       DISTRIBUTION shape without run-to-run nondeterminism. θ=0 disables
       the randomized pass (pure connectivity refinement).

    Merges only apply on positive gain, so refinement never degrades the
    γ-modularity of the split partition it starts from."""
    return _multilevel(graph, max_levels, max_iterations, n_classes, weighted,
                       refine=True, gamma=gamma, theta=theta, seed=seed)
