"""Superstep driver: the engine's Pregel analog.

Reference analog: pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:172-210
(iterate: init messenger → run partitioned compute → masterCompute →
converged?). There, a superstep is a fork/join over shared arrays; here, a
superstep is one Spark job over a vertex-state DataFrame, and the barrier is
the action that materializes the new state.

Spark-specific disciplines the reference doesn't need (SURVEY §4):

1. **Lineage control.** An iterative DataFrame loop grows the logical plan
   every step, and Catalyst re-analysis cost explodes super-linearly in plan
   depth (measured locally: a 3-join superstep chained 6 deep takes 32s to
   *plan*). Persisting alone does NOT truncate the logical plan. Worse,
   ``localCheckpoint`` (round 1's truncation) is not a clean cut either on
   this Spark version: chained localCheckpoints accumulate hidden planning
   state round over round (measured: identical flat 93-char analyzed plans
   whose optimization time grows 0.4 → 1.0 → 5.7 → 21 s across four
   supersteps of a 4-join step; a parquet round-trip of the same loop is
   flat at ~0.5 s/step, 10× total). So the driver now ALWAYS truncates via
   a parquet snapshot: into ``checkpoint_dir`` when configured (resumable),
   else into a session temp dir keeping only the last two supersteps
   (alternating slots). On a cluster, point ``checkpoint_dir`` at shared
   storage; the write is O(state), the same bound any reliable checkpoint
   pays.

2. **Checkpoint / resume** (north-rule requirement; the reference has no
   mid-run checkpointing — nearest analog is its progress/task system,
   progress-tracking/.../TaskProgressTracker.java). With ``checkpoint_dir``
   set, every ``snapshot_interval`` supersteps the vertex state is written to
   ``{dir}/state/superstep=NNNNN/`` (atomic via Spark's _SUCCESS marker) and a
   metrics record — superstep, wall_ms, active count, rows, partition count,
   per-partition row counts (the lineage record), plus algorithm-supplied
   aggregates like delta_max — is appended to ``{dir}/metrics.jsonl``.
   :func:`Pregel.resume_state` finds the latest complete snapshot so a killed
   run restarts mid-iteration with identical results.

3. **Convergence = vote-to-halt.** Algorithms mark per-vertex activity in an
   ``_active`` column (int); the driver folds ``sum(_active)`` into the same
   action that materializes the state (no extra job) and stops at 0 — the
   analog of HugeAtomicBitSet vote bits + "no messages sent"
   (pregel/.../PartitionedComputer.java:87-92).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

ACTIVE_COL = "_active"


@dataclass
class PregelResult:
    state: DataFrame
    ran_iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


class Pregel:
    def __init__(
        self,
        spark: SparkSession,
        max_iterations: int = 20,
        checkpoint_dir: str | None = None,
        snapshot_interval: int = 1,
        extra_metrics: dict[str, Column] | None = None,
        track_partition_rows: bool | None = None,
        manifest: dict | None = None,
    ):
        self.spark = spark
        self.max_iterations = max_iterations
        self.checkpoint_dir = checkpoint_dir
        self.snapshot_interval = max(1, snapshot_interval)
        self.extra_metrics = extra_metrics or {}
        #: run identity (algorithm name + config) written into checkpoint_dir;
        #: resume validates it so a dir from a different algorithm/config is
        #: rejected instead of silently resuming incompatible state
        self.manifest = manifest or {}
        self._tmp_dir: str | None = None
        # per-partition lineage rows cost one extra tiny job per snapshot;
        # default on only when checkpointing is on
        self.track_partition_rows = (
            checkpoint_dir is not None if track_partition_rows is None else track_partition_rows
        )

    def _scratch_truncate(self, df: DataFrame, superstep: int) -> DataFrame:
        """Plan truncation via parquet round-trip into a temp scratch dir,
        alternating two slots so only the last two supersteps occupy disk.
        See module doc #1 for why this replaces localCheckpoint."""
        import tempfile
        if self._tmp_dir is None:
            self._tmp_dir = tempfile.mkdtemp(prefix="gds_pregel_")
        path = os.path.join(self._tmp_dir, f"slot{superstep % 2}")
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def _cleanup_scratch(self) -> None:
        if self._tmp_dir is not None:
            import shutil
            shutil.rmtree(self._tmp_dir, ignore_errors=True)
            self._tmp_dir = None

    # -- checkpoint layout ---------------------------------------------------
    def _state_path(self, superstep: int) -> str:
        return os.path.join(self.checkpoint_dir, "state", f"superstep={superstep:05d}")

    def _metrics_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "metrics.jsonl")

    def _manifest_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "manifest.json")

    def _write_manifest(self) -> None:
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        with open(self._manifest_path(), "w") as fh:
            json.dump(self.manifest, fh, sort_keys=True, default=str)

    def _validate_manifest(self) -> None:
        """Raise when resuming a checkpoint_dir written by a different
        (algorithm, config) — stale incompatible state must not resume."""
        path = self._manifest_path()
        if not os.path.exists(path):
            return  # pre-manifest dir: accept (legacy layout)
        with open(path) as fh:
            found = json.load(fh)
        want = json.loads(json.dumps(self.manifest, sort_keys=True, default=str))
        if found != want:
            raise ValueError(
                f"checkpoint_dir {self.checkpoint_dir!r} belongs to a different run: "
                f"manifest on disk {found!r} != this run {want!r}")

    def _prune_above(self, superstep: int) -> None:
        """Drop snapshots above the resume point so an earlier longer run's
        higher-numbered snapshots can't be picked up later."""
        import shutil
        root = os.path.join(self.checkpoint_dir, "state")
        if not os.path.isdir(root):
            return
        for d in os.listdir(root):
            if d.startswith("superstep=") and int(d.split("=")[1]) > superstep:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    def _reset_dir(self) -> None:
        """Fresh (non-resume) run into an existing dir: clear prior state and
        metrics so snapshots/metrics of different runs never interleave."""
        import shutil
        shutil.rmtree(os.path.join(self.checkpoint_dir, "state"), ignore_errors=True)
        for f in (self._metrics_path(),):
            if os.path.exists(f):
                os.remove(f)

    def latest_snapshot(self) -> int | None:
        """Highest superstep with a complete (_SUCCESS-marked) snapshot."""
        if not self.checkpoint_dir:
            return None
        root = os.path.join(self.checkpoint_dir, "state")
        if not os.path.isdir(root):
            return None
        done = []
        for d in os.listdir(root):
            if d.startswith("superstep=") and os.path.exists(os.path.join(root, d, "_SUCCESS")):
                done.append(int(d.split("=")[1]))
        return max(done) if done else None

    def resume_state(self) -> tuple[DataFrame, int] | None:
        """(state, next_superstep) from the latest complete snapshot, if any."""
        last = self.latest_snapshot()
        if last is None:
            return None
        return self.spark.read.parquet(self._state_path(last)), last + 1

    # -- the loop -------------------------------------------------------------
    def run(
        self,
        initial_state: DataFrame,
        step_fn: Callable[[DataFrame, int], DataFrame],
        resume: bool = False,
    ) -> PregelResult:
        """Iterate ``state = step_fn(state, superstep)`` to convergence.

        ``initial_state`` and every ``step_fn`` output must carry an
        ``_active`` int column; convergence is ``sum(_active) == 0``.
        """
        metrics: list[dict] = []
        start_step = 0
        state = initial_state
        if self.checkpoint_dir:
            if resume:
                self._validate_manifest()
            else:
                self._reset_dir()
            self._write_manifest()
        if resume:
            resumed = self.resume_state()
            if resumed is not None:
                state, start_step = resumed
                self._prune_above(start_step - 1)
        # truncate the incoming plan too — step 0 should start from a flat scan
        state = self._scratch_truncate(state, -1)
        active = state.agg(F.sum(F.col(ACTIVE_COL).cast("long"))).first()[0] or 0
        converged = active == 0

        from pyspark.sql import Observation

        superstep = start_step
        while not converged and superstep < self.max_iterations:
            t0 = time.monotonic()
            new_state = step_fn(state, superstep)
            # fold the convergence/metrics aggregation INTO the snapshot
            # write job (Observation API): one Spark job per superstep where
            # round 1 ran two (write + separate agg)
            obs = Observation(f"superstep_{superstep}")
            aggs = [
                F.sum(F.col(ACTIVE_COL).cast("long")).alias("active"),
                F.count(F.lit(1)).alias("rows"),
            ] + [expr.alias(name) for name, expr in self.extra_metrics.items()]
            new_state = new_state.observe(obs, *aggs)
            do_snapshot = self.checkpoint_dir and (superstep + 1) % self.snapshot_interval == 0
            if do_snapshot:
                # reliable, resumable plan truncation: parquet round-trip
                new_state.write.mode("overwrite").parquet(self._state_path(superstep))
                new_state = self.spark.read.parquet(self._state_path(superstep))
            else:
                # plan-truncating materialization (module doc #1: parquet
                # round-trip, NOT localCheckpoint — chained localCheckpoints
                # accumulate planning cost on this Spark version)
                new_state = self._scratch_truncate(new_state, superstep)
            row = dict(obs.get)
            wall_ms = (time.monotonic() - t0) * 1000.0
            active = row.pop("active") or 0
            rec = {
                "superstep": superstep,
                "wall_ms": round(wall_ms, 3),
                "active": int(active),
                "rows": int(row.pop("rows")),
                **{k: (float(v) if v is not None else None) for k, v in row.items()},
            }
            if self.checkpoint_dir:
                # .rdd conversion is not free — only pay for it when the
                # metrics are actually recorded as the lineage record
                rec["num_partitions"] = new_state.rdd.getNumPartitions()
            if do_snapshot and self.track_partition_rows:
                parts = (
                    new_state.groupBy(F.spark_partition_id().alias("pid"))
                    .count().orderBy("pid").collect()
                )
                rec["partition_rows"] = {int(r["pid"]): int(r["count"]) for r in parts}
            state = new_state
            converged = active == 0
            if self.checkpoint_dir:
                os.makedirs(self.checkpoint_dir, exist_ok=True)
                with open(self._metrics_path(), "a") as fh:
                    fh.write(json.dumps(rec) + "\n")
            metrics.append(rec)
            superstep += 1

        if self._tmp_dir is not None:
            # detach the returned state from the scratch dir (one terminal
            # localCheckpoint is fine — the pathology is CHAINED ones), then
            # reclaim the per-superstep snapshots
            state = state.localCheckpoint(eager=True)
            self._cleanup_scratch()
        return PregelResult(
            state=state,
            ran_iterations=superstep - start_step,
            converged=converged,
            metrics=metrics,
        )
