"""Live progress surface — ``gds.beta.listProgress`` analog.

Reference: progress-tracking/src/main/java/org/neo4j/gds/core/utils/
progress/TaskProgressTracker.java (per-task begin/logProgress/end over a
session TaskStore) + proc/.../ListProgressProc — "list running jobs with
% complete". Re-expressed for this engine:

- The registry is DRIVER-resident and in-memory, like the reference's
  in-JVM TaskStore — the driver is the only place superstep boundaries
  are known, and a task record is O(1) metadata, never data.
- ``Pregel.run`` reports automatically (task name from the manifest's
  ``algorithm``, progress = supersteps/max_iterations, volume = the live
  active-vertex count riding the existing Observation — zero extra
  jobs). Any operator can report through :func:`track`.
- ``list_progress()`` returns the reference proc's row shape: jobId,
  taskName, progress, progressBar, status, timeStarted, elapsedTime.
  ``list_progress_df(spark)`` wraps it as a DataFrame for API parity.

Thread-safe (operators may run from multiple driver threads); finished
tasks are retained up to ``_RETAIN`` so ``listProgress`` shows recent
completions the way the reference's store does, without growing
unboundedly in a long session.
"""

from __future__ import annotations

import itertools
import threading
import time
from dataclasses import dataclass, field

_LOCK = threading.Lock()
_SEQ = itertools.count(1)
_TASKS: dict[str, "TaskRecord"] = {}
_RETAIN = 200  # finished records kept for listing (oldest evicted first)


@dataclass
class TaskRecord:
    job_id: str
    task_name: str
    status: str = "RUNNING"          # RUNNING | FINISHED | FAILED
    progress: float = 0.0            # [0, 1]; -1 = unknown volume
    volume_done: int = 0
    volume_total: int | None = None
    started_at: float = field(default_factory=time.time)
    finished_at: float | None = None

    def as_row(self) -> dict:
        elapsed = (self.finished_at or time.time()) - self.started_at
        pct = max(0.0, min(1.0, self.progress))
        filled = int(round(pct * 10))
        bar = "[" + "#" * filled + "-" * (10 - filled) + "]"
        if self.progress < 0:
            bar, pct_str = "[~~~~~~~~~~]", "n/a"
        else:
            pct_str = f"{pct * 100:.1f}%"
        return {
            "job_id": self.job_id,
            "task_name": self.task_name,
            "status": self.status,
            "progress": pct_str,
            "progress_bar": bar,
            "volume_done": int(self.volume_done),
            "volume_total": (int(self.volume_total)
                             if self.volume_total is not None else None),
            "time_started": self.started_at,
            "elapsed_seconds": round(elapsed, 3),
        }


def begin(task_name: str, volume_total: int | None = None) -> str:
    """Register a running task → job_id (TaskProgressTracker.beginSubTask
    analog at task granularity)."""
    rec = TaskRecord(job_id=f"job-{next(_SEQ):06d}", task_name=task_name,
                     volume_total=volume_total,
                     progress=0.0 if volume_total else -1.0)
    with _LOCK:
        _TASKS[rec.job_id] = rec
        _evict_locked()
    return rec.job_id


def update(job_id: str, done: int, total: int | None = None) -> None:
    """Report absolute progress (logProgress analog — idempotent, safe to
    call with whatever the loop's Observation already measured)."""
    with _LOCK:
        rec = _TASKS.get(job_id)
        if rec is None or rec.status != "RUNNING":
            return
        rec.volume_done = int(done)
        if total is not None:
            rec.volume_total = int(total)
        if rec.volume_total:
            rec.progress = min(1.0, rec.volume_done / rec.volume_total)


def finish(job_id: str, failed: bool = False) -> None:
    """Mark a task terminal (endSubTask analog)."""
    with _LOCK:
        rec = _TASKS.get(job_id)
        if rec is None:
            return
        rec.status = "FAILED" if failed else "FINISHED"
        if not failed and rec.progress >= 0:
            rec.progress = 1.0
        rec.finished_at = time.time()


class track:
    """Context manager: ``with track("pagerank", total=20) as t:
    t.update(step)`` — finishes (or fails) the task on exit."""

    def __init__(self, task_name: str, total: int | None = None):
        self.job_id = begin(task_name, total)

    def update(self, done: int, total: int | None = None) -> None:
        update(self.job_id, done, total)

    def __enter__(self) -> "track":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        finish(self.job_id, failed=exc_type is not None)


def list_progress(include_finished: bool = True) -> list[dict]:
    """``gds.beta.listProgress`` rows, running tasks first, newest
    first within each status."""
    with _LOCK:
        recs = list(_TASKS.values())
    if not include_finished:
        recs = [r for r in recs if r.status == "RUNNING"]
    recs.sort(key=lambda r: (r.status != "RUNNING", -r.started_at))
    return [r.as_row() for r in recs]


def list_progress_df(spark, include_finished: bool = True):
    """DataFrame form of :func:`list_progress` (proc-surface parity)."""
    rows = list_progress(include_finished)
    schema = ("job_id string, task_name string, status string, "
              "progress string, progress_bar string, volume_done long, "
              "volume_total long, time_started double, "
              "elapsed_seconds double")
    return spark.createDataFrame(rows, schema) if rows else \
        spark.createDataFrame([], schema)


def clear() -> None:
    """Drop all records (test isolation)."""
    with _LOCK:
        _TASKS.clear()


def _evict_locked() -> None:
    finished = [r for r in _TASKS.values() if r.status != "RUNNING"]
    overflow = len(finished) - _RETAIN
    if overflow > 0:
        finished.sort(key=lambda r: r.finished_at or 0)
        for r in finished[:overflow]:
            _TASKS.pop(r.job_id, None)
