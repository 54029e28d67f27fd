"""Run observability: the reference's per-row WS/SSE progress machinery
(SURVEY.md section 2.9 T1-T3) mapped to driver-side sampling + metrics
rows.

The reference pushes a ``ProgressUpdate{CurrentRow,TotalRows,Status}`` per
row over a websocket with a 1000-message buffer (``websocket.go:24-43``,
``file.go:45-53``).  Per-row events cannot scale; the equivalent here is a
background sampler over ``SparkStatusTracker`` emitting periodic progress
snapshots, plus the T2 session state machine
(``starting -> processing -> completed | error``) wrapping the run.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ProgressSnapshot:
    ts: float
    active_stages: int
    active_tasks: int
    completed_tasks: int
    failed_tasks: int


@dataclass
class RunState:
    """T2 state machine -- websocket.go:54-65."""

    run_id: str
    status: str = "starting"  # starting -> processing -> completed | error
    error: str | None = None
    sampler_error: str | None = None  # sampler-thread failure, recorded
    # instead of dying silently (the run itself may still complete)
    snapshots: list[ProgressSnapshot] = field(default_factory=list)
    # T3: bounded buffer with drop counter (websocket.go:123-127).
    # Drop-NEWEST is the reference's semantics (pinned by test); for a
    # multi-hour run wanting end-of-run state, raise max_snapshots or
    # widen interval_s -- the counter tells you when you must.
    max_snapshots: int = 1000
    dropped: int = 0

    def record(self, snap: ProgressSnapshot) -> None:
        if len(self.snapshots) >= self.max_snapshots:
            self.dropped += 1
            return
        self.snapshots.append(snap)


class ProgressReporter:
    """Context manager: samples the status tracker while the wrapped job
    runs.  Usage::

        with ProgressReporter(spark, "run1") as rep:
            df.write.parquet(...)
        rep.state.status       # "completed"
        rep.to_dataframe()     # snapshots as run_metrics rows
    """

    def __init__(self, spark: SparkSession, run_id: str,
                 interval_s: float = 0.25):
        self.spark = spark
        self.state = RunState(run_id)
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _sample(self) -> None:
        tracker = self.spark.sparkContext.statusTracker()
        while not self._stop.is_set():
            try:
                stage_ids = tracker.getActiveStageIds()
                active = completed = failed = 0
                for sid in stage_ids:
                    info = tracker.getStageInfo(sid)
                    if info is not None:
                        active += info.numActiveTasks
                        completed += info.numCompletedTasks
                        failed += info.numFailedTasks
                self.state.record(
                    ProgressSnapshot(
                        ts=time.time(),
                        active_stages=len(stage_ids),
                        active_tasks=active,
                        completed_tasks=completed,
                        failed_tasks=failed,
                    )
                )
            except Exception as exc:  # py4j hiccup / stopped context: a
                # dead daemon thread would otherwise be indistinguishable
                # from a healthy short run
                self.state.sampler_error = repr(exc)
                return
            self._stop.wait(self.interval_s)

    def __enter__(self) -> "ProgressReporter":
        self.state.status = "processing"
        self._thread = threading.Thread(target=self._sample, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if exc_type is None:
            self.state.status = "completed"
        else:
            self.state.status = "error"
            self.state.error = str(exc)
        return False

    def to_dataframe(self) -> DataFrame:
        rows = [
            (self.state.run_id, s.ts, s.active_stages, s.active_tasks,
             s.completed_tasks, s.failed_tasks)
            for s in self.state.snapshots
        ]
        # no fabricated placeholder row: a run shorter than interval_s
        # yields an EMPTY frame (schema explicit), not a fake epoch-1970
        # sample downstream duration math would trip over
        return self.spark.createDataFrame(
            rows,
            "run_id string, ts double, active_stages int, active_tasks int,"
            " completed_tasks int, failed_tasks int",
        )
