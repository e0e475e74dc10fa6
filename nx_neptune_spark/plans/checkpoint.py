"""Per-iteration checkpointing with lineage manifests + resume.

North-rule requirement: "Every iteration checkpoints vertex-state
DataFrames with per-partition lineage and convergence/shuffle metrics
so runs resume mid-iteration" (BASELINE.json north_star). This is the
Spark-native analog of the reference's graph snapshots
(/root/reference/nx_neptune/instance_management.py:460-517
create_graph_snapshot / :201-264 restore).

Two modes:
  * ``local`` (default for in-session lineage truncation):
    ``DataFrame.localCheckpoint(eager=True)`` -- truncates the logical
    plan each iteration so iterative self-joins don't blow up the
    optimizer (SURVEY.md §7.2), no durability.
  * ``durable`` (checkpoint_dir set): vertex state written to
    ``<dir>/<run_id>/iter_<k>/state.parquet`` plus ``manifest.json``
    recording iteration number, convergence delta, row count, partition
    lineage (the parquet part files), shuffle metrics and algorithm
    params. ``latest_manifest()`` + ``resume()`` restart a run
    mid-iteration from the last durable state.

At 100 TB the durable write is one extra scan-free write of the vertex
state (~#vertices rows, far smaller than the edge table) per iteration;
manifests are tiny JSON on the same storage.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "manifest.json"


def strip_plan_stats(df: DataFrame) -> DataFrame:
    """Rewrap a DataFrame as a fresh LogicalRDD leaf WITHOUT the
    originating Dataset's propagated statistics.

    Spark preserves the origin's optimized-plan statistics through
    ``localCheckpoint`` (SPARK-39748). In an iterative loop whose round
    plan references the checkpointed state more than once, those
    ``sizeInBytes`` estimates MULTIPLY round over round (two references
    square them), so after k rounds the stat is a ~140·2^k-bit
    BigInteger and the driver pins a core in
    ``BigInteger.multiplyToomCook3`` during every plan analysis —
    measured on the k-core loop: round wall-clock 1s → 4s → 13s → 154s
    → driver heap OOM. Rewrapping the same (materialized or pending)
    RDD via ``internalCreateDataFrame`` resets the leaf to the session
    default size estimate, which keeps every later round's stats
    constant-size.

    Caveats: the new leaf loses output-partitioning metadata (consumers
    that relied on it will re-exchange — use only where the loop
    re-shuffles the state anyway) and its default size estimate
    disables static auto-broadcast for joins against it (AQE still
    converts at runtime from actual sizes).
    """
    spark = df.sparkSession
    jdf = spark._jsparkSession.internalCreateDataFrame(
        df._jdf.queryExecution().toRdd(), df._jdf.schema(), False
    )
    return DataFrame(jdf, spark)


def release_local_checkpoint(df: DataFrame) -> None:
    """Best-effort free of a localCheckpoint's cached RDD blocks.

    ``Dataset.unpersist()`` cannot release them (the blocks back a
    lineage-truncated RDD, not a CacheManager entry), so this reaches
    the checkpointed RDD through the analyzed LogicalRDD plan. A
    ``strip_plan_stats`` wrapper (or a trailing projection) may sit
    between the LogicalRDD and the persisted checkpoint RDD, so the
    first-parent dependency chain is walked until a persisted RDD was
    unpersisted (bounded depth). After a successful release the
    DataFrame is UNUSABLE (its lineage ends at the freed blocks) — call
    it only when no later job references the DataFrame or any lazy plan
    derived from it. Failures are swallowed: worst case the blocks stay
    cached until context shutdown, which is exactly the pre-release
    behavior.
    """
    try:
        rdd = df._jdf.queryExecution().analyzed().rdd()
        for _ in range(8):
            persisted = rdd.getStorageLevel().isValid()
            rdd.unpersist(False)
            if persisted:
                break
            deps = rdd.dependencies()
            if deps.size() == 0:
                break
            rdd = deps.apply(0).rdd()
    except Exception:
        pass


@dataclass
class IterationMetrics:
    """Convergence + shuffle metrics captured per iteration."""

    iteration: int
    delta: float | None = None
    rows: int | None = None
    changed: int | None = None
    wall_secs: float | None = None
    shuffle_partitions: int | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        d = {
            "iteration": self.iteration,
            "delta": self.delta,
            "rows": self.rows,
            "changed": self.changed,
            "wall_secs": self.wall_secs,
            "shuffle_partitions": self.shuffle_partitions,
        }
        d.update(self.extra)
        return d


class CheckpointManager:
    """Manages per-iteration state checkpoints for one algorithm run."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        run_id: str = "run",
        algorithm: str = "generic",
        params: dict[str, Any] | None = None,
        every: int = 1,
    ) -> None:
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.run_id = run_id
        self.algorithm = algorithm
        self.params = params or {}
        self.every = max(1, every)
        self._t0 = time.time()

    # -- paths ----------------------------------------------------------

    def run_dir(self) -> str:
        assert self.checkpoint_dir is not None
        return os.path.join(self.checkpoint_dir, self.run_id)

    def iter_dir(self, iteration: int) -> str:
        return os.path.join(self.run_dir(), f"iter_{iteration:05d}")

    # -- checkpoint -----------------------------------------------------

    def truncate(self, df: DataFrame) -> DataFrame:
        """Lineage truncation only (no durability)."""
        return df.localCheckpoint(eager=True)

    def checkpoint(
        self, df: DataFrame, metrics: IterationMetrics, lazy: bool = False
    ) -> DataFrame:
        """Checkpoint state for ``metrics.iteration``; return the df to
        keep iterating on (reads back the durable copy when durable so
        the logical plan roots at the parquet scan).

        ``lazy=True`` (honored only on the non-durable path) truncates
        lineage with ``localCheckpoint(eager=False)`` -- no driver
        action here; the caller's next action over the returned frame
        (e.g. a convergence fingerprint) materializes the cache, so one
        action per iteration serves both purposes."""
        metrics.shuffle_partitions = int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        metrics.wall_secs = time.time() - self._t0
        if self.checkpoint_dir is None or metrics.iteration % self.every != 0:
            return df.localCheckpoint(eager=False) if lazy else self.truncate(df)
        d = self.iter_dir(metrics.iteration)
        state_path = os.path.join(d, "state.parquet")
        df.write.mode("overwrite").parquet(state_path)
        out = self.spark.read.parquet(state_path)
        lineage = self._partition_lineage(state_path)
        manifest = {
            "algorithm": self.algorithm,
            "run_id": self.run_id,
            "params": self.params,
            "state_path": state_path,
            "schema": df.schema.json(),
            "partition_lineage": lineage,
            "metrics": metrics.to_dict(),
            "complete": False,
        }
        self._write_manifest(d, manifest)
        return out

    def update_metrics(self, metrics: IterationMetrics) -> None:
        """Rewrite the iteration manifest once post-checkpoint metrics
        (convergence delta, changed-count) are known."""
        if self.checkpoint_dir is None or metrics.iteration % self.every != 0:
            return
        d = self.iter_dir(metrics.iteration)
        mpath = os.path.join(d, MANIFEST_NAME)
        if not os.path.exists(mpath):
            return
        with open(mpath) as f:
            manifest = json.load(f)
        metrics.wall_secs = time.time() - self._t0
        manifest["metrics"] = metrics.to_dict()
        self._write_manifest(d, manifest)

    def finalize(
        self,
        iteration: int,
        metrics: IterationMetrics | None = None,
        state: DataFrame | None = None,
    ) -> None:
        """Mark the run converged in the final manifest.

        If the converged iteration was off the ``every`` stride (so no
        durable state exists for it), the final ``state`` DataFrame is
        durably written first — a complete manifest must always point
        at the state it claims is final. Without ``state`` in that
        case, nothing is written: the latest durable manifest stays
        incomplete and a resumed run correctly re-executes the last few
        iterations instead of being handed stale state as final."""
        if self.checkpoint_dir is None:
            return
        d = self.iter_dir(iteration)
        mpath = os.path.join(d, MANIFEST_NAME)
        existing = None
        if os.path.exists(mpath):
            with open(mpath) as f:
                existing = json.load(f)
            # heal a torn checkpoint: if the recorded lineage no longer
            # matches the files on disk (earlier run killed mid-write)
            # and we hold the final state, rewrite it instead of
            # stamping complete on state resume() will rightly skip
            if state is not None and (
                not existing.get("state_path") or not self._lineage_intact(existing)
            ):
                existing = None
        if existing is not None:
            manifest = existing
        elif state is not None:
            state_path = os.path.join(d, "state.parquet")
            state.write.mode("overwrite").parquet(state_path)
            manifest = {
                "algorithm": self.algorithm,
                "run_id": self.run_id,
                "params": self.params,
                "state_path": state_path,
                "schema": state.schema.json(),
                "partition_lineage": self._partition_lineage(state_path),
                "metrics": (metrics or IterationMetrics(iteration=iteration)).to_dict(),
            }
        else:
            return
        manifest["complete"] = True
        if metrics is not None:
            manifest["metrics"] = metrics.to_dict()
        self._write_manifest(d, manifest)

    # -- resume -----------------------------------------------------------

    def latest_manifest(self) -> dict[str, Any] | None:
        if self.checkpoint_dir is None or not os.path.isdir(
            os.path.join(self.checkpoint_dir, self.run_id)
        ):
            return None
        iters = sorted(
            d
            for d in os.listdir(self.run_dir())
            if d.startswith("iter_")
            and os.path.exists(os.path.join(self.run_dir(), d, MANIFEST_NAME))
        )
        # newest manifest that actually carries durable state (guards
        # against stub manifests from interrupted/legacy finalize calls)
        # AND whose recorded partition lineage matches the files on
        # disk — a checkpoint from a run killed mid-write (or a state
        # dir later corrupted) is skipped so resume falls back to the
        # previous intact iteration instead of loading torn state.
        for it_dir in reversed(iters):
            with open(os.path.join(self.run_dir(), it_dir, MANIFEST_NAME)) as f:
                m = json.load(f)
            if m.get("state_path") and "metrics" in m and self._lineage_intact(m):
                return m
        return None

    def _lineage_intact(self, manifest: dict[str, Any]) -> bool:
        """True iff every part file in the recorded partition lineage
        exists with the recorded byte size (and no extras appeared)."""
        lineage = manifest.get("partition_lineage")
        state_path = manifest["state_path"]
        if lineage is None:
            return os.path.isdir(state_path)  # legacy manifest: trust dir
        try:
            on_disk = {
                fn: os.path.getsize(os.path.join(state_path, fn))
                for fn in os.listdir(state_path)
                if fn.startswith("part-")
            }
        except OSError:
            return False
        return on_disk == {p["file"]: p["bytes"] for p in lineage}

    def resume(self) -> tuple[DataFrame, dict[str, Any]] | None:
        """(state_df, manifest) of the latest checkpoint, or None."""
        m = self.latest_manifest()
        if m is None:
            return None
        return self.spark.read.parquet(m["state_path"]), m

    # -- internals --------------------------------------------------------

    def _partition_lineage(self, state_path: str) -> list[dict[str, Any]]:
        parts = []
        for fn in sorted(os.listdir(state_path)):
            if fn.startswith("part-"):
                full = os.path.join(state_path, fn)
                parts.append({"file": fn, "bytes": os.path.getsize(full)})
        return parts

    def _write_manifest(self, d: str, manifest: dict[str, Any]) -> None:
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(d, MANIFEST_NAME))
