"""Deterministic release of executor storage held by eager/lazy
``localCheckpoint`` frames (VERDICT r7 #6).

``DataFrame.unpersist()`` only clears the plan cache — a checkpointed
frame's storage lives on the underlying ``RDD[InternalRow]`` inside its
LogicalRDD node, which Spark frees only when the ContextCleaner happens
to GC the dropped frame.  Fine for one-shot jobs; a long-lived session
running many curation stages accumulates checkpoints until GC runs.
:class:`CheckpointHandle` reaches that RDD (probed on this Spark,
pinned by tests) and unpersists it on demand; operators append handles
to the caller's ``cache_handles`` list so checkpoints release through
the same protocol as curate()'s ``DataFrame.persist`` intermediates.

Release ONLY after the dependent result has been materialized: a
checkpoint truncates lineage, so a job that still needs the frame after
release fails LOUDLY with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (never
silently recomputes — silent recompute is the partition drift the
checkpoints exist to prevent).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)
_warned_internals_drift = False


class CheckpointHandle:
    """``.unpersist()`` surface over a localCheckpoint'ed DataFrame —
    matches the method the cached DataFrames in ``cache_handles`` carry,
    so callers release both kinds uniformly.  Idempotent; safe to drop
    unreleased (the ContextCleaner fallback still applies)."""

    def __init__(self, df: DataFrame):
        # hold the JVM DataFrame (not the Python wrapper) so the
        # ContextCleaner can't race us: the RDD stays reachable until
        # this handle is dropped or released
        self._jdf = df._jdf

    def unpersist(self) -> None:
        try:
            # the localCheckpoint's LogicalRDD holds the persisted
            # RDD[InternalRow]; if these internals move in a future
            # Spark, fall back to ContextCleaner GC (the pre-handle
            # behavior) rather than failing the caller
            self._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:  # pragma: no cover - internals drift fallback
            # warn ONCE per process (ADVICE r8 #5): a systematic no-op
            # release means the deterministic-release guarantee has
            # silently reverted to ContextCleaner GC timing — keep the
            # non-failing contract but make the regression observable
            global _warned_internals_drift
            if not _warned_internals_drift:
                _warned_internals_drift = True
                _LOG.warning(
                    "CheckpointHandle.unpersist: Spark internals no "
                    "longer expose the checkpoint RDD — releases are "
                    "falling back to ContextCleaner GC timing "
                    "(deterministic storage release disabled)",
                    exc_info=True,
                )


def release_local_checkpoint(df: DataFrame) -> None:
    """Immediately free a checkpoint that nothing will read again —
    the in-loop form (e.g. connected_components dropping iteration
    N-1's labels once iteration N's frame is materialized)."""
    CheckpointHandle(df).unpersist()
