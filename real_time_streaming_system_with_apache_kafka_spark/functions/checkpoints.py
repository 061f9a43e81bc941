"""Checkpoint lifecycle helpers (r9, VERDICT r8 item 2).

Several operators eagerly ``localCheckpoint`` a twice-consumed
intermediate (a hash index, a shingle table, a centered matrix) so the
expensive subtree runs once. ``localCheckpoint`` truncates lineage, so
those blocks are unrecoverable once released — which historically meant
nobody released them, and a long session running many registry calls
accumulated pinned executor storage and GC pressure (measured r8:
curation_funnel 4.6 s in-session vs 0.88 s isolated on the same host;
the bench suite dropped 142.5 -> 135.1 s when swept).

The fix at the source: when the operator's RESULT is small (top-K,
per-pair audit rows, probe summaries), materialize the result into its
OWN one-block checkpoint and release the big intermediates before
returning — the caller gets a self-contained frame that references
nothing, and the session keeps only result-sized blocks. Iterative
operators (CC, PageRank, k-core, LPA) release round k's checkpoint as
soon as round k+1 materializes, keeping at most one round pinned.

For results too big to re-checkpoint (corpus-sized projections), the
operator keeps its final checkpoint pinned and the session-level
``session.sweep_persisted`` remains the hygiene valve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpointed frame's blocks FOR REAL.

    ``DataFrame.unpersist()`` routes through the cache manager, which
    only tracks ``.cache()/.persist()`` plans — for a localCheckpoint
    (a LogicalRDD over a checkpointed RDD) it is a silent no-op
    (measured r9: blocks survive `df.unpersist()`; they free only when
    the ContextCleaner happens to GC the JVM reference). The real
    handle is the LogicalRDD's underlying RDD. Must be called on the
    checkpointed frame itself, not a frame derived from it.
    """
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() == "LogicalRDD":
        plan.rdd().unpersist(False)
    else:  # cached (non-checkpoint) frame: the cache manager path
        df.unpersist()


def checkpoint_result(result: DataFrame, *released: DataFrame) -> DataFrame:
    """Eagerly checkpoint a SMALL result frame, then release the
    checkpoint blocks of the intermediates it was derived from.

    Order matters: the result must materialize BEFORE the inputs
    release (lineage is truncated — released blocks are gone, not
    recomputable). Returns the checkpointed result.
    """
    res = result.localCheckpoint(eager=True)
    for df in released:
        release_checkpoint(df)
    return res
