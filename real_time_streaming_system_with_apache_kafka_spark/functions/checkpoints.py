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


# Plan tests flip this to True (monkeypatch) to inspect the REAL
# computation plan: a checkpointed result explains itself as a bare
# `Scan ExistingRDD`, hiding the joins/windows the test pins.
PLAN_INSPECTION_MODE = False


def checkpoint_result(result: DataFrame, *released: DataFrame) -> DataFrame:
    """Eagerly checkpoint a SMALL result frame, then release the
    checkpoint blocks of the intermediates it was derived from.

    Order matters: the result must materialize BEFORE the inputs
    release (lineage is truncated — released blocks are gone, not
    recomputable). Returns the checkpointed result.
    """
    if PLAN_INSPECTION_MODE:
        return result
    res = result.localCheckpoint(eager=True)
    for df in released:
        release_checkpoint(df)
    return res


def checkpoint_intermediate(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint a reused intermediate — except in
    PLAN_INSPECTION_MODE, where the frame passes through so plan tests
    can pin the computation ABOVE it (a checkpoint explains itself as
    a bare `Scan ExistingRDD`). Pair with ``checkpoint_result(result,
    intermediate)`` so the blocks release at operator exit."""
    if PLAN_INSPECTION_MODE:
        return df
    return df.localCheckpoint(eager=True)


# --- protected checkpoints -------------------------------------------------
# Some checkpointed frames are deliberately session-lived MODELS, not
# per-call intermediates: the memoized dup-graph edge set and CC labels
# (operators/dedup.py) are corpus statistics shared by six operators —
# production would materialize them as tables; in-session they live as
# protected checkpoints. ``session.sweep_persisted`` must not free them
# (a swept memo frame would be a stale handle — localCheckpoint lineage
# is truncated, so the next reuse FAILS rather than recomputes).

_PROTECTED_RDD_IDS: set[int] = set()


def _ckpt_rdd(df: DataFrame):
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() != "LogicalRDD":
        raise ValueError("protect_checkpoint: frame is not a localCheckpoint")
    return plan.rdd()


def protect_checkpoint(df: DataFrame) -> DataFrame:
    """Mark a checkpointed frame's blocks as sweep-exempt."""
    _PROTECTED_RDD_IDS.add(_ckpt_rdd(df).id())
    return df


def unprotect_and_release(df: DataFrame) -> None:
    """Evict a protected frame: drop the exemption, free the blocks."""
    rdd = _ckpt_rdd(df)
    _PROTECTED_RDD_IDS.discard(rdd.id())
    rdd.unpersist(False)


def protected_rdd_ids() -> set[int]:
    return set(_PROTECTED_RDD_IDS)
