"""Salted-block construction for blocked-GEMM vector kernels.

The single definition of the probe/candidate layout that
``dedup._cosine_pairs`` (threshold pairs) and
``similarity.sim_knn_join`` (argmax) both feed to their
``applyInPandas`` kernels: side A (probes) carries a deterministic
per-row salt, side B (candidates) is replicated across ALL salts, so
each (label, salt) group holds one salt's probes against the complete
label block — one Arrow batch, one BLAS matmul, and every probe meets
every candidate in exactly one group. Shuffle volume is
O(corpus x n_salts) narrow rows, never O(corpus^2).

Kept separate from the kernels themselves: the kernels must remain
self-contained closures (unpickled by value on workers), while this is
driver-side plan construction that MUST stay in lockstep across its
consumers — a salting change that reached only one of them would break
the exactly-one-group invariant silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_block_union(emb: DataFrame, n_salts: int) -> DataFrame:
    """(label, vec_id, embedding, salt, is_probe) union of the salted
    probe side and the per-salt-replicated candidate side."""
    a = emb.select(
        "label",
        "vec_id",
        "embedding",
        F.pmod(F.xxhash64("vec_id"), F.lit(n_salts)).alias("salt"),
        F.lit(True).alias("is_probe"),
    )
    b = emb.select(
        "label",
        "vec_id",
        "embedding",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))
        ).alias("salt"),
        F.lit(False).alias("is_probe"),
    )
    return a.unionByName(b)
