"""Streaming token-budget admission gate via ``applyInPandasWithState``
— the arrival-order twin of ``operators/datamix.py::sample_token_budget``.

State = tokens admitted so far per language, carried across
micro-batches by the state store. Each batch admits its documents in
(doc_id) order while the language's running total is below the budget
(the crossing document is admitted — budgets are floors, same rule as
the batch operator). Batch mode ranks by md5 for a uniform sample;
the streaming gate is necessarily greedy in arrival order — that IS
the semantics of admitting a live feed against a quota.

Scale notes: state is one (long) per language key — bounded domain,
trivially small; rows ride Arrow batches; the kernel is a
self-contained closure (pickled by value, no package import on the
workers)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("tokens_before", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("tokens_admitted", T.LongType())])


def make_budget_gate(budget: int):
    """Per-language admission kernel: emit admitted docs only, update
    the running-token state."""

    def gate(key, pdf_iter, state):
        import pandas as _pd

        (admitted,) = state.get if state.exists else (0,)
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("doc_id")
            for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tokens"]):
                if admitted < budget:
                    out.append((int(doc_id), key[0], int(n_tok), int(admitted)))
                    admitted += int(n_tok)
        state.update((int(admitted),))
        if out:
            yield _pd.DataFrame(
                out, columns=["doc_id", "lang", "n_tokens", "tokens_before"]
            )

    return gate


def token_budget_gate(docs: DataFrame, budget: int = 2_500) -> DataFrame:
    """Gate a streaming (doc_id, lang, n_tokens) frame on a
    per-language token budget. ``docs`` must already carry n_tokens
    (computed scan-side, e.g. ``F.size(F.split("text", " "))``)."""
    return docs.groupBy("lang").applyInPandasWithState(
        make_budget_gate(budget),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
