"""Codegen-friendly word n-gram generation.

Higher-order ``F.transform`` + ``try_element_at`` array lambdas are
INTERPRETED per element in Spark 4 — a measured 3-5x slowdown on
n-gram-heavy scans at sf0.1+ (see NOTES_r3). A single regex pass with
a zero-width lookbehind/lookahead capture produces the identical gram
list inside whole-stage codegen: at each position preceded by start or
a space, capture the next ``n`` space-separated words (overlapping
windows, exactly ``len(words) - n + 1`` grams).

Clamp semantics shared with every shingle oracle: documents shorter
than ``n`` words contribute their whole text as one gram. Assumes
single-space word separation (the corpus contract the oracles encode).

NOT used inside `_lsh_pairs`' generator: there the interaction with
InferFiltersFromGenerate re-evaluates the regex below the repartition
(measured 2.8x slower) — the lambda-in-generator form stays optimal
for that one consumer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def regex_word_ngrams(text: Column, n: int) -> Column:
    """Array of overlapping word ``n``-grams of a single-space-joined
    text column, whole-text clamp below ``n`` words. NULL text yields
    ``['']`` — the same degenerate gram the interpreted spec twin
    produces (split(NULL) -> size NULL -> clamp keeps one gram whose
    concat_ws skips every null element)."""
    pattern = "(?<=^| )(?=(" + " ".join(["[^ ]+"] * n) + "))"
    safe = F.coalesce(text, F.lit(""))
    n_words = F.size(F.split(safe, " "))
    return F.when(
        n_words >= n, F.regexp_extract_all(safe, F.lit(pattern), 1)
    ).otherwise(F.array(safe))
