"""Mergeable frequency sketches.

Misra-Gries heavy hitters: each partition maintains at most `capacity`
counters over its token stream (batch variant: merge a batch's exact
Counter, then if over capacity subtract the (capacity+1)-th largest
value from every counter and drop the non-positive ones — recording the
subtracted mass as that partition's `drops`). Two invariants survive
summation across partitions, which is what makes the sketch mergeable
and the 100 TB shape work — a map-side pass producing `capacity` rows
per partition, then one tiny shuffle:

  * UNDERCOUNT:  sum_p est_p(t)  <=  true(t)          (never inflate)
  * BOUNDED ERR: true(t) - sum_p est_p(t) <= sum_p drops_p

so any term with true frequency above the summed drop mass is
guaranteed to surface. The exact per-term count is a full groupBy — the
expensive path the sketch replaces; queries join it back only for
self-validation at test scale.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: Sentinel term for the per-partition dropped-mass row (no real token
#: can collide: tokens are lowercased words, this is a control string).
DROPS_SENTINEL = "\x00__drops__"


def mg_partial_counters(tokens: DataFrame, token_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: rows (term, est) with at
    most `capacity` counter rows plus one DROPS_SENTINEL row carrying
    the partition's subtracted mass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        drops = 0
        for pdf in batches:
            counters.update(Counter(pdf[token_col].dropna()))
            if len(counters) > capacity:
                # Batch decrement: subtract the (capacity+1)-th largest
                # value from everything; at most `capacity` survive.
                cut = sorted(counters.values(), reverse=True)[capacity]
                drops += cut
                counters = Counter(
                    {t: c - cut for t, c in counters.items() if c - cut > 0}
                )
        out = pd.DataFrame(
            {
                "term": list(counters.keys()) + [DROPS_SENTINEL],
                "est": list(counters.values()) + [drops],
            }
        )
        yield out.astype({"term": "string", "est": "int64"})

    return tokens.select(token_col).mapInPandas(run, "term string, est long")
