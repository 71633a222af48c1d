"""Two-pass distributed heavy hitters: Misra-Gries candidates + exact
recount.

The classic scale problem: "which items occur more than n/φ⁻¹ times?"
over a multiset too large to group-count in full (the full groupBy
shuffles the ENTIRE item stream — at 100 TB of n-grams that shuffle is
the job). The standard two-pass fix implemented here:

1. **Candidate pass** (`heavy_hitter_candidates`): each partition folds
   its items through a Misra-Gries summary of capacity k (the mergeable
   batched form of Agarwal et al., "Mergeable Summaries": merge a
   batch's value_counts, then subtract the (k+1)-th largest count and
   drop non-positives). MG's guarantee per partition p: an item absent
   from the summary has true partition count <= n_p/(k+1). Summing over
   partitions, an item missing from EVERY summary has global count
   <= n/(k+1) — so with k+1 >= φ⁻¹ the union of per-partition
   candidates is a SUPERSET of the true heavy hitters. Only ~k items
   per partition ever leave the executor.
2. **Exact pass** (caller): re-stream the items joined against the
   broadcast candidate set, group-count exactly, threshold. The final
   answer is EXACT and deterministic — partitioning only changes which
   false candidates get recounted and discarded, never the output.

The sketch kernel is an Arrow-batched mapInPandas (pandas value_counts
+ nlargest per batch — vectorized, no per-item Python loop).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["heavy_hitter_candidates", "heavy_hitter_summaries"]


def heavy_hitter_summaries(
    items: DataFrame, *, col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries PLUS the partition's item
    count, in one pass over ``items``: candidate rows carry the item in
    ``col`` with ``part_n`` NULL; each partition additionally emits ONE
    sentinel row (``col`` NULL, ``part_n`` = items seen) so the caller
    gets the exact global n from the same scan instead of re-reading
    the source to count it — at 100 TB that third scan is the
    difference between 2n and 3n bytes read. The union of candidate
    rows is a superset of every item with global frequency
    > n/(capacity+1)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def mg(batches):
        counters = pd.Series(dtype="int64")
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            vc = pdf[col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > capacity:
                # canonical mergeable-MG step: subtract the (k+1)-th
                # largest count from ALL counters, drop non-positive.
                # Each event removes >= thresh*(k+1) mass, so the total
                # subtracted over a partition is <= n_p/(k+1) — the
                # bound the superset guarantee rests on
                thresh = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters - thresh
                counters = counters[counters > 0]
        yield pd.DataFrame(
            {
                col: list(counters.index.astype(str)) + [None],
                "part_n": [None] * len(counters) + [n_part],
            }
        )

    return items.select(col).mapInPandas(
        mg, schema=f"{col} string, part_n long"
    )


def heavy_hitter_candidates(
    items: DataFrame, *, col: str, capacity: int
) -> DataFrame:
    """One candidate row per distinct item surviving a per-partition
    Misra-Gries summary of ``capacity`` counters; superset of all items
    with global frequency > n/(capacity+1)."""
    return (
        heavy_hitter_summaries(items, col=col, capacity=capacity)
        .filter(f"{col} IS NOT NULL")
        .select(col)
        .distinct()
    )
