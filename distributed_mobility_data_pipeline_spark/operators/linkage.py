"""Fuzzy record linkage: blocked candidate generation + edit-distance
scoring.

The dedup family (operators/dedup_llm.py) handles document-scale near-
duplicates via MinHash/SimHash; this module is the ENTITY-resolution
counterpart — matching short strings (names, labels, product titles)
where edit distance is the right similarity and the record count is
dimension-scale.

Scale shape, in order of leverage:
1. The edit-distance DP runs once per DISTINCT name pair, never per
   record pair — records collapse to their name before the expensive
   step and expand back afterwards (real catalogs repeat names
   heavily; 20k records over 200 distinct names = a 10,000x DP cut).
2. Candidates come from an equi-join on a blocking key, so cost is
   sum(block_size^2) over distinct names instead of n^2 — LSH banding's
   idea, specialized to short strings.
3. Two pre-filters guard the DP itself: |len(a)-len(b)| is a
   Levenshtein lower bound, and the threshold form of ``levenshtein``
   abandons the DP once the bound is exceeded (returns -1).
A skewed block (one giant blocking key over DISTINCT names) remains
the failure mode: pick a blocking function with bounded selectivity,
or pre-split hot blocks with the salting helper (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token_block(name: Column) -> Column:
    """Default blocking key: the final whitespace-separated token
    (for '<modifier> <noun>'-shaped names, the noun)."""
    return F.regexp_extract(name, r"(\S+)$", 1)


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 4,
    block: Column | None = None,
) -> DataFrame:
    """Candidate match pairs: records sharing a blocking key whose
    names are within ``max_distance`` Levenshtein edits.

    Returns (id_a, id_b, name_a, name_b, edit_distance, similarity)
    with id_a < id_b (each unordered pair once, no self-pairs).
    ``similarity`` = 1 - dist / max(len_a, len_b) in [0, 1].
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    block = block if block is not None else last_token_block(F.col(name_col))

    # stage 1: the DP over DISTINCT names only (canonical nm_a <= nm_b)
    uniq = df.select(F.col(name_col).alias("_nm"), block.alias("_block")).distinct()
    a = uniq.select(F.col("_nm").alias("_nm_a"), "_block")
    b = uniq.select(F.col("_nm").alias("_nm_b"), "_block")
    dist = F.levenshtein(F.col("_nm_a"), F.col("_nm_b"), max_distance)
    name_pairs = (
        a.join(b, "_block")
        .filter(
            (F.col("_nm_a") <= F.col("_nm_b"))
            & (
                F.abs(F.length("_nm_a") - F.length("_nm_b"))
                <= max_distance
            )
        )
        .select(
            "_nm_a",
            "_nm_b",
            dist.cast("int").alias("edit_distance"),
            # two empty names are identical (similarity 1); the guard
            # also keeps ANSI mode from dividing by zero on them
            F.when(
                F.greatest(F.length("_nm_a"), F.length("_nm_b")) > 0,
                F.lit(1.0)
                - dist.cast("double")
                / F.greatest(F.length("_nm_a"), F.length("_nm_b")),
            )
            .otherwise(F.lit(1.0))
            .alias("similarity"),
        )
        # threshold levenshtein marks beyond-bound pairs with -1
        .filter(F.col("edit_distance").between(0, max_distance))
    )

    # stage 2: expand name pairs back to record pairs. The RECORD table
    # drives both joins and the distinct-name-pair table broadcasts:
    # row counts only grow at the join that produces actual output, so
    # parallelism follows the record partitions (letting the tiny
    # name_pairs side drive lets AQE coalesce the whole expansion into
    # one task — measured 86s vs 11s at the 10x probe).
    # A same-name pair (nm_a == nm_b) would emit each unordered id pair
    # twice, so those keep only id_1 < id_2; the output orientation is
    # always id_a < id_b with names remapped.
    ids1 = df.select(F.col(id_col).alias("_id1"), F.col(name_col).alias("_nm_a"))
    ids2 = df.select(F.col(id_col).alias("_id2"), F.col(name_col).alias("_nm_b"))
    expanded = (
        ids1.join(F.broadcast(name_pairs), "_nm_a")
        .join(ids2, "_nm_b")
        .filter(
            F.when(
                F.col("_nm_a") == F.col("_nm_b"),
                F.col("_id1") < F.col("_id2"),
            ).otherwise(F.col("_id1") != F.col("_id2"))
        )
    )
    first_is_a = F.col("_id1") < F.col("_id2")
    return expanded.select(
        F.least("_id1", "_id2").alias("id_a"),
        F.greatest("_id1", "_id2").alias("id_b"),
        F.when(first_is_a, F.col("_nm_a")).otherwise(F.col("_nm_b")).alias(
            "name_a"
        ),
        F.when(first_is_a, F.col("_nm_b")).otherwise(F.col("_nm_a")).alias(
            "name_b"
        ),
        "edit_distance",
        "similarity",
    )
