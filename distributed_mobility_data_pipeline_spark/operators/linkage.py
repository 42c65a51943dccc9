"""Fuzzy record linkage: blocked candidate generation + edit-distance
scoring.

The dedup family (operators/dedup_llm.py) handles document-scale near-
duplicates via MinHash/SimHash; this module is the ENTITY-resolution
counterpart — matching short strings (names, labels, product titles)
where edit distance is the right similarity and the record count is
dimension-scale.

Scale shape: never all-pairs. Candidates come from an equi-join on a
blocking key, so cost is sum(block_size^2) instead of n^2 — the same
banding idea as LSH, specialized to short strings. Levenshtein runs
JVM-side (built-in ``F.levenshtein``), only on within-block pairs.
A skewed block (one giant blocking key) is the failure mode: pick a
blocking function with bounded selectivity, or pre-split hot blocks
with the salting helper (operators/skew.py).
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
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        block.alias("_block"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        block.alias("_block"),
    )
    # two cheap pre-filters before the expensive edit distance:
    # |len(a)-len(b)| is a Levenshtein lower bound (prunes in codegen
    # before the DP), and the threshold form of levenshtein abandons
    # the DP as soon as the bound is exceeded (returns -1) — together
    # they make giant blocks pay O(short-circuit), not O(len^2) per pair
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_distance)
    return (
        a.join(b, "_block")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b"))
                <= max_distance
            )
        )
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_distance"),
            # two empty names are identical (similarity 1); the guard
            # also keeps ANSI mode from dividing by zero on them
            F.when(
                F.greatest(F.length("name_a"), F.length("name_b")) > 0,
                F.lit(1.0)
                - dist.cast("double")
                / F.greatest(F.length("name_a"), F.length("name_b")),
            )
            .otherwise(F.lit(1.0))
            .alias("similarity"),
        )
        # threshold levenshtein marks beyond-bound pairs with -1
        .filter(F.col("edit_distance").between(0, max_distance))
    )
