"""Market-basket analysis: distributed frequent itemsets (MLlib
FPGrowth).

Extends the ML surface (ml/training.py counterparts of the reference's
demand models) with the classic co-occurrence miner: which parts are
ordered together. FPGrowth builds parallel FP-trees per partition — no
candidate-generation blowup like Apriori — and is the 100 TB-appropriate
algorithm for this.

Itemsets are deterministic for a given (corpus, min_support); only
MLlib's output ordering varies, so results are normalized to a sorted
itemset string. Truncated to ``max_len`` so the SQL oracle (singles +
pair co-occurrence self-join) checks the exact same set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def order_baskets(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """One row per order with the distinct set of parts it contains.

    collect_set already deduplicates within the group, so no separate
    ``distinct()`` pass — the old pre-distinct added a full extra
    shuffle on (order, item) for a result collect_set produces anyway
    (r19 optimization, guide §2.4: remove shuffles outright; verified
    identical itemsets)."""
    return (
        lineitem.select(order_col, item_col)
        .groupBy(order_col)
        .agg(F.collect_set(item_col).alias("items"))
    )


def frequent_itemsets(
    lineitem: DataFrame,
    min_support: float = 0.001,
    max_len: int = 2,
) -> DataFrame:
    """Frequent part combinations across orders via FPGrowth.

    Returns (itemset, n_items, freq): the numerically-sorted
    comma-joined item list, its size, and the number of orders
    containing all of its items. Only itemsets up to ``max_len`` are
    kept (the oracle-checkable slice; FPGrowth itself mines all sizes).
    """
    from pyspark.ml.fpm import FPGrowth

    # FPGrowth.fit runs several internal jobs (count, frequent-item
    # scan, FP-tree mining) and the mined itemset RDD the model wraps
    # is lazy — un-persisted, each of those passes re-ran the lineitem
    # scan + basket groupBy (r19, guide §5; measured ~25% faster at
    # sf0.1). ContextCleaner reclaims the cache once the result is
    # unreferenced.
    baskets = order_baskets(lineitem).persist()
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=0.5
    ).fit(baskets)
    out = model.freqItemsets.filter(F.size("items") <= max_len)
    return out.select(
        F.concat_ws(
            ",",
            F.transform(F.array_sort("items"), lambda x: x.cast("string")),
        ).alias("itemset"),
        F.size("items").alias("n_items"),
        F.col("freq").cast("bigint").alias("freq"),
    )


def user_event_sequences(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """One row per user: the time-ordered event-type sequence in
    PrefixSpan's shape (array of singleton itemsets). Ordering ties
    break on ``tiebreak`` so sequences are deterministic."""
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col(ts_col), F.col(tiebreak), F.col(type_col))
        )
    )
    return events.groupBy(user_col).agg(
        F.transform(ordered, lambda s: F.array(s[type_col])).alias("sequence")
    )


def sequential_patterns(
    events: DataFrame,
    min_support: float = 0.5,
    max_pattern_length: int = 2,
) -> DataFrame:
    """Frequent event-type sequences across users (MLlib PrefixSpan —
    the sequential twin of FPGrowth's co-occurrence itemsets).

    Support = the number of users whose ordered event sequence contains
    the pattern as a subsequence. Truncated to ``max_pattern_length``
    (<= 2 keeps the SQL oracle exact: length-2 subsequence containment
    is an ordered-pair EXISTS). Returns (pattern, n_steps, freq) with
    the pattern rendered as 'a>b'.
    """
    from pyspark.ml.fpm import PrefixSpan

    # same persist rationale as frequent_itemsets: PrefixSpan's
    # internal passes re-ran the event scan + sequence groupBy
    seqs = user_event_sequences(events).persist()
    model = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        sequenceCol="sequence",
    )
    out = model.findFrequentSequentialPatterns(seqs)
    flat = F.transform(F.col("sequence"), lambda s: s[0])
    return out.select(
        F.concat_ws(">", flat).alias("pattern"),
        F.size("sequence").alias("n_steps"),
        F.col("freq").cast("bigint").alias("freq"),
    )
