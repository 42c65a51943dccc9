"""Winnowing fingerprints vs a pure-Python reference implementation of
Schleimer et al.'s robust winnowing, plus the shared-passage guarantee
and the dup-pair detection path."""

from __future__ import annotations

import hashlib
import re

import pytest

from distributed_mobility_data_pipeline_spark.operators import winnow


def _py_winnow(text: str, k: int = 3, w: int = 4) -> set[tuple[int, int]]:
    words = re.sub(" +", " ", text.lower().strip()).split(" ")
    if len(words) < k:
        return set()
    hashes = [
        int(hashlib.md5(" ".join(words[i : i + k]).encode()).hexdigest()[:8], 16)
        for i in range(len(words) - k + 1)
    ]
    picks: set[tuple[int, int]] = set()
    for s in range(len(hashes) - w + 1):
        window = hashes[s : s + w]
        m = min(window)
        # rightmost minimal position (robust winnowing)
        p = max(i for i, h in enumerate(window) if h == m)
        picks.add((m, s + p + 1))  # 1-based position
    return picks


TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "pack my box with five dozen liquor jugs",
    "a a a a a a a a",  # degenerate: every k-gram identical → tie-breaks
    "one two three four five six",
    "short doc",  # < k words after k=3 → no k-grams
]


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow.winnow_fingerprints(docs, k=3, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_hash, r.fp_pos))
    want = {
        i: _py_winnow(t, 3, 4) for i, t in enumerate(TEXTS) if _py_winnow(t, 3, 4)
    }
    assert got == want


def test_shared_passage_guarantee(spark):
    # the winnowing guarantee: a shared run of >= w + k - 1 tokens
    # yields at least one shared fingerprint
    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= 4+3-1
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + passage + " unrelated tail content x"),
            (2, "completely different opening text " + passage),
        ],
        "doc_id long, text string",
    )
    fps = winnow.winnow_fingerprints(docs, k=3, w=4)
    a = {r.fp_hash for r in fps.filter("doc_id = 1").collect()}
    b = {r.fp_hash for r in fps.filter("doc_id = 2").collect()}
    assert a & b


def test_dup_pairs_finds_embedded_passage(spark):
    passage = " ".join(f"tok{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, passage),
            (2, "prefix words before everything " + passage + " and a suffix"),
            (3, " ".join(f"other{i}" for i in range(25))),
        ],
        "doc_id long, text string",
    )
    pairs = winnow.winnow_dup_pairs(docs, k=3, w=4, min_overlap=0.5).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]
    # doc 1 is (almost) fully contained in doc 2 → containment near 1
    assert pairs[0].overlap >= 0.8


def test_max_df_drops_boilerplate(spark):
    # the same passage in EVERY doc is boilerplate: with max_df=2 the
    # shared fingerprints exceed the cap and no pair survives
    passage = " ".join(f"b{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, passage + f" unique{i} closing{i} words{i} here{i}") for i in range(5)],
        "doc_id long, text string",
    )
    assert winnow.winnow_dup_pairs(docs, k=3, w=4, max_df=2).count() == 0
    assert winnow.winnow_dup_pairs(docs, k=3, w=4, max_df=10).count() > 0


def test_validates_args(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow.winnow_fingerprints(docs, k=0)
    with pytest.raises(ValueError):
        winnow.winnow_fingerprints(docs, w=0)


def test_shared_spans_locate_the_passage(spark):
    passage = " ".join(f"tok{i}" for i in range(20))
    prefix = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    docs = spark.createDataFrame(
        [
            (1, passage),
            (2, prefix + " " + passage + " s1 s2 s3"),
        ],
        "doc_id long, text string",
    )
    rows = winnow.winnow_shared_spans(docs, k=3, w=4, min_overlap=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # doc 1 IS the passage: the span must sit inside [1, 20]
    assert 1 <= r.a_start <= r.a_end <= 20
    # in doc 2 the passage starts after the 10-token prefix: the span
    # must sit inside the embedded region [11, 30] and past the prefix
    assert 11 <= r.b_start <= r.b_end <= 30
    # offsets agree up to the prefix shift
    assert r.b_start - r.a_start == 10 and r.b_end - r.a_end == 10


def test_pos_cap_guard_raises_instead_of_corrupting(spark, monkeypatch):
    """Positions at/above _POS_CAP would make the packed-key offset
    negative and silently corrupt the min selection; the guard must
    fail loudly instead. Exercised by shrinking the cap (a real 2M-word
    doc would just be slow)."""
    monkeypatch.setattr(winnow, "_POS_CAP", 8)
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))],  # 18 k-grams > cap
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="k-grams"):
        winnow.winnow_fingerprints(docs, k=3, w=4).collect()
    # under the cap: same patched limit, shorter doc -> no raise
    short = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(9)))],  # 7 k-grams < cap
        "doc_id long, text string",
    )
    assert winnow.winnow_fingerprints(short, k=3, w=4).count() > 0


def test_span_envelope_intersects_every_shared_run(spark):
    """The span is a bounding envelope over ALL shared fingerprints, so
    disjoint shared passages merge into one span — but the winnowing
    guarantee still promises that every shared run of >= w + k - 1
    tokens contributes a fingerprint inside the run, hence the reported
    span must INTERSECT every such run, in both documents' coordinates.
    Randomized layouts (seeded): two disjoint shared passages at varying
    offsets with doc-unique filler between them."""
    import random

    rng = random.Random(7)
    k, w = 3, 4
    for trial in range(6):
        n1 = rng.randint(6, 12)  # >= w + k - 1 = 6
        n2 = rng.randint(6, 12)
        p1 = " ".join(f"s{trial}p{i}" for i in range(n1))
        p2 = " ".join(f"t{trial}q{i}" for i in range(n2))

        def fill(tag: str, n: int) -> str:
            return " ".join(f"{tag}{trial}x{i}" for i in range(n))

        a_lens = (rng.randint(0, 8), rng.randint(3, 8), rng.randint(0, 8))
        b_lens = (rng.randint(0, 8), rng.randint(3, 8), rng.randint(0, 8))
        a_text = " ".join(
            x for x in (fill("a", a_lens[0]), p1, fill("c", a_lens[1]),
                        p2, fill("e", a_lens[2])) if x
        )
        b_text = " ".join(
            x for x in (fill("b", b_lens[0]), p1, fill("d", b_lens[1]),
                        p2, fill("f", b_lens[2])) if x
        )
        docs = spark.createDataFrame(
            [(1, a_text), (2, b_text)], "doc_id long, text string"
        )
        rows = winnow.winnow_shared_spans(
            docs, k=k, w=w, min_overlap=0.05
        ).collect()
        assert len(rows) == 1, (trial, rows)
        r = rows[0]
        # 1-based inclusive word spans of each shared run per doc
        runs_a = [
            (a_lens[0] + 1, a_lens[0] + n1),
            (a_lens[0] + n1 + a_lens[1] + 1, a_lens[0] + n1 + a_lens[1] + n2),
        ]
        runs_b = [
            (b_lens[0] + 1, b_lens[0] + n1),
            (b_lens[0] + n1 + b_lens[1] + 1, b_lens[0] + n1 + b_lens[1] + n2),
        ]
        for start, end in runs_a:
            assert r.a_start <= end and start <= r.a_end, (
                trial, "run missed in doc a", (start, end), r
            )
        for start, end in runs_b:
            assert r.b_start <= end and start <= r.b_end, (
                trial, "run missed in doc b", (start, end), r
            )
