"""Winnowing fingerprint gates (operators/text.winnow_fingerprints).

The catalog entry hash-checks selection against the DuckDB twin; these pin
the ALGORITHM's published properties (Schleimer et al. SIGMOD'03):

- detection guarantee: two docs sharing a substring of length >= w+k-1
  share at least one identical fingerprint hash;
- density: expected fingerprint count ~ 2/(w+1) of gram count;
- locality: editing text far from a shared region does not disturb the
  shared region's fingerprints (the reason winnowing beats a global
  rolling hash for sub-document matching).
"""

from __future__ import annotations

import random

from devcontainers_etl_node_spark.operators import text as textops

K, W = 5, 4
GUARANTEE = W + K - 1  # any shared substring this long must be detected


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def _fps(spark, texts):
    rows = textops.winnow_fingerprints(_docs_df(spark, texts), k=K, w=W).collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    return out


def test_shared_substring_guarantee(spark):
    """Plant a GUARANTEE-length shared run inside otherwise-unrelated
    random texts — the two docs MUST share a fingerprint hash."""
    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for trial in range(5):
        shared = "".join(rng.choice(alphabet) for _ in range(GUARANTEE))
        t1 = "".join(rng.choice(alphabet) for _ in range(40)) + shared + "".join(
            rng.choice(alphabet) for _ in range(40)
        )
        t2 = "".join(rng.choice(alphabet) for _ in range(25)) + shared + "".join(
            rng.choice(alphabet) for _ in range(55)
        )
        fps = _fps(spark, [t1, t2])
        assert fps[0] & fps[1], (trial, shared)


def test_unrelated_docs_share_nothing(spark):
    """Disjoint alphabets => no gram can collide => no shared hash."""
    fps = _fps(spark, ["aaaaabbbbbcccccdddddeeeee", "vvvvvwwwwwxxxxxyyyyyzzzzz"])
    assert not (fps[0] & fps[1])


def test_density_near_two_over_w_plus_one(spark):
    """On random (tie-free in expectation) text the selected fraction of
    positions is ~2/(w+1) = 0.4; allow a generous band."""
    rng = random.Random(99)
    t = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(2000))
    rows = textops.winnow_fingerprints(_docs_df(spark, [t]), k=K, w=W).collect()
    n_grams = len(t) - K + 1
    density = len(rows) / n_grams
    assert 0.25 <= density <= 0.55, density


def test_locality_edit_far_away_preserves_fingerprints(spark):
    """Changing the text's tail must not change fingerprints selected in
    the (far) head — selection depends only on a w+k-1 neighborhood."""
    rng = random.Random(3)
    head = "".join(rng.choice("abcdefghij") for _ in range(120))
    t1 = head + "zzzzzzzzzzzzzzzzzzzz"
    t2 = head + "qqqqqqqqqqqqqqqqqqqq"
    df = _docs_df(spark, [t1, t2])
    rows = textops.winnow_fingerprints(df, k=K, w=W).collect()
    by_doc: dict[int, set] = {0: set(), 1: set()}
    for r in rows:
        # compare only fingerprints chosen strictly inside the shared head
        # (selection within [W, len(head)-K+1-W] can't see the tail)
        if W <= r["pos"] <= len(head) - K + 1 - W:
            by_doc[r["doc_id"]].add((r["pos"], r["gram_hash"]))
    assert by_doc[0] == by_doc[1] and by_doc[0]
