"""Gates for the zlib compression-ratio quality signal
(operators/text.compression_ratio + catalog compression_quality, which is
rows-only by design: DEFLATE has no SQL twin, so these tests carry the
correctness burden the DuckDB oracle carries elsewhere)."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from devcontainers_etl_node_spark.operators import text as textops

from tests.conftest import SF_SMALL


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def test_matches_local_zlib_exactly(spark):
    """The distributed signal is byte-for-byte the stdlib computation."""
    texts = ["hello world " * 20, "abc", "x", "the quick brown fox " * 7]
    rows = {r["doc_id"]: r for r in textops.compression_ratio(_df(spark, texts)).collect()}
    for i, t in enumerate(texts):
        raw = len(t.encode("utf-8"))
        comp = len(zlib.compress(t.encode("utf-8"), 6))
        assert rows[i]["raw_bytes"] == raw
        assert rows[i]["compressed_bytes"] == comp
        assert rows[i]["ratio_permille"] == round(1000.0 * comp / raw)


def test_separates_repetitive_from_prose_from_noise(spark):
    """The signal's reason to exist: template/repeated text sits far below
    natural prose, which sits below incompressible noise."""
    import random

    rng = random.Random(5)
    repetitive = "click here to subscribe now " * 80
    prose = (
        "spark executes declarative plans over partitioned columnar files and "
        "the optimizer prunes columns predicates and partitions before any "
        "shuffle happens which keeps network volume proportional to results "
    ) * 10
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(2000))
    rows = {
        r["doc_id"]: r["ratio_permille"]
        for r in textops.compression_ratio(_df(spark, [repetitive, prose, noise])).collect()
    }
    assert rows[0] < rows[1] < rows[2], rows
    assert rows[0] < 200      # template junk: hugely compressible
    assert rows[2] > 500      # high-entropy noise: barely compressible


def test_empty_text_yields_null_ratio_not_error(spark):
    rows = textops.compression_ratio(_df(spark, ["", "ok text here"])).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["raw_bytes"] == 0 and by_id[0]["ratio_permille"] is None
    assert by_id[1]["ratio_permille"] is not None


def test_catalog_entry_runs_and_is_deterministic(spark):
    """Rows-only contract: the entry executes at sf0.001, covers every
    source, and two runs are identical (DEFLATE is deterministic)."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()["compression_quality"]
    a = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    assert a == b and len(a) == 20  # 20 sources in the corpus
    for row in a:
        # (source, n_docs, min, max, sum, n_suspect): sane envelope
        assert row[2] <= row[3] and row[1] > 0
