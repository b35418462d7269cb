"""Empty-corpus robustness: EVERY catalog entry must degrade gracefully
on zero-row tables — either return an (empty) result or raise a
DESCRIPTIVE ValueError from a trainer that genuinely cannot fit on
nothing. Raw engine errors (Py4JJavaError from a KMeans fit, NoneType
subscripts from a `.first()`, ZeroDivisionError from a driver-side
count) are bugs a user migrating real-but-sparse data hits immediately;
the round-9 sweep found 8 of them and this test keeps the class dead."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

# Trainers that legitimately cannot produce a model from an empty corpus:
# they must raise ValueError with a human explanation, not an engine error.
EXPECTED_VALUEERROR = {
    "ann_ivf",
    "ann_pq",
    "ann_ivfpq",
    "ivf_incremental",
    "quality_classifier",
    "unigram_train",
    "unigram_encode",
}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """Zero-row twins of every corpus table, schemas preserved."""
    out = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
        con.execute(
            f"COPY (SELECT * FROM '{p}' LIMIT 0) TO '{out / os.path.basename(p)}' "
            "(FORMAT PARQUET)"
        )
    con.close()
    return str(out)


def test_every_entry_degrades_gracefully_on_empty_tables(spark, empty_sf):
    import __spark_entry__ as entrymod

    offenders = {}
    for name, fn in sorted(entrymod.queries().items()):
        try:
            n = fn(spark, empty_sf).count()
        except ValueError as e:
            if name in EXPECTED_VALUEERROR:
                continue  # designed clear-error path
            offenders[name] = f"unexpected ValueError: {e}"
        except Exception as e:  # noqa: BLE001 — the point is classifying them
            offenders[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
        else:
            if name in EXPECTED_VALUEERROR:
                offenders[name] = (
                    f"expected a descriptive ValueError but got {n} rows — "
                    "update EXPECTED_VALUEERROR if this entry became empty-safe"
                )
    assert not offenders, offenders
