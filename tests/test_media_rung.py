"""GB media rung as a regression GATE (r11 verdict task 8).

The r11 rung gave the multimodal path its first non-toy numbers (1.09 GB
of real stdlib PNGs: ingest 484 MB/s, webdataset export 441 MB/s
byte-identical, sampled decode pixel-exact). This test re-runs the same
rung via tools/bench_media_rung.run_rung and pins floors well under the
measured values, so the numbers cannot silently regress:

- ingest (binaryFile + max_bytes guard) >= 300 MB/s,
- export shards byte-identical across two writes (sha256-sampled),
- the planted oversize blob is the one guarded row,
- the sampled decode roundtrip is pixel-exact (asserted inside the rung).

Marked `slow`: ~1 GB of I/O, a few minutes of wall. Deselect with
`-m "not slow"` for quick iteration; the full suite runs it.

The CORRECTNESS invariants (guarded row, identical shards, decode) gate
unconditionally. The MB/s floor is host-dependent (r12 advice: an
absolute threshold flakes on slower or busy boxes with correctness
unaffected; the r14 driver box measured ~1/3 the reference box's
per-core speed while QUIET, so a load waiver alone is not enough — a
wall-clock floor inside the correctness suite is flaky by construction
on a slow-but-idle host). The floor is therefore OPT-IN: set
SPARK_GRAFT_MEDIA_MBPS_FLOOR to a positive MB/s value to enforce it
(calibrated boxes only); unset or 0 skips the assert and records the
measured throughput in the skip message instead.
"""

from __future__ import annotations

import os

import pytest

from tools.bench_media_rung import run_rung


@pytest.mark.slow
def test_media_rung_gb_gate(spark):
    # the shared session fixture keeps the rung on the suite's Spark
    # config; run_rung's own get_spark() resolves to the same singleton
    metrics = run_rung(5500, 256)
    # correctness gates: unconditional
    assert metrics["payload_gb"] >= 1.0
    assert metrics["guarded_rows"] == 1
    assert metrics["export_identical_shards"] >= 8
    assert metrics["decoded_ok"] >= 50
    # throughput floor: OPT-IN via env (default off — a wall-clock floor
    # in the correctness suite flakes on slow-but-idle hosts; r14 VERDICT
    # item 1). Still waived on a loaded box even when opted in.
    floor = float(os.environ.get("SPARK_GRAFT_MEDIA_MBPS_FLOOR", "0"))
    load = os.getloadavg()[0]
    busy = load > (os.cpu_count() or 8) / 2
    if floor > 0 and not busy:
        assert metrics["ingest_mbps"] >= floor, metrics
    else:
        reason = (
            f"loadavg {load:.1f} — MB/s floor waived on a busy host"
            if floor > 0
            else "MB/s floor not opted in (SPARK_GRAFT_MEDIA_MBPS_FLOOR unset/0)"
        )
        pytest.skip(
            f"{reason} (correctness gates above still ran); measured "
            f"{metrics['ingest_mbps']:.0f} MB/s"
        )
