"""Structured Streaming behavior, driven through readStream (parquet
source) → memory sink, batch/stream parity included."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from devcontainers_etl_node_spark.schemas import CORPUS
from devcontainers_etl_node_spark.streaming import (
    deduped_events,
    hourly_event_counts,
    session_windows,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


@pytest.fixture()
def event_rows():
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    return [
        (1, ts(0), 1, "click", 1.0, "{}"),
        (1, ts(0), 1, "click", 1.0, "{}"),  # replay duplicate
        (2, ts(5), 1, "view", 2.0, "{}"),
        (3, ts(90), 1, "click", 3.0, "{}"),  # next hour + next session
        (4, ts(2), 2, "purchase", 10.0, "{}"),
    ]


def _stream(spark, tmp_path, rows):
    src = tmp_path / "events_src"
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))


def _run(df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()


def test_streaming_dedup(spark, tmp_path, event_rows):
    stream = _stream(spark, tmp_path, event_rows)
    _run(deduped_events(stream), "dedup_out")
    out = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(out) == 4  # replayed event_id=1 deduped


def test_streaming_hourly_counts_match_batch(spark, tmp_path, event_rows):
    # append-mode windows only emit once the watermark passes their end; a
    # far-future sentinel closes all real windows (excluded from compare).
    sentinel = (99, datetime.datetime(2024, 1, 1, 14, 0, 0), 99, "sentinel", 0.0, "{}")
    stream = _stream(spark, tmp_path, event_rows + [sentinel])
    _run(hourly_event_counts(stream), "hourly_out")
    got = {
        (r.window_start.hour, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM hourly_out").collect()
        if r.event_type != "sentinel"
    }
    # batch twin: same aggregation on the same rows as a plain DataFrame
    batch = (
        spark.createDataFrame(event_rows, EVENTS_SCHEMA)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = {(r["window"]["start"].hour, r.event_type): r.n for r in batch.collect()}
    assert got == expected
    assert got[(10, "click")] == 2  # both replays of id=1 in-window


def test_streaming_session_windows(spark, tmp_path, event_rows):
    sentinel = (99, datetime.datetime(2024, 1, 1, 14, 0, 0), 99, "sentinel", 0.0, "{}")
    stream = _stream(spark, tmp_path, event_rows + [sentinel])
    _run(session_windows(stream, gap="30 minutes"), "sess_out")
    out = spark.sql("SELECT * FROM sess_out").collect()
    by_user = {}
    for r in out:
        if r.user_id != 99:
            by_user.setdefault(r.user_id, []).append(r.n_events)
    # user 1: events at +0,+0,+5 then +90 → two sessions (3 events, 1 event)
    assert sorted(by_user[1]) == [1, 3]
    assert by_user[2] == [1]


def test_stream_static_enrichment_matches_batch(spark, tmp_path, event_rows):
    """Stream-static join twin of the reference's star enrichment: every
    event picks up its dim row; unmatched keys stay (left join); results
    equal the batch join on the same rows."""
    from devcontainers_etl_node_spark.streaming import enriched_stream

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = _stream(spark, tmp_path, event_rows)
    _run(enriched_stream(stream, dim), "enrich_out")
    got = {
        (r.event_id, r.tier) for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    batch = spark.createDataFrame(event_rows, EVENTS_SCHEMA)
    expected = {
        (r.event_id, r.tier) for r in enriched_stream(batch, dim).collect()
    }
    assert got == expected
    assert ("1", "gold") not in got  # types preserved: event_id stays long
    assert (4, "silver") in got


def test_stateful_running_totals_idle_timeout_evicts_state(spark, tmp_path):
    """idle_timeout_ms bounds the otherwise O(all users ever) state: a
    user idle past the timeout has its state dropped at the next
    micro-batch, so when they return the running total RESTARTS — bounded
    state traded for lifetime exactness (the default None keeps lifetime
    totals and unbounded state, as the docstring warns)."""
    import time as _time

    from devcontainers_etl_node_spark.streaming import user_running_totals

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    src = tmp_path / "events_src"
    spark.createDataFrame(
        [(1, t0, 1, "click", 1.0, "{}")], EVENTS_SCHEMA
    ).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    # NOTE: once any group registers a processing-time timeout the
    # micro-batch engine schedules batches CONTINUOUSLY to evaluate it,
    # so processAllAvailable never quiesces — poll the sink instead.
    q = (
        user_running_totals(stream, idle_timeout_ms=500)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_evict")
        .trigger(processingTime="250 milliseconds")
        .start()
    )

    def wait_until(pred, what, deadline_s=90.0):
        end = _time.time() + deadline_s
        while _time.time() < end:
            if pred(spark.sql("SELECT * FROM totals_evict").collect()):
                return
            _time.sleep(0.25)
        raise AssertionError(f"timed out waiting for {what}")

    wait_until(lambda rows: any(r.user_id == 1 for r in rows), "batch 1")
    _time.sleep(1.5)  # let user 1 go idle past the timeout
    # other users keep arriving; user 1's timeout fires in some batch
    # and its state is removed (emitting nothing)
    spark.createDataFrame(
        [(2, t0 + datetime.timedelta(minutes=1), 2, "view", 2.0, "{}")],
        EVENTS_SCHEMA,
    ).write.mode("append").parquet(str(src))
    wait_until(lambda rows: any(r.user_id == 2 for r in rows), "batch 2")
    _time.sleep(1.0)  # ensure the timeout batch ran after user 2 landed
    # user 1 returns: the total restarts from zero state
    spark.createDataFrame(
        [(3, t0 + datetime.timedelta(minutes=2), 1, "click", 4.0, "{}")],
        EVENTS_SCHEMA,
    ).write.mode("append").parquet(str(src))
    wait_until(
        lambda rows: sum(1 for r in rows if r.user_id == 1) >= 2, "user 1 return"
    )
    q.stop()
    rows = spark.sql("SELECT * FROM totals_evict").collect()
    u1 = sorted((r.n_events, r.total_value) for r in rows if r.user_id == 1)
    assert u1 == [(1, 1.0), (1, 4.0)]  # restarted, not (2, 5.0)


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from devcontainers_etl_node_spark.streaming import user_running_totals

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    src = tmp_path / "events_src"
    batch1 = [(1, t0, 1, "click", 1.0, "{}"), (2, t0, 2, "view", 2.0, "{}")]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    q = (
        user_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_out")
        .start()
    )
    q.processAllAvailable()
    # second micro-batch: user 1 again — state must carry the prior count
    batch2 = [(3, t0 + datetime.timedelta(minutes=1), 1, "click", 4.0, "{}")]
    spark.createDataFrame(batch2, EVENTS_SCHEMA).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT * FROM totals_out ORDER BY user_id, n_events"
    ).collect()
    # memory sink in update mode appends each emission: user 1 appears
    # after batch1 (1 event, 1.0) and after batch2 (2 events, 5.0)
    u1 = [(r.n_events, r.total_value) for r in rows if r.user_id == 1]
    u2 = [(r.n_events, r.total_value) for r in rows if r.user_id == 2]
    assert u1 == [(1, 1.0), (2, 5.0)]
    assert u2 == [(1, 2.0)]


def test_foreachbatch_checkpoint_resume(spark, tmp_path):
    """Checkpointed foreachBatch sink: a restarted query resumes from the
    checkpoint and does NOT reprocess already-committed micro-batches —
    the exactly-once contract of SURVEY §7 step 8 (production shape:
    foreachBatch → JDBC; here the batch sink is a parquet append)."""
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"

    def sink(df, batch_id):
        df.write.mode("append").parquet(str(out))

    def run_until_drained(stream):
        q = (
            stream.writeStream.option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    batch1 = [(1, t0, 1, "click", 1.0, "{}"), (2, t0, 2, "view", 2.0, "{}")]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))
    run_until_drained(spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src)))
    assert spark.read.parquet(str(out)).count() == 2

    # restart: add one file; only the new file may be processed
    batch2 = [(3, t0 + datetime.timedelta(minutes=1), 1, "click", 3.0, "{}")]
    spark.createDataFrame(batch2, EVENTS_SCHEMA).write.mode("append").parquet(str(src))
    run_until_drained(spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src)))
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 3  # no reprocessing of batch 1
    assert sorted(r.event_id for r in rows) == [1, 2, 3]


def test_stream_stream_join_matches_batch_twin(spark, tmp_path):
    from devcontainers_etl_node_spark.streaming import click_purchase_join

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        (1, ts(0), 1, "click", 1.0, "{}"),
        (2, ts(20), 1, "purchase", 9.0, "{}"),   # within 1h of click 1
        (3, ts(90), 1, "purchase", 9.0, "{}"),   # beyond horizon of click 1
        (4, ts(85), 1, "click", 1.0, "{}"),      # click 4 → purchase 3
        (5, ts(5), 2, "purchase", 5.0, "{}"),    # other user, no click
        (6, ts(300), 9, "sentinel", 0.0, "{}"),  # advances both watermarks
    ]
    src = tmp_path / "ss_src"
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    q = (
        click_purchase_join(*split(stream))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ss_join_out").collect()
    }
    batch = spark.createDataFrame(rows, EVENTS_SCHEMA)
    expected = {
        (r.click_id, r.purchase_id)
        for r in click_purchase_join(*split(batch)).collect()
    }
    assert got == expected == {(1, 2), (4, 3)}


def test_streaming_upsert_sink_keeps_latest_per_key(spark, tmp_path):
    """foreachBatch SCD-1 merge: across micro-batches the target holds
    exactly one row per key — the latest by version — matching the batch
    upsert_latest semantics."""
    from devcontainers_etl_node_spark.streaming import upsert_sink

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    src, ckpt, tgt = tmp_path / "src", tmp_path / "ckpt", tmp_path / "tgt"

    def run_until_drained():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .foreachBatch(upsert_sink(str(tgt), ["user_id"], "ts"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    batch1 = [(1, t0, 1, "click", 1.0, "{}"), (2, t0, 2, "view", 2.0, "{}")]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))
    run_until_drained()
    got = {r.user_id: (r.event_id, r.value) for r in spark.read.parquet(str(tgt)).collect()}
    assert got == {1: (1, 1.0), 2: (2, 2.0)}

    # batch 2 updates user 1 and inserts user 3
    batch2 = [
        (3, t0 + datetime.timedelta(minutes=5), 1, "click", 9.0, "{}"),
        (4, t0 + datetime.timedelta(minutes=6), 3, "view", 4.0, "{}"),
    ]
    spark.createDataFrame(batch2, EVENTS_SCHEMA).write.mode("append").parquet(str(src))
    run_until_drained()
    got = {r.user_id: (r.event_id, r.value) for r in spark.read.parquet(str(tgt)).collect()}
    assert got == {1: (3, 9.0), 2: (2, 2.0), 3: (4, 4.0)}


def test_streaming_upsert_sink_partitioned_prunes_untouched(spark, tmp_path):
    """Partition-scoped SCD-1 merge: correctness matches upsert_sink AND a
    micro-batch that only touches one partition leaves the other
    partition's files physically untouched (same names — no rewrite)."""
    from devcontainers_etl_node_spark.streaming import upsert_sink_partitioned

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    src, ckpt, tgt = tmp_path / "src", tmp_path / "ckpt", tmp_path / "tgt"

    def run_until_drained():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .foreachBatch(
                upsert_sink_partitioned(str(tgt), ["user_id"], "ts", "event_type")
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()

    batch1 = [(1, t0, 1, "click", 1.0, "{}"), (2, t0, 2, "view", 2.0, "{}")]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))
    run_until_drained()
    got = {r.user_id: r.value for r in spark.read.parquet(str(tgt)).collect()}
    assert got == {1: 1.0, 2: 2.0}
    view_files_before = sorted(p.name for p in (tgt / "event_type=view").glob("*.parquet"))
    assert view_files_before

    # batch 2 touches ONLY the click partition: updates user 1, inserts user 3
    batch2 = [
        (3, t0 + datetime.timedelta(minutes=5), 1, "click", 9.0, "{}"),
        (4, t0 + datetime.timedelta(minutes=6), 3, "click", 4.0, "{}"),
    ]
    spark.createDataFrame(batch2, EVENTS_SCHEMA).write.mode("append").parquet(str(src))
    run_until_drained()
    got = {r.user_id: r.value for r in spark.read.parquet(str(tgt)).collect()}
    assert got == {1: 9.0, 2: 2.0, 3: 4.0}
    view_files_after = sorted(p.name for p in (tgt / "event_type=view").glob("*.parquet"))
    assert view_files_after == view_files_before


def test_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    watermark delay are suppressed even when their event times differ
    slightly (the at-least-once-producer case exact dropDuplicates can't
    handle: a retried event re-stamped 2s later is still one event).
    State is evicted once the watermark passes — unlike dropDuplicates,
    whose key state without a watermark grows forever."""
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (1, t0 + datetime.timedelta(seconds=2), 1, "click", 1.0, "{}"),  # retry, re-stamped
        (2, t0 + datetime.timedelta(minutes=5), 1, "view", 2.0, "{}"),
    ]
    src = tmp_path / "ddww_src"
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    _run(deduped, "ddww_out")
    out = spark.sql("SELECT event_id FROM ddww_out").collect()
    assert sorted(r.event_id for r in out) == [1, 2]


def test_available_now_rate_limited_batches(spark, tmp_path, event_rows):
    """trigger(availableNow=True) + maxFilesPerTrigger: bounded backfill
    that drains everything present at start, but in rate-limited
    micro-batches instead of one giant batch — the 100 TB catch-up
    pattern (a cold start over a deep file backlog must not build one
    batch whose state exceeds executor memory). One file per batch ⇒
    at least as many batches as files, and the union of batches is
    exactly the source."""
    src = tmp_path / "an_src"
    for i, row in enumerate(event_rows):
        spark.createDataFrame([row], EVENTS_SCHEMA).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("an_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)  # availableNow terminates by itself
    n_batches = q.lastProgress["batchId"] + 1
    out = spark.sql("SELECT event_id FROM an_out").collect()
    assert len(out) == len(event_rows)
    assert n_batches >= 3  # rate limit actually split the backlog


def test_transform_with_state_counter(spark, tmp_path, event_rows):
    """transformWithStateInPandas (Spark 4 arbitrary-state v2): a
    per-user ValueState counter that survives micro-batch boundaries —
    the engine's extension point for custom streaming operators beyond
    applyInPandasWithState (typed state kinds, timers, TTL). The source
    is drained one file per trigger so the counter provably accumulates
    ACROSS batches through the RocksDB state store, not within one.

    The v2 state protocol speaks protobuf between the JVM and the Python
    state server; skipped where google.protobuf isn't installed (this
    container) — applyInPandasWithState (test above) is the fully-tested
    stateful path here."""
    pytest.importorskip("google.protobuf.descriptor")
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("n_events", LongType())]
    )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState(
                "count", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = (self._n.get() or (0,))[0]
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    src = tmp_path / "tws_src"
    for i, row in enumerate(event_rows):
        spark.createDataFrame([row], EVENTS_SCHEMA).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(str(src))

    prev_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        counted = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=CountProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        q = (
            counted.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # update-mode memory sink appends every batch's emissions; the MAX
        # per user is the final accumulated count.
        final = {
            r.user_id: r.mx
            for r in spark.sql(
                "SELECT user_id, MAX(n_events) AS mx FROM tws_out GROUP BY user_id"
            ).collect()
        }
        assert final == {1: 4, 2: 1}  # user 1: 4 events (incl. replay), user 2: 1
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )


def test_streaming_neardup_simhash_dedup(spark, tmp_path):
    """Streaming NEAR-dup suppression — the curation dedup moved onto the
    continuous path: documents are fingerprinted map-side with simhash
    (operators/dedup.py, pure expressions) and deduplicated on the
    fingerprint within the watermark window. Whitespace/case variants of
    the same text share a fingerprint (identical token stream), so a
    re-crawled page re-stamped seconds later is suppressed, while a
    genuinely different document passes. State is fingerprint-keyed and
    watermark-evicted — O(window), not O(stream)."""
    import datetime

    from devcontainers_etl_node_spark.operators.dedup import simhash

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    schema = "doc_id long, ts timestamp, text string"
    rows = [
        (1, t0, "the quick brown fox jumps over the dog"),
        (2, t0 + datetime.timedelta(seconds=3), "The  Quick   Brown fox jumps over the dog"),
        (3, t0 + datetime.timedelta(seconds=5), "a completely different document about spark"),
    ]
    src = tmp_path / "nd_src"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    deduped = (
        stream.withColumn("fp", simhash("text"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["fp"])
    )
    _run(deduped, "neardup_out")
    out = spark.sql("SELECT doc_id FROM neardup_out").collect()
    kept = sorted(r.doc_id for r in out)
    assert len(kept) == 2 and 3 in kept  # one of the near-dup pair + the distinct doc


def test_streaming_fingerprint_sink_matches_batch_digest(spark, tmp_path):
    """Incremental xor fingerprints: after streaming the corpus in two
    micro-batches, the running per-partition digests equal the ONE-SHOT
    batch digest of everything streamed (xor + count are mergeable), and
    a replayed batch_id is skipped (xor would cancel a double-apply)."""
    from devcontainers_etl_node_spark.streaming import (
        fingerprint_sink,
        read_fingerprint_state,
    )

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    src, ckpt, tgt = tmp_path / "fp_src", tmp_path / "fp_ckpt", tmp_path / "fp_tgt"
    tgt.mkdir()
    canon_cols = ["event_id", "user_id", "event_type", "value"]
    sink = fingerprint_sink(str(tgt), "event_type", canon_cols, run_id=str(ckpt))

    def run_until_drained():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    batch1 = [(1, t0, 1, "click", 1.0, "{}"), (2, t0, 2, "view", 2.0, "{}")]
    batch2 = [
        (3, t0, 1, "click", 9.0, "{}"),
        (4, t0, 3, "view", 4.0, "{}"),
        (5, t0, 3, "purchase", 7.0, "{}"),
    ]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))
    run_until_drained()
    spark.createDataFrame(batch2, EVENTS_SCHEMA).write.mode("append").parquet(str(src))
    run_until_drained()

    got = {
        r.part: (r.n_rows, r.fingerprint)
        for r in read_fingerprint_state(spark, str(tgt)).collect()
    }

    # one-shot digest of the full dataset, same canonicalization
    full = spark.createDataFrame(batch1 + batch2, EVENTS_SCHEMA)
    canon = F.concat_ws("|", *[F.col(c).cast("string") for c in canon_cols])
    rh = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    expected = {
        r.part: (r.n_rows, r.fingerprint)
        for r in full.select(F.col("event_type").alias("part"), rh.alias("rh"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.bit_xor("rh").alias("fingerprint"))
        .collect()
    }
    assert got == expected
    assert set(got) == {"click", "view", "purchase"}

    # replay: applying an already-folded batch_id again must be a no-op
    state = read_fingerprint_state(spark, str(tgt))
    max_applied = state.agg(F.max("last_batch_id")).first()[0]
    sink(spark.createDataFrame(batch1, EVENTS_SCHEMA), max_applied)
    got_after = {
        r.part: (r.n_rows, r.fingerprint)
        for r in read_fingerprint_state(spark, str(tgt)).collect()
    }
    assert got_after == expected

    # the replay guard is SCOPED to run_id: a query restarted with a fresh
    # checkpoint restarts batch numbering at 0 — with a NEW run_id the fold
    # must proceed (an unscoped guard would silently drop every batch)
    extra = [(6, t0, 9, "click", 5.0, "{}")]
    sink2 = fingerprint_sink(str(tgt), "event_type", canon_cols, run_id="restarted")
    sink2(spark.createDataFrame(extra, EVENTS_SCHEMA), 0)
    after_restart = {
        r.part: r.n_rows for r in read_fingerprint_state(spark, str(tgt)).collect()
    }
    assert after_restart["click"] == expected["click"][0] + 1

    # atomic commit: exactly one committed state dir is referenced, and a
    # crash can never observe a half-written current state (pointer file
    # swaps only after the full parquet write)
    import os

    current = (tgt / "_CURRENT").read_text().strip()
    assert os.path.exists(str(tgt / current / "_SUCCESS"))


def test_streaming_content_dedup_batch_parity(spark, tmp_path):
    """streaming_content_dedup suppresses re-delivered content whose
    event time was re-stamped within the watermark (the at-least-once
    crawler case), and its surviving content-hash set equals the batch
    exact_dedup's on the same data — the parity a lambda-architecture
    pipeline needs between its speed and batch layers."""
    import datetime

    from devcontainers_etl_node_spark.operators import dedup as dd
    from devcontainers_etl_node_spark.streaming import streaming_content_dedup

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, "the exact same document body"),
        (2, t0 + datetime.timedelta(seconds=3), "the exact same document body"),  # re-crawl
        (3, t0 + datetime.timedelta(minutes=1), "a different document entirely"),
        (4, t0 + datetime.timedelta(minutes=2), "the exact same document body"),  # still inside watermark
        (5, t0 + datetime.timedelta(minutes=3), "third unique text"),
    ]
    schema = "doc_id LONG, ts TIMESTAMP, text STRING"
    src = tmp_path / "scd_src"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    _run(streaming_content_dedup(stream, watermark="10 minutes"), "scd_out")
    out = spark.sql("SELECT doc_id, content_sha FROM scd_out").collect()
    # one survivor per distinct content, duplicates within watermark gone
    assert len(out) == 3
    batch = dd.exact_dedup(spark.createDataFrame(rows, schema))
    batch_shas = {r.s for r in batch.select(F.sha2("text", 256).alias("s")).collect()}
    assert {r.content_sha for r in out} == batch_shas


def test_state_store_introspection(spark, tmp_path):
    """Spark 4 statestore / state-metadata sources: after a checkpointed
    run of streaming_content_dedup, the operator's keyed state is
    queryable OFFLINE like a table — the on-call surface for "what is
    this query holding and why" at scale. Asserts the metadata maps the
    dedup operator, and that the committed keys are exactly the distinct
    content hashes of the input (32-byte state per doc, never the text)."""
    import datetime

    from devcontainers_etl_node_spark.streaming import (
        read_state_metadata,
        read_stream_state,
        streaming_content_dedup,
    )

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, "alpha body"),
        (2, t0 + datetime.timedelta(seconds=5), "alpha body"),
        (3, t0 + datetime.timedelta(minutes=1), "beta body"),
    ]
    schema = "doc_id LONG, ts TIMESTAMP, text STRING"
    src = tmp_path / "sst_src"
    ckpt = tmp_path / "sst_ckpt"
    out = tmp_path / "sst_out"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_content_dedup(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta = read_state_metadata(spark, str(ckpt)).collect()
    assert len(meta) == 1
    assert "dedupe" in meta[0].operatorName.lower()
    op_id = meta[0].operatorId

    state = read_stream_state(spark, str(ckpt), operator_id=op_id).collect()
    expected = {r.content_sha for r in spark.read.parquet(str(out)).collect()}
    assert len(expected) == 2  # alpha deduped
    assert {r.key.content_sha for r in state} == expected


def test_streaming_ivf_ingest_matches_batch_and_replay_is_idempotent(spark, tmp_path):
    """Streaming IVF ingest against a frozen quantizer: (1) every streamed
    vector lands in the inverted list its BATCH assignment (ivf_assign
    over the full input) puts it in; (2) a restarted query processes only
    new files; (3) a replayed micro-batch rewrites its batch_id dir
    instead of duplicating rows."""
    import numpy as np

    from devcontainers_etl_node_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )
    from devcontainers_etl_node_spark.streaming import ivf_ingest_sink

    rng = np.random.RandomState(7)
    # two well-separated clusters in R^4
    vecs = [
        (i, (rng.randn(4) / 10 + (5.0 if i % 2 else -5.0)).tolist())
        for i in range(20)
    ]
    schema = "vec_id long, embedding array<double>"
    src, ckpt = tmp_path / "vec_src", tmp_path / "ivf_ckpt"
    cent_path, lists = str(tmp_path / "centroids"), str(tmp_path / "lists")

    corpus = spark.createDataFrame(vecs, schema)
    corpus.write.mode("overwrite").parquet(str(src))
    train_ivf_centroids(corpus, n_centroids=2).write.mode("overwrite").parquet(cent_path)

    sink = ivf_ingest_sink(cent_path, lists)

    def run_until_drained():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_until_drained()
    got = {
        (r.vec_id, r.centroid)
        for r in spark.read.parquet(lists).select("vec_id", "centroid").collect()
    }
    cent = spark.read.parquet(cent_path)
    expected = {
        (r.vec_id, r.centroid) for r in ivf_assign(corpus, cent).collect()
    }
    assert got == expected and len(got) == 20
    # the two planted clusters landed in two distinct lists
    assert len({c for _, c in got}) == 2

    # restart with 5 appended vectors: only the new file is processed
    more = [(100 + i, (rng.randn(4) / 10 + 5.0).tolist()) for i in range(5)]
    spark.createDataFrame(more, schema).write.mode("append").parquet(str(src))
    run_until_drained()
    all_rows = spark.read.parquet(lists).select("vec_id", "centroid").collect()
    assert len(all_rows) == 25
    assert len({r.vec_id for r in all_rows}) == 25  # no duplicates

    # replay batch 0 manually (crash-after-write, pre-commit): the
    # batch_id=0 dir is REWRITTEN, not appended — row count unchanged
    sink(corpus, 0)
    replayed = spark.read.parquet(lists).select("vec_id").collect()
    assert len(replayed) == 25


def test_streaming_webdataset_export_matches_batch_and_replay_is_idempotent(spark, tmp_path):
    """Continuous trainer-shard export: (1) every streamed doc lands in a
    valid tar shard exactly once; (2) a restarted query processes only new
    files; (3) a replayed micro-batch REWRITES its batch_id dir with
    byte-identical tars instead of duplicating or mutating shards."""
    import hashlib
    import tarfile
    from pathlib import Path

    from devcontainers_etl_node_spark.streaming import webdataset_sink

    schema = "doc_id long, text string, lang string"
    docs = [(i, f"streamed body {i}", f"lang{i % 2}") for i in range(30)]
    src, ckpt, out = tmp_path / "docs_src", tmp_path / "wds_ckpt", tmp_path / "wds_out"
    corpus = spark.createDataFrame(docs, schema)
    corpus.write.mode("overwrite").parquet(str(src))

    sink = webdataset_sink(str(out), meta_cols=["lang"], shards_per_batch=3)

    def run_until_drained():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    def read_all_samples():
        got = {}
        for tar_path in sorted(Path(out).glob("batch_id=*/shard-*.tar")):
            with tarfile.open(tar_path) as tar:
                for m in tar.getmembers():
                    if m.name.endswith(".txt"):
                        got[int(m.name[:-4])] = tar.extractfile(m).read().decode()
        return got

    run_until_drained()
    assert read_all_samples() == {i: f"streamed body {i}" for i in range(30)}
    assert not list(Path(out).glob("**/*.inprogress"))  # all renames committed

    # restart with 5 appended docs: only the new file becomes batch 1
    more = [(100 + i, f"late body {i}", "lang0") for i in range(5)]
    spark.createDataFrame(more, schema).write.mode("append").parquet(str(src))
    run_until_drained()
    samples = read_all_samples()
    assert len(samples) == 35
    assert sorted(p.name for p in Path(out).iterdir()) == ["batch_id=0", "batch_id=1"]

    # replay batch 0 manually (crash-after-write, pre-commit): dir is
    # cleared + rewritten and the tar BYTES come back identical
    before = {
        p.name: hashlib.sha256(p.read_bytes()).hexdigest()
        for p in (Path(out) / "batch_id=0").iterdir()
    }
    sink(corpus, 0)
    after = {
        p.name: hashlib.sha256(p.read_bytes()).hexdigest()
        for p in (Path(out) / "batch_id=0").iterdir()
    }
    assert after == before
    assert len(read_all_samples()) == 35


def test_txlog_sink_streams_batches_exactly_once(spark, tmp_path):
    """Streaming ingest into the transactional table: two micro-batches
    land as two atomic commits; the table equals the union; a manually
    REPLAYED batch_id is skipped (txnAppId/txnVersion guard), so restart
    + reprocess cannot double rows; the change feed tails the stream."""
    from devcontainers_etl_node_spark.sinks import txlog
    from devcontainers_etl_node_spark.streaming import txlog_sink

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    src, ckpt, tbl = tmp_path / "tx_src", tmp_path / "tx_ckpt", str(tmp_path / "tx_tbl")
    sink = txlog_sink(tbl, app_id=str(ckpt))

    def run_until_drained():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    batch1 = [(1, t0, 1, "click", 1.0, "{}"), (2, t0, 2, "view", 2.0, "{}")]
    batch2 = [(3, t0, 1, "click", 9.0, "{}"), (4, t0, 3, "view", 4.0, "{}")]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).write.mode("overwrite").parquet(str(src))
    run_until_drained()
    v_after_b1 = txlog.tx_head(tbl)
    spark.createDataFrame(batch2, EVENTS_SCHEMA).write.mode("append").parquet(str(src))
    run_until_drained()

    got = {r.event_id for r in txlog.tx_read(spark, tbl).collect()}
    assert got == {1, 2, 3, 4}

    # replay the already-committed last batch by hand (crash-recovery
    # path): the guard must skip it
    max_batch = txlog.tx_txn_version(tbl, str(ckpt))
    sink(spark.createDataFrame(batch2, EVENTS_SCHEMA), max_batch)
    assert txlog.tx_read(spark, tbl).count() == 4

    # the change feed tails exactly what arrived after the first commit
    ch = {r.event_id for r in txlog.tx_changes(spark, tbl, since_version=v_after_b1).collect()}
    assert ch == {3, 4}


def test_streaming_postings_index_serves_bm25_identical_to_direct(spark, tmp_path):
    """Streaming inverted-index maintenance: (1) BM25 served FROM the
    streamed index is row-identical to the direct (re-tokenize) path over
    the same corpus; (2) a restarted query indexes only new files; (3) a
    replayed micro-batch rewrites its batch_id dir instead of duplicating
    postings; (4) the query's scan touches only the query terms' bucket
    partitions."""
    from devcontainers_etl_node_spark.operators import retrieval
    from devcontainers_etl_node_spark.streaming import postings_index_sink

    schema = "doc_id long, text string"
    docs = [
        (i, f"alpha beta doc{i} " + ("needle " * (i % 4)) + "gamma delta")
        for i in range(24)
    ]
    src, ckpt, idx = tmp_path / "src", tmp_path / "ckpt", str(tmp_path / "index")
    corpus = spark.createDataFrame(docs, schema)
    corpus.write.mode("overwrite").parquet(str(src))

    sink = postings_index_sink(idx)

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    queries = [(1, ["needle", "alpha"]), (2, ["gamma"])]
    direct = sorted(map(tuple, retrieval.bm25_topk(corpus, queries, k=5).collect()))
    indexed = sorted(
        map(tuple, retrieval.bm25_topk_from_index(spark, idx, queries, k=5).collect())
    )
    assert direct == indexed and direct

    # restart with appended docs: only the new file is indexed, and the
    # index-backed answer tracks the direct answer over the grown corpus
    more = [(100 + i, "needle needle needle alpha") for i in range(3)]
    spark.createDataFrame(more, schema).write.mode("append").parquet(str(src))
    drain()
    grown = corpus.unionByName(spark.createDataFrame(more, schema))
    direct2 = sorted(map(tuple, retrieval.bm25_topk(grown, queries, k=5).collect()))
    indexed2 = sorted(
        map(tuple, retrieval.bm25_topk_from_index(spark, idx, queries, k=5).collect())
    )
    assert direct2 == indexed2
    assert direct2 != direct  # the heavy-needle inserts changed the top-k

    # replay batch 0 (crash-after-write): postings row count unchanged
    n_before = spark.read.parquet(f"{idx}/postings").count()
    sink(corpus, 0)
    assert spark.read.parquet(f"{idx}/postings").count() == n_before

    # bucket pruning: the pruned scan reads strictly fewer files than the
    # full index has (the mechanism bm25_topk_from_index relies on)
    import glob as _glob

    all_files = _glob.glob(f"{idx}/postings/batch_id=*/bucket=*/*.parquet")
    from pyspark.sql import functions as F

    qb = {
        r["b"]
        for r in spark.createDataFrame([(t,) for _, ts in queries for t in ts], "term string")
        .select(retrieval.term_bucket("term").alias("b"))
        .collect()
    }
    pruned_files = [p for p in all_files if int(p.split("bucket=")[1].split("/")[0]) in qb]
    assert 0 < len(pruned_files) < len(all_files)


def test_streaming_txlog_merge_sink_cdc_apply_exactly_once(spark, tmp_path):
    """Continuous CDC-apply: streamed update batches UPSERT into the
    transactional table via the pruned tx_merge — (1) final table state
    is latest-per-key across everything streamed; (2) a replayed
    micro-batch is absorbed by the txn guard (no version bump, no row
    churn); (3) within-batch duplicates for one key reduce to the
    version_col winner; (4) merge versions appear in the commit log as
    mode=merge."""
    from devcontainers_etl_node_spark.sinks import txlog
    from devcontainers_etl_node_spark.streaming import txlog_merge_sink

    root = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(i, f"orig-{i}", 0) for i in range(20)], "id LONG, val STRING, ver LONG"
    )
    txlog.tx_write(base, root)  # v0

    schema = "id long, val string, ver long"
    cdc = [
        (3, "first-update", 1),
        (3, "second-update", 2),   # same key twice in one batch: ver wins
        (7, "update", 1),
        (99, "insert", 1),
    ]
    src, ckpt = tmp_path / "cdc_src", tmp_path / "ckpt"
    spark.createDataFrame(cdc, schema).write.mode("overwrite").parquet(str(src))

    sink = txlog_merge_sink(root, app_id=str(ckpt), key="id", version_col="ver")

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    got = {r["id"]: (r["val"], r["ver"]) for r in txlog.tx_read(spark, root).collect()}
    assert len(got) == 21
    assert got[3] == ("second-update", 2)   # within-batch latest-per-key
    assert got[7] == ("update", 1)
    assert got[99] == ("insert", 1)
    assert got[0] == ("orig-0", 0)

    head_after = txlog.tx_head(root)

    # replay batch 0 (crash-after-commit): guard absorbs it — no new version
    sink(spark.createDataFrame(cdc, schema), 0)
    assert txlog.tx_head(root) == head_after
    assert txlog.tx_read(spark, root).count() == 21

    # a second stream batch advances state exactly once
    spark.createDataFrame([(7, "newer", 5)], schema).write.mode("append").parquet(str(src))
    drain()
    got2 = {r["id"]: (r["val"], r["ver"]) for r in txlog.tx_read(spark, root).collect()}
    assert got2[7] == ("newer", 5) and len(got2) == 21

    # the commit log records the merges
    modes = [h["mode"] for h in txlog.tx_history(root)]
    assert modes.count("merge") == 2


def _minhash_docs(t0):
    """Near-dup families + distinct docs: family texts share a long
    boilerplate with tiny tails (Jaccard of char-5-gram sets well above
    0.5), distinct docs share nothing."""
    import datetime as _dt

    boiler = " ".join(f"boiler{j}word" for j in range(30))
    rows = []
    for fam in range(3):
        for m in range(2):
            rows.append(
                (
                    fam * 10 + m,
                    t0 + _dt.timedelta(seconds=fam * 10 + m),
                    f"{boiler} fam{fam} tail{m}",
                )
            )
    for i in range(3):
        rows.append(
            (
                100 + i,
                t0 + _dt.timedelta(seconds=50 + i),
                " ".join(f"unique{100 + i}x{j}" for j in range(35)),
            )
        )
    return rows


def test_streaming_minhash_neardup_batch_parity(spark, tmp_path):
    """Streaming MinHash near-dup pairs == the batch operator on the same
    docs (same knobs) when all timestamps fit in one watermark horizon:
    same (id_a, id_b) set, same exact-Jaccard values, no duplicate pair
    rows (the one-bucket emission rule replaces the batch distinct)."""
    import datetime

    from devcontainers_etl_node_spark.operators.dedup import minhash_lsh_pairs
    from devcontainers_etl_node_spark.streaming import (
        streaming_minhash_neardup_pairs,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = _minhash_docs(t0)
    schema = "doc_id long, ts timestamp, text string"
    src = tmp_path / "mh_src"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    _run(
        streaming_minhash_neardup_pairs(stream, watermark="10 minutes"),
        "mh_pairs_out",
    )
    got = spark.sql("SELECT * FROM mh_pairs_out").collect()
    got_pairs = {(r.id_a, r.id_b): r.jaccard_sim for r in got}
    assert len(got) == len(got_pairs)  # no duplicate emissions
    # both sides at the library default (32/8 since r11) — parity is a
    # knob-for-knob contract, pinned here at the config users get
    batch = minhash_lsh_pairs(
        spark.createDataFrame(rows, schema),
        threshold=0.5,
    ).collect()
    want = {(r.id_a, r.id_b): r.jaccard_sim for r in batch}
    assert set(got_pairs) == set(want) and len(want) >= 3  # the 3 families
    for k in want:
        assert abs(got_pairs[k] - want[k]) < 1e-12


def test_streaming_minhash_neardup_slim_state_batch_parity(spark, tmp_path):
    """SLIM state mode (r12, doc_store set): the stateful stage keeps only
    (id, ts, sig, band keys) — no shingle sets — and the exact verify runs
    as a stream-static join against the durable store. Output pairs AND
    jaccard values must be identical to full mode and to the batch
    operator (same knobs, one horizon)."""
    import datetime

    from devcontainers_etl_node_spark.operators.dedup import minhash_lsh_pairs
    from devcontainers_etl_node_spark.streaming import (
        streaming_minhash_neardup_pairs,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = _minhash_docs(t0)
    schema = "doc_id long, ts timestamp, text string"
    src = tmp_path / "mhslim_src"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src))
    store = spark.read.parquet(str(src))  # the durable corpus table
    stream = spark.readStream.schema(schema).parquet(str(src))
    _run(
        streaming_minhash_neardup_pairs(
            stream, watermark="10 minutes", doc_store=store
        ),
        "mh_slim_out",
    )
    got = spark.sql("SELECT * FROM mh_slim_out").collect()
    got_pairs = {(r.id_a, r.id_b): r.jaccard_sim for r in got}
    assert len(got) == len(got_pairs)  # one-bucket rule still dedups
    batch = minhash_lsh_pairs(
        spark.createDataFrame(rows, schema), threshold=0.5
    ).collect()
    want = {(r.id_a, r.id_b): r.jaccard_sim for r in batch}
    assert set(got_pairs) == set(want) and len(want) >= 3
    for k in want:
        assert abs(got_pairs[k] - want[k]) < 1e-12


def test_streaming_minhash_neardup_slim_state_checkpoint_replay(spark, tmp_path):
    """Slim mode keeps the replay/resume contract: checkpointed restart
    resumes without re-emitting, state survives (a batch-1 resident pairs
    with a batch-2 arrival), re-delivered ids are no-ops — and the store
    verify still yields exact jaccard values."""
    import datetime

    from devcontainers_etl_node_spark.streaming import (
        streaming_minhash_neardup_pairs,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    schema = "doc_id long, ts timestamp, text string"
    boiler = " ".join(f"slimresume{j}word" for j in range(30))
    src = tmp_path / "mhsr_src"
    ckpt = tmp_path / "mhsr_ckpt"
    out = tmp_path / "mhsr_out"

    def start():
        store = spark.read.parquet(str(src))  # re-read per start: grows
        stream = spark.readStream.schema(schema).parquet(str(src))
        return (
            streaming_minhash_neardup_pairs(
                stream, watermark="10 minutes", doc_store=store
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )

    spark.createDataFrame(
        [
            (1, t0, f"{boiler} tail a"),
            (2, t0 + datetime.timedelta(seconds=1), f"{boiler} tail b"),
        ],
        schema,
    ).write.mode("overwrite").parquet(str(src))
    q = start()
    q.processAllAvailable()
    q.stop()

    spark.createDataFrame(
        [
            (2, t0 + datetime.timedelta(seconds=2), f"{boiler} tail b"),
            (3, t0 + datetime.timedelta(seconds=3), f"{boiler} tail c"),
        ],
        schema,
    ).write.mode("append").parquet(str(src))
    q = start()
    q.processAllAvailable()
    q.stop()

    pairs = [
        ((r.id_a, r.id_b), round(r.jaccard_sim, 9))
        for r in spark.read.parquet(str(out)).collect()
    ]
    keys = [k for k, _ in pairs]
    assert len(keys) == len(set(keys))  # nothing re-emitted
    assert set(keys) == {(1, 2), (1, 3), (2, 3)}
    assert all(j >= 0.5 for _, j in pairs)


def test_streaming_minhash_neardup_blocked_batch_parity(spark, tmp_path):
    """block_cols on the streaming twin: the block key joins the STATE
    key, so buckets never span blocks — output equals the blocked batch
    operator, and the cross-block planted pair is out of scope."""
    import datetime

    from devcontainers_etl_node_spark.operators.dedup import minhash_lsh_pairs
    from devcontainers_etl_node_spark.streaming import (
        streaming_minhash_neardup_pairs,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    rows = [
        (1, t0, base, "en"),
        (2, t0 + datetime.timedelta(seconds=5), base.replace("lazy", "sleepy"), "en"),
        (3, t0 + datetime.timedelta(seconds=9), base.replace("lazy", "dozy"), "de"),
    ] + [
        (10 + i, t0 + datetime.timedelta(seconds=20 + i),
         f"unrelated filler {i} with words {i * 7} only", "en")
        for i in range(8)
    ]
    schema = "doc_id long, ts timestamp, text string, lang string"
    src = tmp_path / "mhb_src"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    _run(
        streaming_minhash_neardup_pairs(
            stream, watermark="10 minutes", block_cols=["lang"]
        ),
        "mhb_pairs_out",
    )
    got = {
        (r.id_a, r.id_b)
        for r in spark.sql("SELECT * FROM mhb_pairs_out").collect()
    }
    batch = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, schema), threshold=0.5, block_cols=["lang"]
        ).collect()
    }
    assert got == batch
    assert (1, 2) in got and (1, 3) not in got and (2, 3) not in got


def test_streaming_minhash_neardup_watermark_evicts_state(spark, tmp_path):
    """A near-dup re-arriving AFTER the watermark horizon does not pair:
    the resident's state was evicted (bounded state is the contract —
    'no near-dups within the horizon', global dedup stays batch)."""
    import datetime

    from devcontainers_etl_node_spark.streaming import (
        streaming_minhash_neardup_pairs,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    schema = "doc_id long, ts timestamp, text string"
    boiler = " ".join(f"evict{j}word" for j in range(30))
    src = tmp_path / "mhev_src"
    ckpt = tmp_path / "mhev_ckpt"
    spark.createDataFrame(
        [(1, t0, f"{boiler} tail one")], schema
    ).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_minhash_neardup_pairs(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mhev_out")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.processAllAvailable()
    # unrelated filler advances the watermark past doc 1's timestamp
    spark.createDataFrame(
        [(2, t0 + datetime.timedelta(minutes=30), "totally unrelated filler words here")],
        schema,
    ).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    # doc 1's near-dup arrives well past the horizon: no pair
    spark.createDataFrame(
        [(3, t0 + datetime.timedelta(minutes=40), f"{boiler} tail two")], schema
    ).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT * FROM mhev_out").collect() == []


def test_streaming_minhash_neardup_checkpoint_resume_and_replay(spark, tmp_path):
    """Checkpointed restart resumes instead of re-emitting: pairs found
    before the stop are not duplicated after it, state survives (a
    resident from batch 1 still pairs with a batch-3 arrival), and a
    re-delivered doc_id is a no-op."""
    import datetime

    from devcontainers_etl_node_spark.streaming import (
        streaming_minhash_neardup_pairs,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    schema = "doc_id long, ts timestamp, text string"
    boiler = " ".join(f"resume{j}word" for j in range(30))
    src = tmp_path / "mhr_src"
    ckpt = tmp_path / "mhr_ckpt"
    out = tmp_path / "mhr_out"

    def start():
        stream = spark.readStream.schema(schema).parquet(str(src))
        return (
            streaming_minhash_neardup_pairs(stream, watermark="10 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )

    spark.createDataFrame(
        [
            (1, t0, f"{boiler} tail a"),
            (2, t0 + datetime.timedelta(seconds=1), f"{boiler} tail b"),
        ],
        schema,
    ).write.mode("overwrite").parquet(str(src))
    q = start()
    q.processAllAvailable()
    q.stop()

    # restart; re-deliver doc 2 (same id) and add a new family member
    spark.createDataFrame(
        [
            (2, t0 + datetime.timedelta(seconds=2), f"{boiler} tail b"),
            (3, t0 + datetime.timedelta(seconds=3), f"{boiler} tail c"),
        ],
        schema,
    ).write.mode("append").parquet(str(src))
    q = start()
    q.processAllAvailable()
    q.stop()

    pairs = [
        ((r.id_a, r.id_b), round(r.jaccard_sim, 9))
        for r in spark.read.parquet(str(out)).collect()
    ]
    keys = [k for k, _ in pairs]
    assert len(keys) == len(set(keys))  # nothing re-emitted
    # doc 3 paired with BOTH residents (state survived the restart);
    # the replayed doc 2 produced nothing new
    assert set(keys) == {(1, 2), (1, 3), (2, 3)}


def test_txlog_sink_continuous_open_format_export(spark, tmp_path):
    """txlog_sink(export='both'): after every micro-batch the table is
    ALSO consumable as a standard Delta _delta_log and an Iceberg v2
    metadata tree — replays of both mirror the head manifest exactly,
    snapshot counts track the commits, and a replayed batch (skipped by
    the txn guard) still leaves the exports consistent."""
    from devcontainers_etl_node_spark.sinks import txlog
    from devcontainers_etl_node_spark.sinks.delta_export import delta_log_snapshot
    from devcontainers_etl_node_spark.sinks.iceberg_export import iceberg_snapshot
    from devcontainers_etl_node_spark.streaming import txlog_sink

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    src, ckpt, tbl = tmp_path / "x_src", tmp_path / "x_ckpt", str(tmp_path / "x_tbl")
    sink = txlog_sink(tbl, app_id=str(ckpt), export="both")

    def run_until_drained():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(str(src))
            .writeStream.option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .foreachBatch(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    def mirrors_match():
        m = txlog._read_manifest(tbl, txlog.tx_head(tbl))
        want_rel = {e["path"]: e["rows"] for e in m["files"]}
        d = delta_log_snapshot(tbl)
        assert {p: f["numRecords"] for p, f in d["files"].items()} == want_rel
        i = iceberg_snapshot(tbl)
        import os as _os

        prefix = _os.path.abspath(tbl) + "/"
        assert {
            p[len(prefix):]: f["records"] for p, f in i["files"].items()
        } == want_rel
        return d, i

    spark.createDataFrame(
        [(1, t0, 1, "click", 1.0, "{}")], EVENTS_SCHEMA
    ).write.mode("overwrite").parquet(str(src))
    run_until_drained()
    d, i = mirrors_match()
    assert d["version"] == 0 and len(i["snapshots"]) == 1

    spark.createDataFrame(
        [(2, t0, 2, "view", 2.0, "{}")], EVENTS_SCHEMA
    ).write.mode("append").parquet(str(src))
    run_until_drained()
    d, i = mirrors_match()
    assert d["version"] == 1 and len(i["snapshots"]) == 2
    # the carried txn marks surface as Delta setTransaction actions
    assert d["txns"] == {str(ckpt): 1}

    # a replayed batch is skipped by the guard but the export still runs
    # and stays consistent (heals crash-between-commit-and-export)
    sink(spark.createDataFrame([(2, t0, 2, "view", 2.0, "{}")], EVENTS_SCHEMA), 1)
    d, i = mirrors_match()
    assert d["version"] == 1 and len(i["snapshots"]) == 2
    assert txlog.tx_read(spark, tbl).count() == 2

    with pytest.raises(ValueError, match="delta|iceberg"):
        txlog_sink(tbl, app_id="x", export="parquet")


def test_streaming_minhash_slim_candidates_bucketed_store_verify(spark, tmp_path):
    """r13 (r12 verdict task 3): slim_candidates mode + the bucketed-store
    foreachBatch verify — pairs and jaccard values identical to the batch
    operator, the store scan PRUNES to the candidate ids' buckets
    (selected_bytes < total_bytes, buckets selected < n_buckets), and a
    replayed batch_id overwrites its directory instead of duplicating."""
    import datetime

    from devcontainers_etl_node_spark.operators.dedup import minhash_lsh_pairs
    from devcontainers_etl_node_spark.sinks import write_doc_store
    from devcontainers_etl_node_spark.streaming import (
        minhash_slim_verify_sink,
        streaming_minhash_neardup_pairs,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = _minhash_docs(t0)
    schema = "doc_id long, ts timestamp, text string"
    src = tmp_path / "mhb_src"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src))
    store_root = str(tmp_path / "mhb_store")
    write_doc_store(spark.read.parquet(str(src)), store_root, n_buckets=16)

    out_path = str(tmp_path / "mhb_pairs")
    sink = minhash_slim_verify_sink(store_root, out_path)
    stream = spark.readStream.schema(schema).parquet(str(src))
    cand = streaming_minhash_neardup_pairs(
        stream, watermark="10 minutes", slim_candidates=True
    )
    q = (
        cand.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "mhb_ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out_path).collect()
    got_pairs = {(r.id_a, r.id_b): r.jaccard_sim for r in got}
    assert len(got) == len(got_pairs)
    batch = minhash_lsh_pairs(
        spark.createDataFrame(rows, schema), threshold=0.5
    ).collect()
    want = {(r.id_a, r.id_b): r.jaccard_sim for r in batch}
    assert set(got_pairs) == set(want) and len(want) >= 3
    for k in want:
        assert abs(got_pairs[k] - want[k]) < 1e-12

    # the prune actually pruned: fewer buckets than the store has, fewer
    # bytes than a full scan (candidate ids cluster into few of the 16)
    m = [x for x in sink.metrics if x["n_candidates"] > 0]
    assert m, sink.metrics
    for x in m:
        assert x["n_buckets_selected"] < 16
        assert x["selected_bytes"] < x["total_bytes"]
        assert x["n_pairs"] >= 0

    # replay idempotence: re-applying the DATA-BEARING batch (same
    # batch_id, same rows — the streaming replay contract) overwrites its
    # directory instead of appending a double
    n_before = spark.read.parquet(out_path).count()
    replay_df = spark.createDataFrame(
        [(r.id_a, r.id_b) for r in got], "id_a long, id_b long"
    )
    bid = m[0]["batch_id"]
    sink(replay_df, bid)
    assert spark.read.parquet(out_path).count() == n_before
    assert {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(f"{out_path}/batch_id={bid}").collect()
    } == set(want)

    # flag combination guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="slim_candidates"):
        streaming_minhash_neardup_pairs(
            spark.readStream.schema(schema).parquet(str(src)),
            watermark="10 minutes",
            doc_store=spark.read.parquet(str(src)),
            slim_candidates=True,
        )
