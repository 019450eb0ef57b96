"""Structured Streaming operators: drive a real micro-batch stream from
a parquet file source and check the windowed aggregation against the
same plan executed in batch."""

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.streaming.windows import (
    filtered_stream,
    run_to_memory_sink,
    stream_from_parquet_dir,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events-like parquet dir with proper (micro-second) timestamps."""
    src = tmp_path_factory.mktemp("events_stream")
    df = spark.range(1000).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(1700000000_000000) + F.col("id") * 30_000_000).cast("bigint")
        ).alias("ts"),
        (F.col("id") % 3).cast("string").alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    df.coalesce(2).write.mode("overwrite").parquet(str(src / "events"))
    return str(src / "events")


def test_windowed_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    schema = batch.schema

    stream = stream_from_parquet_dir(spark, events_dir, schema)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, watermark="2 hours")
    q = run_to_memory_sink(agg, "win_counts")
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(batch, watermark=None).collect()
    }
    assert got == expected
    assert len(got) > 3


def test_filtered_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = stream_from_parquet_dir(spark, events_dir, schema)
    flt = filtered_stream(stream, [("value", ">", 4), ("event_type", "in", ["1", "2"])])
    assert flt.isStreaming
    q = run_to_memory_sink(flt, "flt_events")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM flt_events").collect()
    batch_n = (
        spark.read.parquet(events_dir)
        .filter((F.col("value") > 4) & F.col("event_type").isin(["1", "2"]))
        .count()
    )
    assert len(rows) == batch_n > 0
    assert all(r["value"] > 4 for r in rows)


def test_st_sessionize_query_matches_stream_on_events(spark, tmp_path_factory):
    """Parity of the two sessionization twins on the REAL events table:
    the declared batch query (queries.st_sessionize, lag+cumsum over
    epoch nanos) and the stateful streaming operator
    (sessionize_stream, applyInPandasWithState) must agree session for
    session at sf0.001 — the streaming run only withholds the final
    still-open session per user (availableNow ends before its timeout
    fires)."""
    # st_sessionize rotated to EXTRA_QUERIES in round 8 — look it up
    # across both registries so future rotations cannot break this test
    from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES
    from mdataframe_spark.streaming.sessionize import sessionize_stream

    sf_dir = "/root/testdata/sf0.001"
    all_q = {**QUERIES, **EXTRA_QUERIES}
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in all_q["st_sessionize"](spark, sf_dir).collect()
    }
    assert len(expected) > 10

    # the file stream source needs a DIRECTORY; the testdata table is a
    # single parquet file — stage a copy
    import shutil

    stream_dir = tmp_path_factory.mktemp("events_real")
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(str(stream_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sessions = sessionize_stream(stream, gap_seconds=3600, watermark="1 minute")
    q = (
        sessions.writeStream.format("memory")
        .queryName("events_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.sql(
            """SELECT user_id,
                      unix_timestamp(session_start) AS session_start,
                      unix_timestamp(session_end) AS session_end,
                      n_events, round(sum_value, 4) AS sum_value
               FROM events_sessions"""
        ).collect()
    }
    n_users = batch.select("user_id").distinct().count()
    # every emitted session matches the batch query exactly
    assert len(got) >= len(expected) - n_users
    for k, v in got.items():
        assert expected.get(k) == v, (k, v, expected.get(k))


def test_sessionize_stream_matches_batch(spark, tmp_path_factory):
    """Drive the stateful operator on a real stream and compare the
    union of emitted + batch-tail sessions against the pure-batch
    window implementation."""
    from mdataframe_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    src = tmp_path_factory.mktemp("sessions") / "events"
    # 3 users, bursts separated by > gap
    df = spark.range(300).select(
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_micros(
            (
                F.lit(1700000000_000000)
                + (F.col("id") / 3).cast("long") * 60_000_000          # 1/min
                + ((F.col("id") / 90).cast("long") * 7200_000_000)    # 2h jumps
            ).cast("bigint")
        ).alias("ts"),
        (F.col("id") % 5).cast("double").alias("value"),
    )
    df.coalesce(2).write.mode("overwrite").parquet(str(src))
    batch = spark.read.parquet(str(src))

    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(batch, gap_seconds=1800).collect()
    }
    assert len(expected) > 3  # the 2h jumps split sessions

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="1 minute")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # the final open session per user is still in state at stream end
    # (availableNow stops before its timeout fires) — every emitted
    # session must match the batch result exactly
    assert len(got) >= len(expected) - 3
    for k, v in got.items():
        assert expected.get(k) == v, (k, v, expected.get(k))


def test_dedup_stream_matches_batch(spark, tmp_path_factory):
    """Streaming exact dedup (keyed and content-addressed) emits the
    same distinct set a batch dropDuplicates computes."""
    from mdataframe_spark.streaming.dedup import (
        dedup_stream_content,
        dedup_stream_exact,
    )

    src = tmp_path_factory.mktemp("dedup_stream") / "events"
    # 400 rows with heavy duplication: 100 distinct payloads, case and
    # whitespace variants of the same content hash
    df = spark.range(400).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(1700000000_000000) + F.col("id") * 1_000_000).cast("bigint")
        ).alias("ts"),
        (F.col("id") % 100).alias("key"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("Payload ")).otherwise(F.lit("  payload   ")),
            (F.col("id") % 100).cast("string"),
        ).alias("text"),
    )
    df.coalesce(2).write.mode("overwrite").parquet(str(src))
    batch = spark.read.parquet(str(src))
    schema = batch.schema

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        dedup_stream_exact(stream, ["key"], watermark="1 hour")
        .writeStream.format("memory").queryName("dd_keyed")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    keyed = spark.sql("SELECT key FROM dd_keyed").collect()
    assert len(keyed) == 100
    assert len({r["key"] for r in keyed}) == 100

    stream2 = spark.readStream.schema(schema).parquet(str(src))
    q2 = (
        dedup_stream_content(stream2, watermark="1 hour")
        .writeStream.format("memory").queryName("dd_content")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    content = spark.sql("SELECT text FROM dd_content").collect()
    # case/whitespace variants normalize to the same hash: 100 contents
    assert len(content) == 100
    from mdataframe_spark.operators.text import normalize_text
    batch_distinct = (
        batch.select(F.md5(normalize_text(F.col("text"))).alias("h"))
        .distinct().count()
    )
    assert batch_distinct == 100


def test_stream_stream_interval_join_matches_batch(spark, tmp_path_factory):
    """Watermarked stream-stream interval join drains to the same rows
    as the identical plan on batch frames."""
    from mdataframe_spark.streaming.joins import stream_stream_interval_join

    src = tmp_path_factory.mktemp("ssj")
    base = spark.range(600).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(1700000000_000000) + F.col("id") * 47_000_000).cast("bigint")
        ).alias("ts"),
        (F.col("id") % 2).cast("string").alias("event_type"),
        (F.col("id") % 5).alias("user_id"),
    )
    base.coalesce(2).write.mode("overwrite").parquet(str(src / "ev"))
    batch = spark.read.parquet(str(src / "ev"))
    schema = batch.schema

    def split(df):
        clicks = df.filter(F.col("event_type") == "0").select(
            "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
        )
        buys = df.filter(F.col("event_type") == "1").select(
            "user_id", F.col("event_id").alias("buy_id"), F.col("ts").alias("bts")
        )
        return clicks, buys

    sclicks, sbuys = split(stream_from_parquet_dir(spark, str(src / "ev"), schema))
    joined = stream_stream_interval_join(
        sclicks, sbuys, key="user_id", left_ts="cts", right_ts="bts",
        max_delay="10 minutes", watermark="30 minutes",
    )
    assert joined.isStreaming
    q = run_to_memory_sink(joined, "ssj_out")
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["click_id"], r["buy_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    bclicks, bbuys = split(batch)
    expected = {
        (r["user_id"], r["click_id"], r["buy_id"])
        for r in stream_stream_interval_join(
            bclicks, bbuys, key="user_id", left_ts="cts", right_ts="bts",
            max_delay="10 minutes", watermark="30 minutes",
        ).collect()
    }
    assert got == expected
    assert len(expected) > 50


def test_windowed_quality_stream_matches_batch(spark, tmp_path_factory):
    """Streaming quality-monitoring windows produce the identical
    result to the same plan in batch (same codegen'd per-doc features
    as operators.text.quality_features)."""
    from mdataframe_spark.streaming.windows import (
        run_to_memory_sink,
        stream_from_parquet_dir,
        windowed_quality_metrics,
    )

    src = tmp_path_factory.mktemp("doc_stream")
    texts = [
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "x",
        "a b c d e f g h i j k l m n o p q r s t the of and to in is",
        "!!! ??? ### $$$ %%%",
    ]
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.timestamp_micros(
            (F.lit(1700000000_000000) + F.col("id") * 60_000_000).cast("bigint")
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in texts]),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("payload"),
        (F.col("id") % 2).cast("string").alias("source"),
    )
    df.coalesce(2).write.mode("overwrite").parquet(str(src / "docs"))
    batch = spark.read.parquet(str(src / "docs"))

    stream = stream_from_parquet_dir(spark, str(src / "docs"), batch.schema)
    agg = windowed_quality_metrics(
        stream, window="1 hour", group_cols=("source",), min_quality=0.3
    )
    q = run_to_memory_sink(agg, "win_quality")
    q.awaitTermination(120)

    def key(r):
        return (r["window_start"], r["source"])

    def val(r):
        return (
            r["n_docs"],
            round(r["avg_quality"], 9),
            round(r["avg_tokens"], 9),
            round(r["keep_fraction"], 9),
        )

    got = {key(r): val(r) for r in spark.sql("SELECT * FROM win_quality").collect()}
    expected = {
        key(r): val(r)
        for r in windowed_quality_metrics(
            batch, window="1 hour", group_cols=("source",),
            min_quality=0.3, watermark=None,
        ).collect()
    }
    assert got == expected and got


def test_stream_duplicate_span_probe(spark, tmp_path):
    """Streaming ExactSubstr probe: docs arriving as micro-batches are
    checked against a static corpus k-gram index; the union of per-batch
    span frames equals the batch probe over all new docs at once."""
    from pyspark.sql import functions as F

    from mdataframe_spark.operators.dedup import (
        duplicate_spans_against,
        kgram_index,
    )
    from mdataframe_spark.streaming.ingest import stream_duplicate_span_probe

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, "stored alpha " + boiler), (2, "stored beta unique words only here")],
        ["doc_id", "text"],
    )
    idx = kgram_index(corpus, k=8)
    new_docs = spark.createDataFrame(
        [
            (100, "fresh one " + boiler + " tail"),
            (101, "clean document with nothing shared at all today"),
            (102, boiler + " leading copy"),
        ],
        ["doc_id", "text"],
    )
    src = tmp_path / "stream_src"
    new_docs.repartition(3).write.parquet(str(src))  # multiple files -> batches
    stream = spark.readStream.schema(new_docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))

    got = []

    def sink(spans, batch_id):
        got.extend(
            (r["doc_id"], r["span_start"], r["span_end"]) for r in spans.collect()
        )

    from mdataframe_spark import cache as _cache

    tracked_before = len(_cache._PERSISTED)
    jvm_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    q = stream_duplicate_span_probe(
        stream, idx, sink, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    # a LIVE stream never reaches a caller-side release_caches(), so the
    # probe must release each micro-batch's pinned k-gram frame itself —
    # three batches ran; zero net pinned blocks may remain
    assert len(_cache._PERSISTED) == tracked_before
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == jvm_before

    expect = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans_against(new_docs, idx).collect()
    }
    assert set(got) == expect
    assert any(d == 100 for d, *_ in got) and any(d == 102 for d, *_ in got)
    assert not any(d == 101 for d, *_ in got)


def test_char_entropy_stream_matches_batch(spark, tmp_path_factory):
    """char_entropy is a stateless Arrow-batched map, so it must apply
    to a readStream frame unchanged and agree with batch exactly —
    the plumbing check for running the quality-signal family inside a
    streaming ingest pipeline."""
    from mdataframe_spark.operators.text import char_entropy
    from mdataframe_spark.streaming.windows import (
        run_to_memory_sink,
        stream_from_parquet_dir,
    )

    src = tmp_path_factory.mktemp("docs_stream")
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("doc "), F.col("id").cast("string"),
            F.lit(" mississippi river "), F.repeat(F.lit("ab"), (F.col("id") % 5).cast("int")),
        ).alias("text"),
    )
    docs.coalesce(2).write.mode("overwrite").parquet(str(src / "docs"))
    batch = spark.read.parquet(str(src / "docs"))

    stream = stream_from_parquet_dir(spark, str(src / "docs"), batch.schema)
    scored = char_entropy(stream).select("doc_id", "char_entropy")
    q = run_to_memory_sink(scored, "stream_entropy")
    q.awaitTermination(120)

    got = {
        r["doc_id"]: r["char_entropy"]
        for r in spark.sql("SELECT * FROM stream_entropy").collect()
    }
    expected = {
        r["doc_id"]: r["char_entropy"]
        for r in char_entropy(batch).select("doc_id", "char_entropy").collect()
    }
    assert got == expected and len(got) == 200


def test_stream_static_enrich_matches_batch(spark, events_dir):
    """Stream-static dimension enrichment (streaming/joins.py
    stream_static_enrich): a streaming fact joined to a broadcast
    batch dimension must be stateless per micro-batch and agree with
    the batch join exactly — including left-join rows whose key has no
    dimension match."""
    from mdataframe_spark.streaming.joins import stream_static_enrich

    batch = spark.read.parquet(events_dir)
    # dimension covers only 2 of the 3 event types: the left join's
    # null arm is exercised
    dim = spark.createDataFrame(
        [("0", "browse"), ("1", "buy")], "event_type string, label string"
    )
    stream = stream_from_parquet_dir(spark, events_dir, batch.schema)
    enriched = stream_static_enrich(stream, dim, "event_type").select(
        "event_id", "event_type", "label"
    )
    assert enriched.isStreaming
    q = run_to_memory_sink(enriched, "enriched_events")
    q.awaitTermination(120)

    got = {
        r["event_id"]: (r["event_type"], r["label"])
        for r in spark.sql("SELECT * FROM enriched_events").collect()
    }
    expected = {
        r["event_id"]: (r["event_type"], r["label"])
        for r in stream_static_enrich(batch, dim, "event_type")
        .select("event_id", "event_type", "label")
        .collect()
    }
    assert got == expected and len(got) == 1000
    assert any(v[1] is None for v in got.values())  # unmatched type "2"


def test_merge_aggregates_equals_full_recompute(spark):
    from mdataframe_spark.operators.scd import merge_aggregates

    rows = [(k % 5, float(k)) for k in range(100)]
    df = spark.createDataFrame(rows, "k bigint, v double")

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    stored = agg(df.filter(F.col("v") < 70))
    delta = agg(df.filter(F.col("v") >= 70))
    merged = {
        r["k"]: (r["n"], r["sv"])
        for r in merge_aggregates(stored, delta, ["k"], ["sv"]).collect()
    }
    full = {r["k"]: (r["n"], r["sv"]) for r in agg(df).collect()}
    assert merged == full
    # delta-only keys survive the full-outer (new keys appear)
    stored2 = agg(df.filter(F.col("k") != 4).filter(F.col("v") < 70))
    merged2 = {
        r["k"]: r["n"]
        for r in merge_aggregates(stored2, delta, ["k"], ["sv"]).collect()
    }
    assert 4 in merged2


def test_count_min_stream_matches_batch(spark, tmp_path_factory):
    """The streaming Count-Min's running cell state after consuming the
    whole source equals the batch sketch over the same rows (cells are
    additive; state bounded at depth*width by construction, no
    watermark)."""
    from mdataframe_spark.operators.sketches import (
        count_min_cells,
        count_min_estimates,
    )
    from mdataframe_spark.streaming.sketches import count_min_stream

    src = tmp_path_factory.mktemp("cm_stream") / "events"
    df = spark.range(500).select(
        F.col("id").alias("event_id"),
        # zipf-ish key skew so some cells collide
        (F.col("id") % 37 * (F.col("id") % 3)).cast("string").alias("key"),
    )
    df.coalesce(4).write.mode("overwrite").parquet(str(src))
    batch = spark.read.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        count_min_stream(stream, "key", depth=3, width=64)
        .writeStream.format("memory").queryName("cm_cells")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["__row"], r["__b"]): r["__c"]
        for r in spark.sql("SELECT * FROM cm_cells").collect()
    }
    expected = {
        (r["__row"], r["__b"]): r["__c"]
        for r in count_min_cells(batch, "key", depth=3, width=64).collect()
    }
    assert streamed == expected and len(expected) > 10

    # estimates from either sketch agree (same cells, same probe math)
    probes = batch.select("key").distinct().limit(10)
    batch_est = {
        r["key"]: r["cm_estimate"]
        for r in count_min_estimates(
            batch, "key", probes, depth=3, width=64
        ).collect()
    }
    exact = {
        r["key"]: r["n"]
        for r in batch.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    for k, est in batch_est.items():
        assert est >= exact[k]


def test_cdc_stream_matches_batch_and_continues_from_checkpoint(
    spark, tmp_path_factory
):
    """The streaming CDC twin's running state equals the batch
    cdc_apply collapse after ANY prefix: (a) consuming change-log file
    A alone matches the batch collapse of A; (b) restarting from the
    SAME checkpoint after file B lands merges the new changes into the
    existing per-key max state and matches the batch collapse of A+B —
    max(struct) is associative/commutative, so checkpointed state +
    new micro-batches = one big batch."""
    from mdataframe_spark.operators.scd import cdc_apply
    from mdataframe_spark.streaming.cdc import cdc_stream

    root = tmp_path_factory.mktemp("cdc_stream")
    src = root / "changes"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "k bigint, seq bigint, op string, v string"

    def write_log(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # file A: inserts/updates for keys 1-4, delete for key 3
    a_rows = [
        (1, 1, "insert", "a1"),
        (1, 2, "update", "a2"),
        (2, 1, "insert", "b1"),
        (3, 1, "insert", "c1"),
        (3, 2, "delete", None),
        (4, 1, "insert", "d1"),
    ]
    write_log(a_rows, "a")

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            cdc_stream(stream, ["k"], ["seq"])
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["k"]: (r["seq"], r["v"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_state(rows):
        return {
            r["k"]: (r["seq"], r["v"])
            for r in cdc_apply(
                spark.createDataFrame(rows, schema), ["k"], ["seq"]
            ).collect()
        }

    got_a = run_stream("cdc_state_a")
    assert got_a == batch_state(a_rows)
    assert 3 not in got_a and got_a[1] == (2, "a2")

    # file B: key 3 reborn, key 4 tombstoned, key 1 late LOSING update
    b_rows = [
        (3, 3, "insert", "c2"),
        (4, 2, "delete", None),
        (1, 1, "update", "late-loser"),
        (5, 1, "insert", "e1"),
    ]
    write_log(b_rows, "b")
    got_ab = run_stream("cdc_state_ab")
    assert got_ab == batch_state(a_rows + b_rows)
    assert got_ab[3] == (3, "c2") and 4 not in got_ab
    # the late change with a lower seq must NOT displace key 1's state
    assert got_ab[1] == (2, "a2")


def test_rfm_stream_matches_batch_and_continues_from_checkpoint(
    spark, tmp_path_factory
):
    """The streaming RFM twin's running per-user state equals the
    batch rfm_state collapse after ANY prefix: max/count/decimal-sum
    are all associative+commutative, so checkpointed state + new
    micro-batches = one big batch. Monetary equality is EXACT (decimal
    monoid), including under late out-of-order events."""
    from mdataframe_spark.operators.events import rfm_state
    from mdataframe_spark.streaming.segments import rfm_stream

    root = tmp_path_factory.mktemp("rfm_stream")
    src = root / "events"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "user_id bigint, ts bigint, value double"
    H = 3_600_000_000_000

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    a_rows = [
        (1, 5 * H, 10.5),
        (1, 7 * H, None),
        (2, 1 * H, 0.12345),  # rounds to 4 dp once, then sums exactly
        (2, 2 * H, 0.12345),
    ]
    write_log(a_rows)

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            rfm_stream(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["user_id"]: (r["last_ts"], r["frequency"], r["monetary"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_state(rows):
        return {
            r["user_id"]: (r["last_ts"], r["frequency"], r["monetary"])
            for r in rfm_state(
                spark.createDataFrame(rows, schema)
            ).collect()
        }

    got_a = run_stream("rfm_state_a")
    assert got_a == batch_state(a_rows)
    assert got_a[1][0] == 7 * H and got_a[1][1] == 2

    # file B: LATE event for user 1 (earlier ts — max must not
    # regress), more spend for user 2, a brand-new user 3
    b_rows = [
        (1, 3 * H, 99.0),
        (2, 9 * H, 0.1231),
        (3, 4 * H, 7.0),
    ]
    write_log(b_rows)
    got_ab = run_stream("rfm_state_ab")
    assert got_ab == batch_state(a_rows + b_rows)
    assert got_ab[1][0] == 7 * H  # late lower ts lost the max
    assert got_ab[1][1] == 3  # but still counted
    assert 3 in got_ab


def test_benford_stream_matches_batch(spark, tmp_path_factory):
    """The streaming Benford twin's running digit counts equal the
    batch collapse (sum monoid, <= 9 state rows)."""
    from mdataframe_spark.operators.diagnostics import benford_digit_counts
    from mdataframe_spark.streaming.segments import benford_stream

    src = tmp_path_factory.mktemp("benford_stream") / "vals"
    df = spark.range(300).select(
        ((F.col("id") % 97 + 1) * 1.37).alias("x")
    )
    df.coalesce(3).write.mode("overwrite").parquet(str(src))
    batch = spark.read.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        benford_stream(stream, "x")
        .writeStream.format("memory")
        .queryName("benford_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["digit"]: r["n_observed"]
        for r in spark.sql("SELECT * FROM benford_counts").collect()
    }
    expected = {
        r["digit"]: r["n_observed"]
        for r in benford_digit_counts(batch, "x").collect()
    }
    assert streamed == expected
    assert sum(expected.values()) == 300


def test_completeness_stream_matches_batch_and_continues_from_checkpoint(
    spark, tmp_path_factory
):
    """The streaming completeness twin's running per-column profile
    equals the batch collapse (with_distinct=False arm) after ANY
    prefix: count and null-count are sum monoids, so checkpointed
    state + new micro-batches = one big batch. n_distinct is absent
    by design (streaming rejects exact distinct aggregation)."""
    from mdataframe_spark.operators.diagnostics import completeness_profile
    from mdataframe_spark.streaming.segments import completeness_stream

    root = tmp_path_factory.mktemp("completeness_stream")
    src = root / "rows"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "a bigint, b string, c double"

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    a_rows = [
        (1, "x", None),
        (None, "y", 2.5),
        (3, None, 2.5),
        (None, None, None),
    ]
    write_log(a_rows)

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            completeness_stream(stream, ["a", "b", "c"])
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["column_name"]: (r["n_rows"], r["n_null"], r["null_rate"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_state(rows):
        return {
            r["column_name"]: (r["n_rows"], r["n_null"], r["null_rate"])
            for r in completeness_profile(
                spark.createDataFrame(rows, schema),
                ["a", "b", "c"],
                with_distinct=False,
            ).collect()
        }

    got_a = run_stream("completeness_a")
    assert got_a == batch_state(a_rows)
    assert got_a["a"] == (4, 2, 0.5)

    b_rows = [(5, "z", 1.0), (None, "z", None)]
    write_log(b_rows)
    got_ab = run_stream("completeness_ab")
    assert got_ab == batch_state(a_rows + b_rows)
    assert got_ab["a"] == (6, 3, 0.5)
    assert got_ab["c"] == (6, 3, 0.5)


def test_completeness_stream_columns_are_monoid_subset(spark):
    """The twin's schema is exactly the batch profile minus
    n_distinct — nothing else drifts between the arms."""
    from mdataframe_spark.operators.diagnostics import completeness_profile
    from mdataframe_spark.streaming.segments import completeness_stream

    df = spark.createDataFrame([(1, "x")], "a bigint, b string")
    batch_cols = completeness_profile(df, ["a", "b"]).columns
    twin_cols = completeness_stream(df, ["a", "b"]).columns
    assert twin_cols == [c for c in batch_cols if c != "n_distinct"]


def test_user_spans_stream_matches_batch_and_continues_from_checkpoint(
    spark, tmp_path_factory
):
    """The KM sufficient-statistic twin: per-user (min first_ts,
    max last_ts, boolean-max converted) are all monoids, so
    checkpointed state + new micro-batches = one big batch — including
    under late out-of-order events and a conversion arriving after
    the user was first seen."""
    from mdataframe_spark.operators.survival import user_event_spans
    from mdataframe_spark.streaming.segments import user_spans_stream

    root = tmp_path_factory.mktemp("user_spans_stream")
    src = root / "events"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "user_id bigint, ts bigint, event_type string"
    H = 3_600_000_000_000

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    a_rows = [
        (1, 2 * H, "view"),
        (1, 5 * H, "click"),
        (2, 1 * H, "view"),
    ]
    write_log(a_rows)

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            user_spans_stream(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["user_id"]: (r["first_ts"], r["last_ts"], r["converted"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_state(rows):
        return {
            r["user_id"]: (r["first_ts"], r["last_ts"], r["converted"])
            for r in user_event_spans(
                spark.createDataFrame(rows, schema)
            ).collect()
        }

    got_a = run_stream("user_spans_a")
    assert got_a == batch_state(a_rows)
    assert got_a[1] == (2 * H, 5 * H, 0)

    # file B: late earlier event for user 1 (min must regress), a
    # conversion for user 2, a new user 3
    b_rows = [
        (1, 1 * H, "view"),
        (2, 6 * H, "purchase"),
        (3, 4 * H, "view"),
    ]
    write_log(b_rows)
    got_ab = run_stream("user_spans_ab")
    assert got_ab == batch_state(a_rows + b_rows)
    assert got_ab[1] == (1 * H, 5 * H, 0)
    assert got_ab[2][2] == 1
    assert 3 in got_ab


def test_ab_counts_stream_matches_batch_and_continues_from_checkpoint(
    spark, tmp_path_factory
):
    """The experiment-counter twin: per-variant n/conversions are sum
    monoids, so checkpointed state + new micro-batches = one big
    batch; a brand-new variant appears in the state as soon as its
    first event lands."""
    from mdataframe_spark.operators.experiments import variant_counts
    from mdataframe_spark.streaming.segments import ab_counts_stream

    root = tmp_path_factory.mktemp("ab_counts_stream")
    src = root / "events"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "variant string, converted int"

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    a_rows = [("control", 1), ("control", 0), ("t1", 0), ("t1", 1),
              ("t1", 1)]
    write_log(a_rows)

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            ab_counts_stream(stream, "variant", "converted")
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["variant"]: (r["n"], r["conversions"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_state(rows):
        return {
            r["variant"]: (r["n"], r["conversions"])
            for r in variant_counts(
                spark.createDataFrame(rows, schema), "variant", "converted"
            ).collect()
        }

    got_a = run_stream("ab_counts_a")
    assert got_a == batch_state(a_rows) == {
        "control": (2, 1), "t1": (3, 2)
    }

    b_rows = [("control", 1), ("t2", 0)]
    write_log(b_rows)
    got_ab = run_stream("ab_counts_ab")
    assert got_ab == batch_state(a_rows + b_rows)
    assert got_ab["control"] == (3, 2) and got_ab["t2"] == (1, 0)


def test_paired_flags_stream_matches_batch_and_continues_from_checkpoint(
    spark, tmp_path_factory
):
    """The McNemar sufficient-statistic twin: per-user pre/post
    conversion flags around a fixed boundary are boolean-max monoids,
    so checkpointed state + new micro-batches = one big batch —
    including a late pre-period conversion arriving after the user
    already converted post-period."""
    from mdataframe_spark.operators.experiments import (
        paired_conversion_state,
    )
    from mdataframe_spark.streaming.segments import paired_flags_stream

    root = tmp_path_factory.mktemp("paired_flags_stream")
    src = root / "events"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "user_id bigint, ts bigint, event_type string"
    H = 3_600_000_000_000
    BOUNDARY = 5 * H

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    a_rows = [
        (1, 2 * H, "purchase"),
        (1, 7 * H, "view"),
        (2, 6 * H, "purchase"),
        (3, 1 * H, "view"),
    ]
    write_log(a_rows)

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            paired_flags_stream(stream, BOUNDARY)
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["user_id"]: (r["pre"], r["post"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_state(rows):
        return {
            r["user_id"]: (r["pre"], r["post"])
            for r in paired_conversion_state(
                spark.createDataFrame(rows, schema), BOUNDARY
            ).collect()
        }

    got_a = run_stream("paired_flags_a")
    assert got_a == batch_state(a_rows)
    assert got_a[1] == (1, 0) and got_a[2] == (0, 1) and got_a[3] == (0, 0)

    # file B: user 2's LATE pre-period purchase (pre must flip to 1
    # from checkpointed state), user 3 converts post, new user 4
    b_rows = [
        (2, 3 * H, "purchase"),
        (3, 9 * H, "purchase"),
        (4, 8 * H, "view"),
    ]
    write_log(b_rows)
    got_ab = run_stream("paired_flags_ab")
    assert got_ab == batch_state(a_rows + b_rows)
    assert got_ab[2] == (1, 1)
    assert got_ab[3] == (0, 1)
    assert got_ab[4] == (0, 0)


def test_null_patterns_stream_matches_batch_and_continues(
    spark, tmp_path_factory
):
    """Co-missingness pattern counts are pure COUNT monoids: the
    running per-mask counts after any prefix of micro-batches equal
    the batch mask groupBy over the same rows."""
    from mdataframe_spark.streaming.segments import null_patterns_stream

    root = tmp_path_factory.mktemp("null_patterns_stream")
    src = root / "events"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "a double, b string"

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def batch_counts(rows):
        from pyspark.sql import functions as F

        d = spark.createDataFrame(rows, schema)
        mask = F.concat(
            F.when(F.col("a").isNull(), F.lit("1")).otherwise(F.lit("0")),
            F.when(F.col("b").isNull(), F.lit("1")).otherwise(F.lit("0")),
        )
        return {
            r["pattern"]: r["n"]
            for r in d.select(mask.alias("pattern"))
            .groupBy("pattern")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            null_patterns_stream(stream, ["a", "b"])
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["pattern"]: r["n_rows"]
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    a_rows = [(1.0, "x"), (None, "y"), (2.0, None), (None, None)]
    write_log(a_rows)
    got_a = run_stream("nullpat_a")
    assert got_a == batch_counts(a_rows)

    b_rows = [(None, "z"), (3.0, "w"), (None, None), (None, None)]
    write_log(b_rows)
    got_ab = run_stream("nullpat_ab")
    assert got_ab == batch_counts(a_rows + b_rows)
    assert got_ab["11"] == 3


def test_drift_stream_matches_batch_and_continues_from_checkpoint(
    spark, tmp_path_factory
):
    """The Wasserstein-1 drift twin (round-12): per-value-block pooled
    and TRUE-group counts are SUM monoids, so checkpointed state + new
    micro-batches = one big batch; and the W1 computed FROM the
    streamed state (via the shared batch machinery) equals the batch
    wasserstein_1d over the same rows."""
    from mdataframe_spark.operators.stats_tests import (
        drift_value_blocks,
        wasserstein_1d,
    )
    from mdataframe_spark.streaming.segments import drift_stream

    root = tmp_path_factory.mktemp("drift_stream")
    src = root / "events"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "v double, g boolean"

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            drift_stream(stream, "v", "g")
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["value_block"]: (r["n"], r["n_true"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_blocks(rows):
        return {
            r["value_block"]: (r["n"], r["n_true"])
            for r in drift_value_blocks(
                spark.createDataFrame(rows, schema), "v", "g"
            ).collect()
        }

    a_rows = [
        (1.0, True), (1.0, False), (2.5, True),
        (2.5, True), (4.0, False), (None, True), (3.0, None),
    ]
    write_log(a_rows)
    got_a = run_stream("drift_a")
    assert got_a == batch_blocks(a_rows)
    assert got_a[10000] == (2, 1)  # 1.0 scaled by 1e4

    b_rows = [(1.0, True), (7.25, False), (2.5, False)]
    write_log(b_rows)
    got_ab = run_stream("drift_ab")
    assert got_ab == batch_blocks(a_rows + b_rows)
    assert got_ab[10000] == (3, 2)
    assert got_ab[25000] == (3, 2)

    # foreachBatch read-out: W1 from the streamed state equals the
    # batch wasserstein over the raw rows (reconstruct per-row frame
    # from the block counts — exact, the blocks ARE the statistic)
    rebuilt = [
        (vb / 10000.0, i < t1)
        for vb, (n, t1) in got_ab.items()
        for i in range(n)
    ]
    w_state = wasserstein_1d(
        spark.createDataFrame(rebuilt, "v double, g boolean"), "v", "g"
    ).collect()[0]["wasserstein"]
    clean = [(v, g) for v, g in a_rows + b_rows
             if v is not None and g is not None]
    w_batch = wasserstein_1d(
        spark.createDataFrame(clean, "v double, g boolean"), "v", "g"
    ).collect()[0]["wasserstein"]
    assert w_state == w_batch


def test_conversion_lag_stream_matches_batch_and_continues(
    spark, tmp_path_factory
):
    """The conversion-lag twin (round-12): per-user conditional first
    view/first purchase timestamps are MIN monoids, so checkpointed
    state + new micro-batches = one big batch — including a LATE
    earlier view arriving after the user already converted, which must
    pull first_from_ts back and lengthen the lag."""
    from mdataframe_spark.operators.events import (
        conversion_lag,
        user_conversion_spans,
    )
    from mdataframe_spark.streaming.segments import conversion_lag_stream

    root = tmp_path_factory.mktemp("conversion_lag_stream")
    src = root / "events"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "user_id bigint, ts bigint, event_type string"
    H = 3_600_000_000_000

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            conversion_lag_stream(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["user"]: (r["first_from_ts"], r["first_to_ts"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_state(rows):
        return {
            r["user"]: (r["first_from_ts"], r["first_to_ts"])
            for r in user_conversion_spans(
                spark.createDataFrame(rows, schema)
            ).collect()
        }

    a_rows = [
        (1, 4 * H, "view"), (1, 9 * H, "purchase"),
        (2, 2 * H, "view"),
        (3, 5 * H, "purchase"),
    ]
    write_log(a_rows)
    got_a = run_stream("convlag_a")
    assert got_a == batch_state(a_rows)
    assert got_a[1] == (4 * H, 9 * H)

    # file B: user 1's LATE earlier view (first_from pulls back),
    # user 2 converts, user 3 gets a view AFTER its purchase
    b_rows = [
        (1, 1 * H, "view"),
        (2, 7 * H, "purchase"),
        (3, 8 * H, "view"),
    ]
    write_log(b_rows)
    got_ab = run_stream("convlag_ab")
    assert got_ab == batch_state(a_rows + b_rows)
    assert got_ab[1] == (1 * H, 9 * H)

    # foreachBatch read-out: the lag summary computed FROM the state
    # (reconstructed as events) equals batch conversion_lag on the raw
    # rows — user 3's purchase-before-view stays NOT converted
    rebuilt = [
        (u, t0, "view") for u, (t0, t1) in got_ab.items() if t0 is not None
    ] + [
        (u, t1, "purchase") for u, (t0, t1) in got_ab.items() if t1 is not None
    ]
    from_state = conversion_lag(
        spark.createDataFrame(rebuilt, schema)
    ).collect()[0]
    from_raw = conversion_lag(
        spark.createDataFrame(a_rows + b_rows, schema)
    ).collect()[0]
    assert from_state == from_raw
    assert from_raw["n_converted"] == 2  # users 1 and 2, not 3


def test_ingest_gaps_stream_matches_batch_and_continues(
    spark, tmp_path_factory
):
    """The ingest-gaps twin (round-13): per-bucket observed counts are
    COUNT monoids, so checkpointed state + new micro-batches = one big
    batch; and the gap audit computed FROM the streamed state (via the
    shared batch machinery) equals the batch ingest_gaps over the raw
    rows."""
    from mdataframe_spark.operators.diagnostics import (
        ingest_gaps,
        observed_buckets,
    )
    from mdataframe_spark.streaming.segments import ingest_gaps_stream

    root = tmp_path_factory.mktemp("ingest_gaps_stream")
    src = root / "events"
    ckpt = root / "ckpt"
    src.mkdir()
    schema = "ts bigint"
    H = 3_600_000_000_000

    def write_log(hours):
        spark.createDataFrame(
            [(h * H + 17,) for h in hours], schema
        ).coalesce(1).write.mode("append").parquet(str(src))

    def run_stream(qname):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            ingest_gaps_stream(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["bucket"]: r["n"]
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    def batch_buckets(hours):
        return {
            r["bucket"]: r["n"]
            for r in observed_buckets(
                spark.createDataFrame([(h * H + 17,) for h in hours], schema)
            ).collect()
        }

    a_hours = [0, 0, 1, 2, 5]
    write_log(a_hours)
    got_a = run_stream("gaps_a")
    assert got_a == batch_buckets(a_hours)
    assert got_a[0] == 2

    b_hours = [5, 9, 9, 9]
    write_log(b_hours)
    got_ab = run_stream("gaps_ab")
    assert got_ab == batch_buckets(a_hours + b_hours)
    assert got_ab[5] == 2 and got_ab[9] == 3

    # foreachBatch read-out: the gap audit from the streamed state
    # equals the batch ingest_gaps over the raw rows (the buckets ARE
    # the statistic — counts don't enter the audit)
    rebuilt = spark.createDataFrame(
        [(b * H,) for b in got_ab], schema
    )
    from_state = ingest_gaps(rebuilt).collect()[0]
    from_batch = ingest_gaps(
        spark.createDataFrame(
            [(h * H + 17,) for h in a_hours + b_hours], schema
        )
    ).collect()[0]
    assert from_state == from_batch
    assert from_state["max_gap_run"] == 3
    assert from_state["n_missing"] == 5


def test_vocab_growth_stream_matches_batch_and_continues(
    spark, tmp_path_factory
):
    """The Heaps'-law twin pair (round-13): per-token first-occurrence
    buckets are MIN monoids and per-bucket token counts SUM monoids,
    so checkpointed state + new micro-batches = one big batch — and
    the Heaps fit replayed FROM the two streamed states equals the
    batch heaps_law_fit over the same rows."""
    import math as _math

    from mdataframe_spark.operators.text import (
        bucket_token_counts,
        heaps_law_fit,
        token_first_buckets,
    )
    from mdataframe_spark.streaming.segments import (
        bucket_tokens_stream,
        vocab_growth_stream,
    )

    root = tmp_path_factory.mktemp("vocab_growth_stream")
    src = root / "docs"
    ck1 = root / "ck1"
    ck2 = root / "ck2"
    src.mkdir()
    schema = "doc_id bigint, text string"
    B = 8

    def write_log(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_stream(fn, ckpt, qname, key_cols):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            fn(stream, n_buckets=B)
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            tuple(r[c] for c in key_cols[:-1]) if len(key_cols) > 2
            else r[key_cols[0]]: r[key_cols[-1]]
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    a_rows = [(i, f"alpha beta tok{i}") for i in range(6)]
    write_log(a_rows)
    batch_a = spark.createDataFrame(a_rows, schema)
    got_first = run_stream(
        vocab_growth_stream, ck1, "vocab_a", ["token", "first_bucket"]
    )
    want_first = {
        r["token"]: r["first_bucket"]
        for r in token_first_buckets(batch_a, n_buckets=B).collect()
    }
    assert got_first == want_first

    b_rows = [(i, f"alpha gamma tok{i}") for i in range(6, 10)]
    write_log(b_rows)
    batch_ab = spark.createDataFrame(a_rows + b_rows, schema)
    got_first2 = run_stream(
        vocab_growth_stream, ck1, "vocab_ab", ["token", "first_bucket"]
    )
    want_first2 = {
        r["token"]: r["first_bucket"]
        for r in token_first_buckets(batch_ab, n_buckets=B).collect()
    }
    assert got_first2 == want_first2
    got_counts = run_stream(
        bucket_tokens_stream, ck2, "btok_ab", ["bucket", "n_tokens"]
    )
    want_counts = {
        r["bucket"]: r["n_tokens"]
        for r in bucket_token_counts(batch_ab, n_buckets=B).collect()
    }
    assert got_counts == want_counts

    # foreachBatch read-out: the Heaps fit replayed from the two
    # streamed states (spine + cumulative + closed-form OLS, the
    # heaps_law_fit arithmetic) equals the batch fit over the raw rows
    first_per_bucket = {}
    for b in got_first2.values():
        first_per_bucket[b] = first_per_bucket.get(b, 0) + 1
    cn = cv = 0
    xs, ys = [], []
    n_tok = vocab = 0
    for b in range(B):
        cn += got_counts.get(b, 0)
        cv += first_per_bucket.get(b, 0)
        if cn > 0 and cv > 0:
            xs.append(_math.log(cn))
            ys.append(_math.log(cv))
        n_tok, vocab = cn, cv
    nb = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = (nb * sxy - sx * sy) / (nb * sxx - sx * sx)
    k = _math.exp((sy - beta * sx) / nb)
    got_fit = heaps_law_fit(batch_ab, n_buckets=B).collect()[0]
    assert got_fit["n_tokens"] == n_tok and got_fit["vocab_size"] == vocab
    assert got_fit["heaps_beta"] == pytest.approx(beta, abs=1e-6)
    assert got_fit["heaps_k"] == pytest.approx(k, abs=1e-6)
