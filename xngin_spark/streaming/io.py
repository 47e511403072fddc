"""Streaming sources & sinks.

File-stream source over the driver's events parquet. Streaming reads
REQUIRE an explicit schema (no inference mid-stream) — consistent with
the engine-wide schema-pinned policy (sources/readers.py).

The events parquet stores TIMESTAMP(MICROS, isAdjustedToUTC=false),
which maps to TimestampNTZType — zoneless event time, same as the
batch loader (xngin_spark.catalog.events_df). Spark's watermark
operator requires tz-adjusted TIMESTAMP event time
(EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), so the source reinterprets
NTZ as UTC on ingest (``to_event_time``) and windowed emitters convert
bounds back to naive NTZ (``to_naive``) — both pure integer-micros
reinterpretations, independent of ``spark.sql.session.timeZone``, so
collected values match the zoneless batch/oracle answer in ANY session.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def to_event_time(col: str) -> Column:
    """TIMESTAMP_NTZ → TIMESTAMP by UTC reinterpretation (not the
    session-tz cast): epoch micros := naive micros. Tz-independent."""
    return F.expr(f"timestamp_micros(timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col}))")


def to_naive(col: str) -> Column:
    """TIMESTAMP → TIMESTAMP_NTZ by UTC reinterpretation — inverse of
    ``to_event_time``; emitted window bounds become zoneless again."""
    return F.expr(f"timestampadd(MICROSECOND, unix_micros({col}), {_NTZ_EPOCH})")

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),  # TIMESTAMP(MICROS), zoneless
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None,
) -> DataFrame:
    """Schema-pinned parquet file stream; a single-file path is narrowed
    to its directory with a glob (FileStreamSource only lists dirs)."""
    import os

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def documents_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream over documents parquet (ingest-pipeline source):
    same schema-pinned, glob-narrowed reader as ``events_stream`` minus
    the event-time reinterpretation (documents carry no timestamp)."""
    return _file_stream(spark, path, DOCS_SCHEMA, max_files_per_trigger)


EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def embeddings_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream over embeddings parquet (vector-ingest source):
    schema-pinned like ``documents_stream`` — incoming vectors arrive
    as files dropped by an upstream encoder job."""
    return _file_stream(spark, path, EMB_SCHEMA, max_files_per_trigger)


def events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream over a directory of events parquet files.

    ``max_files_per_trigger`` paces ingestion into multiple micro-batches
    (tests use it to exercise cross-batch watermark advancement; in
    production it is the backpressure knob).
    """
    return _file_stream(spark, path, EVENTS_SCHEMA, max_files_per_trigger).withColumn(
        "ts", to_event_time("ts")
    )


def to_memory_sink(
    sdf: DataFrame,
    name: str,
    output_mode: str = "append",
    checkpoint_location: str | None = None,
):
    """Start ``sdf`` into an in-memory table (test/demo sink) with an
    availableNow trigger: process everything currently in the source,
    respecting maxFilesPerTrigger pacing, then stop.

    ``checkpoint_location``: pass an explicit dir to OWN the checkpoint
    lifecycle. Without it Spark creates a temp checkpoint and deletes
    it asynchronously, best-effort, AFTER the query ends — that
    background small-file I/O lands on whatever query runs next (and
    leaks the dir entirely on a crash)."""
    w = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_location is not None:
        w = w.option("checkpointLocation", checkpoint_location)
    return w.start()


def run_available_now(
    sdf: DataFrame,
    name: str,
    output_mode: str = "append",
    timeout_s: int | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Run the stream to exhaustion and return the sink table.

    Raises TimeoutError if the availableNow run doesn't finish in
    ``timeout_s`` — returning a partially-populated sink while the query
    keeps running in the background would silently truncate results.
    Default is the XNGIN_STREAM_TIMEOUT_S env var, else 120s: the gate
    scales finish in seconds, but an sf10 probe sharing the host with
    another run can legitimately cross a fixed 120s (observed: a 75s
    clean-host stream timing out under suite contention) — the knob
    lets the probe stretch the bound without touching registrations.

    ``shuffle_partitions`` right-sizes the state store for this run:
    each stateful-operator partition carries fixed store overhead, so a
    small stream on a 32-way default pays 4-10x in pure bookkeeping
    (measured ~10s → ~3s on the stream-stream join at sf0.1). The conf
    is read at query START and baked into the checkpoint, so setting it
    around ``start()`` is exact; it is restored afterwards. Size it up
    with state volume on a real cluster — it is a knob, not a shape.

    ``name`` should be STABLE per call site (not uuid-suffixed): the
    memory sink registers a session-scoped temp view, and a fresh name
    per invocation accumulates dead views across a long bench/service
    session. A stable name is re-registered in place; any previous view
    under it is dropped first so re-runs can't read a stale sink. An
    ACTIVE query already using the name raises instead of aliasing.
    """
    spark = sdf.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            raise ValueError(
                f"streaming query {name!r} is still active — memory-sink "
                "names must be unique among running queries"
            )
    spark.catalog.dropTempView(name)
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key) if shuffle_partitions is not None else None
    if shuffle_partitions is not None:
        spark.conf.set(key, str(shuffle_partitions))
    # own the checkpoint dir and delete it SYNCHRONOUSLY after the run:
    # Spark's auto temp checkpoint is removed by a background thread
    # after query end, and that small-file I/O burst lands on the NEXT
    # query's wall time (measured ~0.5-1s on the bench neighbor of each
    # streaming query). Paying it here keeps cost attribution honest
    # and never leaks the dir on a crash.
    import os
    import shutil
    import tempfile

    if timeout_s is None:
        raw = os.environ.get("XNGIN_STREAM_TIMEOUT_S", "120")
        try:
            timeout_s = int(raw)
        except ValueError:
            # a typo'd knob must read as a config warning, not as a
            # ValueError deep inside every streaming query (ADVICE r9)
            import warnings

            warnings.warn(
                f"XNGIN_STREAM_TIMEOUT_S={raw!r} is not an integer; "
                "falling back to 120s",
                stacklevel=2,
            )
            timeout_s = 120
    ckpt = tempfile.mkdtemp(prefix=f"xngin-ckpt-{name}-")
    sink = os.environ.get("XNGIN_STREAM_SINK", "memory").lower()
    try:
        if sink == "parquet":
            # File-sink twin for scales where the memory sink's
            # collect-everything-on-heap shape is the bottleneck: the
            # sf100 state twins OOM'd a 28g JVM not on streaming STATE
            # (RocksDB moves that off-heap) but on the ~100M-row memory
            # sink itself. A parquet sink is the production shape —
            # results land on disk, the returned frame reads them back.
            # append-mode streams write through the native parquet
            # sink; complete-mode output replaces per trigger, which
            # foreachBatch mirrors with an overwrite write (availableNow
            # → the final batch wins, exactly the memory-sink table).
            base = os.environ.get(
                "XNGIN_STREAM_SINK_DIR", "/tmp/xngin_stream_sink"
            )
            out_dir = os.path.join(base, name)
            shutil.rmtree(out_dir, ignore_errors=True)
            os.makedirs(out_dir, exist_ok=True)
            if output_mode == "append":
                q = (
                    sdf.writeStream.format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
            else:
                q = (
                    sdf.writeStream.foreachBatch(
                        lambda df, _bid: df.write.mode("overwrite").parquet(
                            out_dir
                        )
                    )
                    .option("checkpointLocation", ckpt)
                    .outputMode(output_mode)
                    .trigger(availableNow=True)
                    .start()
                )
            if not q.awaitTermination(timeout_s):
                q.stop()
                raise TimeoutError(
                    f"stream {name!r} did not finish in {timeout_s}s"
                )
            try:
                return spark.read.schema(sdf.schema).parquet(out_dir)
            except Exception:
                return spark.createDataFrame([], sdf.schema)
        q = to_memory_sink(sdf, name, output_mode, checkpoint_location=ckpt)
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(f"stream {name!r} did not finish in {timeout_s}s")
    finally:
        if old is not None:
            spark.conf.set(key, old)
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.streams.resetTerminated()
    return spark.table(name)
