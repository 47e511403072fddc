"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas iterators.

The 100 TB-shape contract: media (image/audio/video) travels as a
``binary`` column with a metadata struct beside it; per-item work
(decode, resize, frame-sample, feature-extract) runs in ``mapInPandas``
so bytes move driver-free, Arrow-batched, partition-parallel. The
actual codecs (PIL/ffmpeg/...) are NOT in this container, so the decode
step is stubbed behind ``XNGIN_FAKE_DECODE`` — a deterministic fake
that exercises the real plumbing (schema, batching, UDF signature)
end-to-end. Swap `_decode_stub` for a real decoder in production; the
Spark side does not change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas imported lazily inside the UDF workers
    import pandas as pd

XNGIN_FAKE_DECODE = True  # no image/audio libs in this container

# Output schema of the decode/feature pass — fixed and explicit so the
# downstream plan is stable regardless of decoder implementation.
MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def as_media_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Model a binary-payload table: payload (binary) + metadata struct.

    On real data the payload is the stored media blob; here we encode
    the text column so the pipeline is runnable in this container.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).cast("long").alias("n_chars"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decoder': 4 floats derived from the bytes.

    Replace with real decode (e.g. PIL.Image.open → resize → pixel
    stats) in production.
    """
    if not XNGIN_FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real media decoding requires codec libs")
    n = len(payload)
    s = sum(payload)
    return [float(n), float(payload[0] if n else 0), float(s % 997), float(s % 31)]


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode/feature pass: Iterator[pd.DataFrame] →
    Iterator[pd.DataFrame], Arrow both ways.

    Partition-parallel; each batch is a pandas DataFrame of
    (doc_id, payload) — the iterator form amortizes per-batch overhead
    and never materializes a partition in memory at once.
    """

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else 0),
                    "checksum": payloads.map(lambda b: sum(b) % 997),
                    "feature": payloads.map(_decode_stub),
                }
            )

    from xngin_spark.operators.util import fan_out

    # pandas decode is the expensive stage — spread single-row-group
    # inputs across cores before entering Python
    return fan_out(media.select("doc_id", "payload")).mapInPandas(
        process, MEDIA_FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: one output row per sampled offset —
    the row-explosion shape of video frame extraction (1 input → N
    frames), with deterministic fake frames (byte windows).

    JVM-side explode of offsets; only the per-frame payload slice is
    produced, so downstream stages shuffle frames, not full blobs.
    """
    offsets = F.sequence(
        F.lit(0),
        F.least(
            F.greatest((F.length("payload") / every_n_bytes).cast("int") - 1, F.lit(0)),
            F.lit(max_frames - 1),
        ),
    )
    return media.select(
        "doc_id",
        F.explode_outer(offsets).alias("frame_no"),
        F.substring(
            F.col("payload"), F.col("frame_no") * every_n_bytes + 1, every_n_bytes
        ).alias("frame_bytes"),
    ).filter(F.col("frame_no").isNotNull())


RESIZE_TARGET = 64

MEDIA_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized_len", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_media(media: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """'Resize' pass: deterministic strided downsample of the payload to
    at most ``target`` bytes — the image-resize shape (full blob in,
    small fixed-size representation out) with the same mapInPandas
    plumbing a real `PIL.Image.resize` would use. Downstream stages
    shuffle ``target``-byte rows instead of blobs, which is the entire
    point of resizing early at 100 TB."""

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        def shrink(b: bytes) -> bytes:
            step = max(len(b) // target, 1)
            return b[::step][:target]

        for pdf in batches:
            small = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized_len": small.map(len),
                    "resized_md5": small.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    from xngin_spark.operators.util import fan_out

    return fan_out(media.select("doc_id", "payload")).mapInPandas(
        process, MEDIA_RESIZE_SCHEMA
    )


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_no", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)

AUDIO_WINDOW = 64  # fake-PCM samples (bytes) per analysis window


def audio_window_energy(media: DataFrame, window: int = AUDIO_WINDOW) -> DataFrame:
    """Audio-shaped pass: windowed energy over the decoded sample
    stream — the VAD / silence-trim / loudness-normalization primitive.
    Bytes stand in for PCM samples under the fake decode (sum of
    squared sample values per fixed window, exact integers so the
    DuckDB oracle matches bit-for-bit); swap the byte view for a real
    ``audioop``/ffmpeg decode in production — the Spark side (schema,
    Arrow batching, per-window explode) does not change.

    Trailing partial windows are emitted with their true n_samples —
    dropping them silently would bias energy statistics.
    """

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            wins: list[int] = []
            ns: list[int] = []
            es: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = bytes(payload)
                if not XNGIN_FAKE_DECODE:  # pragma: no cover
                    raise NotImplementedError("real audio decode needs codec libs")
                for w in range(0, max(len(samples), 1), window):
                    chunk = samples[w : w + window]
                    ids.append(int(doc_id))
                    wins.append(w // window)
                    ns.append(len(chunk))
                    es.append(sum(b * b for b in chunk))
            yield pd.DataFrame(
                {"doc_id": ids, "window_no": wins, "n_samples": ns, "energy": es}
            )

    return media.select("doc_id", "payload").mapInPandas(process, AUDIO_ENERGY_SCHEMA)
