"""Multimodal column plumbing — [EXT] SURVEY.md §2.11.

Images/audio/video are carried as opaque ``BINARY`` payloads plus a
typed metadata struct; decode / feature-extraction runs as an
Arrow-batched ``mapInPandas`` stage.  The media codec libraries are
not in this container, so the decode kernel is a clearly-marked
deterministic STUB — the Spark-side contract (schema, batch shape,
partition behavior) is real and tested, and a real decoder drops in by
replacing the ``feat`` kernel inside ``decode_features`` only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def to_media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap documents as a multimodal table: binary payload + metadata
    struct. (Stand-in for real image/audio bytes; layout is the real
    contract — opaque BINARY + typed meta travels columnar in parquet.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage over the multimodal table.

    ``mapInPandas`` keeps whole Arrow batches per call — the right
    shape for byte-heavy columns (per-row UDFs would re-serialize each
    payload individually).

    The kernel closure is deliberately self-contained (stdlib + pandas
    only): Spark pickles module-level references by *module name*, and
    the Python workers of a consumer session (the driver harness) do
    not have this repo on their ``sys.path``.
    """
    feature_dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def feat(b: bytes) -> list[float]:
            if not b:
                return [0.0] * feature_dim
            return [float(sum(b[i::feature_dim]) % 997) / 997.0 for i in range(feature_dim)]

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "feature": pdf["payload"].map(feat),
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_payloads(media: DataFrame, target_bytes: int = 128) -> DataFrame:
    """Arrow-batched resize stage: every payload is brought to at most
    ``target_bytes`` (STUB: deterministic byte truncation — a real
    image/audio resampler replaces the ``shrink`` kernel only; the
    schema contract of emitting a *new* payload plus before/after
    sizes is the real part).  Map-side only — resizing 100 TB of media
    shuffles nothing."""
    tb = int(target_bytes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def shrink(b: bytes) -> bytes:
            return bytes(b[:tb]) if b else b""

        for pdf in batches:
            out = pdf["payload"].map(shrink)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "orig_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "n_bytes": out.map(len),
                }
            )

    return media.mapInPandas(
        run, schema="doc_id long, payload binary, orig_bytes int, n_bytes int"
    )


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Arrow-batched frame-sampling stage: each payload (a stand-in
    video byte stream) emits up to ``n_frames`` evenly-spaced fixed-
    width windows — the 1→N row-expansion shape a real frame sampler
    needs from ``mapInPandas`` (the generator yields more rows than it
    receives).  Offsets are pure arithmetic over the payload length:
    floor(i·(n−w)/(k−1)), one frame at 0 when the payload is shorter
    than a frame.  STUB only in what the bytes mean; slicing, batch
    fan-out and schema are the real contract."""
    k, w = int(n_frames), int(frame_bytes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def offsets(n: int) -> list[int]:
            if n <= w:
                return [0]
            return [((n - w) * i) // (k - 1) for i in range(k)]

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = payload or b""
                for idx, off in enumerate(offsets(len(b))):
                    rows.append((doc_id, idx, off, bytes(b[off : off + w])))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "offset", "frame"]
            )

    return media.mapInPandas(
        run, schema="doc_id long, frame_idx int, offset long, frame binary"
    )
