"""Multimodal column plumbing — [EXT] SURVEY.md §2.11.

Images/audio/video are carried as opaque ``BINARY`` payloads plus a
typed metadata struct; decode / feature-extraction runs as an
Arrow-batched ``mapInPandas`` stage.  The media codec libraries are
not in this container, so the image path defines its own RAWRGB
format (8-byte header + interleaved uint8 RGB pixels, below) and
``decode_raw_rgb`` is a REAL decoder for it: header validation, dim
parsing, numpy channel statistics — arithmetic a DuckDB oracle pins
value-for-value.  A jpeg/png/webp decoder for external corpora drops
in beside it with the same mapInPandas shape; ``resize_payloads`` /
``frame_sample`` remain geometry-real byte-level stand-ins for
resampling/frame extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# --- RAWRGB: the in-repo raster format -------------------------------
#
# layout:  b'RG' | width uint16 BE | height uint16 BE | channels uint8
#          | pad uint8 | width*height*channels interleaved uint8 pixels
#
# Deliberately trivial to encode from any engine (8 header bytes +
# arithmetic pixels), so decode output is oracle-checkable end-to-end
# while the kernel still does everything a real raster decoder does:
# magic validation, header parsing, reshape, channel statistics.

RAW_RGB_MAGIC = b"RG"
RAW_RGB_MIME = "image/x-raw-rgb"


def to_raw_rgb_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a RAWRGB media table keyed by ``doc_id``: dims vary
    per document (width = 8 + id%5, height = 6 + id%7, 3 channels) and
    pixel i carries ``(doc_id*31 + i*7) % 256`` — deterministic
    arithmetic any engine can reproduce, so a decoder downstream is
    value-checkable.  Map-side mapInPandas; payload bytes are built on
    executors, never the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def make(doc_id: int) -> bytes:
            w, h, c = 8 + doc_id % 5, 6 + doc_id % 7, 3
            idx = _np.arange(w * h * c, dtype=_np.int64)
            px = ((doc_id * 31 + idx * 7) % 256).astype(_np.uint8)
            hdr = (
                b"RG"
                + int(w).to_bytes(2, "big")
                + int(h).to_bytes(2, "big")
                + bytes([c, 0])
            )
            return hdr + px.tobytes()

        for pdf in batches:
            payloads = pdf["doc_id"].map(lambda d: make(int(d)))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "meta": [
                        {"mime": "image/x-raw-rgb", "n_bytes": len(p)}
                        for p in payloads
                    ],
                }
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_raw_rgb(media: DataFrame) -> DataFrame:
    """REAL decoder for the RAWRGB format: validates the magic, parses
    width/height/channels from the header, reshapes the pixel buffer
    with numpy and emits per-channel means — the actual work of a
    raster decode + feature-extract stage, minus only an external
    codec dependency.  Corrupt payloads fail loudly (ValueError), as a
    decoder must.  Arrow-batched, map-side; 100 TB of images decode
    with zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload or b"")
                if len(b) < 8 or b[:2] != b"RG":
                    raise ValueError(f"doc {doc_id}: not a RAWRGB payload")
                w = int.from_bytes(b[2:4], "big")
                h = int.from_bytes(b[4:6], "big")
                c = b[6]
                if c != 3:
                    raise ValueError(
                        f"doc {doc_id}: RAWRGB decoder handles 3 channels, header says {c}"
                    )
                px = _np.frombuffer(b[8:], dtype=_np.uint8)
                if px.size != w * h * c:
                    raise ValueError(
                        f"doc {doc_id}: {px.size} pixel bytes, header says {w}x{h}x{c}"
                    )
                means = px.reshape(-1, c).astype(_np.float64).sum(axis=0) / (w * h)
                rows.append(
                    (doc_id, w, h, int(px.size))
                    + tuple(round(float(m), 6) for m in means)
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_px_bytes",
                    "r_mean", "g_mean", "b_mean",
                ],
            )

    return media.mapInPandas(
        run,
        schema="doc_id long, width int, height int, n_px_bytes int, "
        "r_mean double, g_mean double, b_mean double",
    )


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
