"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct; the
heavy per-item work (decode, resize, feature-extract, frame-sample)
runs as Arrow-batched Pandas UDFs over ``mapInPandas`` so bytes never
round-trip through row-at-a-time Python.

The decode step itself is STUBBED (``DeterministicFakeDecoder``): the
image/audio libraries are not in this container.  The Spark-side
contract — schema, batch iteration, partitioning, UDF signature — is
real and tested; swap ``decode_fn`` with a PIL/ffmpeg-backed callable
in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, content_sha int, feature array<float>"


class DeterministicFakeDecoder:
    """Stand-in decoder: derives a small feature vector from the byte
    content hash.  Deterministic so tests are stable; raises on real
    decode requests to make the stub boundary explicit."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def features(self, content: bytes) -> list[float]:
        h = hashlib.sha256(content or b"").digest()
        return [h[i] / 255.0 for i in range(self.dim)]

    def decode(self, content: bytes):
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not in this container"
        )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_schema: str = FEATURE_SCHEMA,
) -> DataFrame:
    """Feature extraction over the binary column via mapInPandas:
    Arrow-batched, one pandas DataFrame per partition chunk — the
    shape real decoders plug into."""
    fn = decode_fn or DeterministicFakeDecoder().features

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fn(c if c is not None else b"") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "content_sha": [
                        int.from_bytes(
                            hashlib.sha256(c or b"").digest()[:3], "big"
                        )
                        for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=batch_schema)


RESIZED_SCHEMA = (
    "media_id long, media_type string, content binary, "
    "width int, height int, mime string"
)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize the binary payload to (width, height) via mapInPandas.

    The default ``resize_fn`` is the deterministic fake (content-hash
    bytes sized ∝ the target area, so tests can assert the contract);
    a real deployment passes a PIL-backed callable with the same
    signature.  Metadata is updated to the target dimensions — the
    Spark-side contract the fake and the real decoder share."""
    fn = resize_fn or (
        lambda c, w, h: (hashlib.sha256(c or b"").digest() * (1 + (w * h) // 8192))[
            : max(1, (w * h) // 256)
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": [
                        fn(c if c is not None else b"", width, height)
                        for c in pdf["content"]
                    ],
                    "width": width,
                    "height": height,
                    "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame binary"


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    frame_fn: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Sample one frame per ``every_ms`` from video rows — a one-to-many
    mapInPandas (each input row fans out to duration/every_ms frame
    rows).  The frame extraction itself is the stub boundary (an
    ffmpeg-backed callable in production); the fan-out shape, schema
    and partition behavior are real."""
    fn = frame_fn or (
        lambda c, i: hashlib.sha256((c or b"") + i.to_bytes(4, "big")).digest()
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, mtype, content, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"], pdf["meta"]
            ):
                if mtype != "video" or meta is None:
                    continue
                duration = meta["duration_ms"] or 0
                for i in range(int(duration // every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(fn(content, i))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (binary payload derived
    from the id)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 5)
        mtype = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                mtype,
                bytearray(payload),
                (64 + i % 512, 64 + (i * 7) % 512, 1000 * (i % 90), f"x/{mtype}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
