"""[EXT] Multimodal column handling.

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata alongside. The Spark-side plumbing — schema, batch shape,
partition sizing, Arrow transfer — is real and tested; the actual media
decode is stubbed (`NotImplementedError` / deterministic fake) because no
image/audio libraries exist in this container. Swapping the stub for
Pillow/torchaudio changes ONE function.

Design rules for 100 TB of media:
  * binary payloads never enter a shuffle — metadata is extracted in a
    narrow pass, then only (key, metadata, features) move
  * decode runs in ``mapInPandas`` so each Arrow batch amortizes Python
    crossing; batch size is bounded by bytes not rows
    (``spark.sql.execution.arrow.maxRecordsPerBatch`` + upstream file split)
  * features (fixed-size float arrays) are 1000x smaller than payloads, so
    downstream ANN joins shuffle features only
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),  # 'image' | 'audio' | 'video'
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("magic_b64", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_media(payload: bytes, media_type: str) -> object:
    """THE decode seam. Real deployments plug Pillow/librosa/pyav here.

    This container has no media libraries, so decoding is not implemented;
    the deterministic fake below (``_fake_feature``) stands in for the
    decode->featurize path so the distributed plumbing is exercised end to
    end with stable, assertable outputs.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; use extract_features(fake=True) for the plumbing path"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in featurizer: bytes -> fixed-size float vector
    via a rolling byte histogram. Stable across runs/engines."""
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + byte) % 997
    return [float(v) / 997.0 for v in acc]


def extract_features(df: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """mapInPandas decode/featurize over MEDIA_SCHEMA-shaped input.

    Arrow moves each partition through Python in columnar batches; output is
    metadata + fixed-size feature vectors (payload dropped — it must not
    proceed into any wide operator).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: no references to module globals, so
        # cloudpickle ships it by value and workers need no import of this
        # package (the driver may run from any cwd/sys.path)
        import base64

        import numpy as np

        def fake_feature(payload: bytes) -> list[float]:
            # vectorized equivalent of the per-byte rolling loop
            # (guide §4: whole-buffer NumPy instead of Python bytecode per
            # byte): modular addition is associative, so the rolling
            # ``acc[i % dim] = (acc[i % dim] + byte) % 997`` IS the strided
            # sum mod 997. np.sum over uint8 promotes to platform int —
            # exact for any realistic payload length.
            arr = np.frombuffer(payload, dtype=np.uint8)
            return [
                float(int(arr[j::dim].sum()) % 997) / 997.0
                for j in range(dim)
            ]

        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                feats = [
                    fake_feature(p if p is not None else b"") for p in payloads
                ]
            else:  # pragma: no cover - requires media libs
                raise NotImplementedError("media decode libraries unavailable")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) if p is not None else 0 for p in payloads],
                    "magic_b64": [
                        base64.b64encode((p or b"")[:8]).decode("ascii")
                        for p in payloads
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-JVM metadata projection (no Python): byte length + base64 magic
    prefix. Safe to run on the full corpus before any decode fan-out."""
    p = F.col(payload_col)
    return df.withColumn("byte_len", F.length(p).cast("long")).withColumn(
        "magic_b64", F.base64(F.substring(p, 1, 8))
    )


def frame_sample(
    df: DataFrame, every_n_bytes: int = 4096, max_frames: int = 16
) -> DataFrame:
    """Video-style frame sampling plumbing: slice each payload into up to
    ``max_frames`` fixed-stride byte windows ('frames'), one output row per
    frame. A real deployment replaces the byte slicing with a container
    demuxer (pyav) inside the same mapInPandas seam; the explode shape,
    schema, and ordering contract are what downstream featurizers rely on.
    """
    out_schema = (
        "media_id long, media_type string, frame_idx long, frame binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, idxs, frames = [], [], [], []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                data = payload or b""
                n = min(max_frames, max(1, -(-len(data) // every_n_bytes)))
                for i in range(n):
                    ids.append(mid)
                    types.append(mtype)
                    idxs.append(i)
                    frames.append(data[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": types,
                    "frame_idx": idxs,
                    "frame": frames,
                }
            )

    return df.mapInPandas(run, out_schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as an opaque
    payload so the media path is exercised on the provided fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").cast("binary").alias("payload"),
        F.lit("text").alias("media_type"),
    )
