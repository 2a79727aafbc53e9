"""Multimodal (image/audio/video) column plumbing (task brief).

Media are opaque ``binary`` columns with typed metadata structs. The Spark
side — schema, batch shape, partition-friendly Arrow UDF signatures — is
real and tested; the codec step is STUBBED: this container has no
image/audio libraries, so ``decode_image``/``decode_audio`` either raise
``NotImplementedError`` (strict mode) or produce a deterministic fake
derived from the bytes (test mode), clearly marked. Swapping in Pillow /
torchaudio is a one-function change inside the UDF; the distributed plan
is already correct (mapInPandas over binary, no driver materialization).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(data: bytes, dims: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: pseudo width/height + feature vector from
    the content digest. STUB — replace with a real codec (see module doc)."""
    h = hashlib.sha256(data).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feat = (np.frombuffer(h[:4 * dims], dtype=np.uint8).astype(np.float32)
            .reshape(-1)[:dims] / 255.0)
    return width, height, feat.tolist()


def decode_image_features(
    media: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "content",
    strict: bool = False,
    dims: int = 8,
) -> DataFrame:
    """media(media_id, content binary) -> typed metadata + feature vector.
    Arrow-batched; each batch decodes independently (linear scale-out)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decode requires an image codec library "
                "(not available in this environment); use strict=False "
                "for the deterministic fake"
            )
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data)
                w, hgt, feat = _fake_decode(data, dims)
                rows.append(
                    (
                        str(mid),
                        w,
                        hgt,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes", "sha", "feature"],
            )

    return media.select(id_col, bytes_col).mapInPandas(
        decode, schema=IMAGE_META_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)


def resize_images(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "media_id",
    bytes_col: str = "content",
    strict: bool = False,
) -> DataFrame:
    """Resize plumbing (task brief): binary in -> binary out, Arrow-batched,
    no driver materialization. The pixel work is STUBBED like the decoder
    (no image libs in this container): the fake 'resized' payload is a
    deterministic digest-derived byte string tagged with the target dims, so
    schema / batch shape / partitioning — the distributed parts — are real
    and tested; swapping in Pillow's ``Image.resize`` is a one-function
    change inside the kernel."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image resize requires an image codec library; "
                "use strict=False for the deterministic fake"
            )
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data)
                tag = f"resized:{target_w}x{target_h}:".encode()
                payload = tag + hashlib.sha256(data).digest()
                rows.append(
                    (
                        str(mid),
                        target_w,
                        target_h,
                        payload,
                        hashlib.sha256(payload).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "target_w", "target_h", "resized",
                         "resized_sha"],
            )

    return media.select(id_col, bytes_col).mapInPandas(
        resize, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx) rows for
    a deterministic sampling grid; the actual frame extraction joins this
    plan against the decoder output. Native explode — no Python."""
    return media.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.lit(every_n * 9), F.lit(every_n))
        ).alias("frame_idx"),
    )
