"""Multimodal (image/audio/video) column plumbing (task brief).

Media are opaque ``binary`` columns with typed metadata structs. The Spark
side — schema, batch shape, partition-friendly Arrow UDF signatures — is
real and tested; the codec step is INJECTABLE (r2 VERDICT #10, same
pattern as the API mappers' transports): pass ``codec=`` a plain callable
and the Arrow kernel runs it per media item, serialized with the closure
like any Spark UDF dependency. With no codec this container has no
image/audio libraries, so the kernels either raise ``NotImplementedError``
(strict mode) or produce a deterministic fake derived from the bytes
(test mode), clearly marked. ``pillow_codecs()`` builds real
Pillow-backed codecs when PIL is importable (parity test in
tests/test_training_ops.py is skipped where it isn't).
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


# Injectable codec signatures (plain callables — picklable into the Arrow
# kernel closure like the API mappers' transports):
#   DecodeCodec: bytes -> (width, height, feature: list[float])
#   ResizeCodec: (bytes, target_w, target_h) -> resized bytes
DecodeCodec = "Callable[[bytes], tuple[int, int, list[float]]]"
ResizeCodec = "Callable[[bytes, int, int], bytes]"


def pillow_codecs(dims: int = 8):
    """Real Pillow-backed (decode, resize) codec pair; raises ImportError
    where PIL is absent (this container). Decode: true dimensions + a
    deterministic grayscale-downsample feature; resize: real
    ``Image.resize`` re-encoded as PNG."""
    from io import BytesIO

    from PIL import Image  # noqa: F401 — optional dependency by design

    def decode(data: bytes):
        img = Image.open(BytesIO(data))
        w, h = img.size
        thumb = img.convert("L").resize((dims, 1))
        feat = [p / 255.0 for p in thumb.getdata()]
        return w, h, feat

    def resize(data: bytes, target_w: int, target_h: int) -> bytes:
        img = Image.open(BytesIO(data)).resize((target_w, target_h))
        buf = BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    return decode, resize


def decode_image_features(
    media: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "content",
    strict: bool = False,
    dims: int = 8,
    codec=None,
) -> DataFrame:
    """media(media_id, content binary) -> typed metadata + feature vector.
    Arrow-batched; each batch decodes independently (linear scale-out).

    ``codec``: optional DecodeCodec; when given, it replaces the stub
    entirely (``strict`` is ignored) — e.g. ``pillow_codecs()[0]``."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec is None and strict:
            raise NotImplementedError(
                "real image decode requires a codec: pass codec= (e.g. "
                "pillow_codecs()[0]) or strict=False for the "
                "deterministic fake"
            )
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data)
                if codec is not None:
                    w, hgt, feat = codec(data)
                else:
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
    codec=None,
) -> DataFrame:
    """Resize plumbing (task brief): binary in -> binary out, Arrow-batched,
    no driver materialization. ``codec``: optional ResizeCodec (e.g.
    ``pillow_codecs()[1]``) — when given, real pixels; otherwise the pixel
    work is STUBBED (no image libs in this container): the fake 'resized'
    payload is a deterministic digest-derived byte string tagged with the
    target dims, so schema / batch shape / partitioning — the distributed
    parts — are real and tested."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec is None and strict:
            raise NotImplementedError(
                "real image resize requires a codec: pass codec= (e.g. "
                "pillow_codecs()[1]) or strict=False for the "
                "deterministic fake"
            )
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data)
                if codec is not None:
                    payload = codec(data, target_w, target_h)
                else:
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
