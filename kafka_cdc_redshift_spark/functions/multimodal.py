"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: binary payload column, Arrow-
batched `mapInPandas` with an explicit output schema, deterministic
partition-friendly batch processing. The actual media decode is STUBBED —
the decode libraries (PIL/ffmpeg/...) are not in this container — behind
`decode_image`, which raises NotImplementedError; `extract_binary_meta`
uses a deterministic fake (byte length + md5 checksum + length-derived fake
dimensions) so the pipeline shape is exercised end-to-end.

At 100 TB: binary payloads stay in executor-local Arrow batches (never
collected); per-batch work is embarrassingly parallel; repartition by a size
heuristic upstream if payloads are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import spread

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("fake_width", T.LongType(), False),
        T.StructField("fake_height", T.LongType(), False),
    ]
)


def decode_image(payload: bytes, *, decoder=None):
    """Decode an image payload. `decoder` (bytes -> decoded object) makes
    the decode injectable — a deployment plugs its own library without
    editing this module; with none given, PIL is used when importable,
    otherwise this raises (media libraries are not in this container)."""
    if decoder is not None:
        return decoder(payload)
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError:
        raise NotImplementedError(
            "media decode requires an image library (e.g. PIL); not available "
            "in this environment — pass decoder=, or use the deterministic "
            "stub paths (extract_binary_meta / default extract_features)"
        ) from None
    return Image.open(io.BytesIO(payload))


def extract_binary_meta(df: DataFrame, *, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column."""

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "fake_width": n_bytes % 640,
                    "fake_height": n_bytes % 480,
                }
            )

    return spread(df.select(id_col, payload_col)).mapInPandas(process, META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_len", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    *,
    frame_bytes: int = 256,
    every: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video-style frame sampling over an opaque binary payload: split the
    payload into fixed-size `frame_bytes` chunks ("frames"), keep every
    `every`-th, emit per-frame metadata. The real frame decode (ffmpeg) is
    not in this container — the chunking stands in for the frame iterator,
    but the Spark plumbing (1->N row fan-out inside an Arrow batch, explicit
    output schema, no driver involvement) is exactly the production shape.

    At 100 TB: fan-out happens executor-local inside mapInPandas; output
    partitioning follows the input, so a downstream per-frame groupBy is the
    only shuffle.
    """

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    frame = data[i * frame_bytes:(i + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return spread(df.select(id_col, payload_col)).mapInPandas(process, FRAME_SCHEMA)


FEATURE_BUCKETS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType(), False), False),
    ]
)


def byte_histogram_features(payload: bytes) -> list[float]:
    """Default featurizer stub: deterministic 16-bucket byte histogram,
    L1-normalized — the stand-in for a real media embedding model."""
    import numpy as np

    b = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(b >> 4, minlength=FEATURE_BUCKETS).astype(np.float64)
    return (hist / len(b)).tolist() if len(b) else hist.tolist()


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode=None,
) -> DataFrame:
    """Feature extraction over opaque binary payloads as `array<double>`.

    `decode` (bytes -> sequence of floats) is the injectable decode/embed
    step: a real deployment passes its model (e.g. PIL decode + encoder)
    and the callable ships to executors via cloudpickle; the default is the
    deterministic byte-histogram stub. The Spark shape is the production
    one either way: Arrow-batched mapInPandas emitting a fixed-width vector
    column that feeds directly into the similarity operators (cosine_topk /
    ivf_topk / near-dup).
    """
    featurize = decode if decode is not None else byte_histogram_features

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                [float(x) for x in featurize(bytes(payload))]
                for payload in pdf[payload_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col], "feature": feats})

    return spread(df.select(id_col, payload_col)).mapInPandas(
        process, FEATURE_SCHEMA
    )


def documents_as_binary(df: DataFrame) -> DataFrame:
    """Adapter for tests: treat document text bytes as an opaque payload."""
    return df.select("doc_id", F.encode("text", "utf-8").alias("payload"))
