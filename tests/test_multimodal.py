"""Multimodal plumbing with an injectable decoder: the Arrow-batched
mapInPandas path must carry REAL decoded payload content end-to-end (not
just the stub), so a deployment can plug its media library / embedding
model without editing the module."""

import hashlib

from pyspark.sql import functions as F

import pytest

from kafka_cdc_redshift_spark.functions import multimodal
from kafka_cdc_redshift_spark.sources import load_table


def _payloads(spark, sf_dir):
    return multimodal.documents_as_binary(
        load_table(spark, sf_dir, "documents")
    )


def _make_fake_decode():
    # defined as a CLOSURE so cloudpickle serializes it by value — a test
    # module top-level def would pickle by reference and fail to import on
    # executors
    def fake_decode(payload: bytes) -> list[float]:
        """Stand-in for decode+embed: 4 features derived from payload
        CONTENT (not just length), so a pass-through bug that drops or
        mangles bytes changes the output."""
        digest = hashlib.sha256(payload).digest()
        return [
            float(len(payload)),
            float(payload[0]) if payload else -1.0,
            float(payload[-1]) if payload else -1.0,
            float(int.from_bytes(digest[:4], "big")),
        ]

    return fake_decode


def test_extract_features_carries_decoded_payloads(spark, sf_dir):
    fake_decode = _make_fake_decode()
    binaries = _payloads(spark, sf_dir).limit(50)
    out = {
        r.doc_id: r.feature
        for r in multimodal.extract_features(binaries, decode=fake_decode).collect()
    }
    local = {r.doc_id: bytes(r.payload) for r in binaries.collect()}
    assert set(out) == set(local) and out
    for doc_id, payload in local.items():
        assert out[doc_id] == fake_decode(payload)


def test_extract_features_default_is_histogram_stub(spark, sf_dir):
    binaries = _payloads(spark, sf_dir).limit(5)
    out = {
        r.doc_id: r.feature
        for r in multimodal.extract_features(binaries).collect()
    }
    for r in binaries.collect():
        assert out[r.doc_id] == multimodal.byte_histogram_features(bytes(r.payload))
        assert len(out[r.doc_id]) == multimodal.FEATURE_BUCKETS
        assert abs(sum(out[r.doc_id]) - 1.0) < 1e-9


def test_decode_image_injectable_and_honest_without_library():
    sentinel = object()
    assert multimodal.decode_image(b"xx", decoder=lambda b: sentinel) is sentinel
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"not-an-image")
