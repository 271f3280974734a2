"""Unit tests for datapipe pure kernels (no Spark needed): fake blob
codec roundtrip, fingerprint bounds, LSH plane determinism, stub gates."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_spark.datapipe import multimodal
from argus_spark.datapipe.similarity import DIM, N_PLANES, PLANES
from argus_spark.datapipe.text import FP_MOD, FP_MULT, FP_WORD_MOD


def test_fake_blob_roundtrip():
    blob = multimodal.encode_fake_blob(7, 123, "hello world, here is text")
    fmt, w, h, n_payload = multimodal.decode_blob_header(blob)
    assert fmt == "IMG1"
    assert (w, h) == multimodal.fake_dims(7, 123)
    assert n_payload == len("hello world, her".encode())
    assert len(blob) == multimodal.HEADER_LEN + n_payload


def test_fake_blob_utf8_payload():
    blob = multimodal.encode_fake_blob(1, 10, "héllo wörld plus more")
    *_, n_payload = multimodal.decode_blob_header(blob)
    assert n_payload == len("héllo wörld plus"[:16].encode("utf-8"))


def test_codec_stubs_gate():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.sample_video_frames(b"", 10)
    with pytest.raises(NotImplementedError):
        multimodal.extract_audio_features(b"")


def test_lsh_planes_deterministic():
    assert len(PLANES) == N_PLANES
    assert all(len(p) == DIM for p in PLANES)
    # re-import must give identical literals (seeded generator)
    import importlib

    from argus_spark.datapipe import similarity as s2

    importlib.reload(s2)
    assert s2.PLANES == PLANES


def test_fingerprint_arithmetic_bounds():
    # every intermediate stays inside int64: acc*mult + h < 2^63
    assert (FP_MOD - 1) * FP_MULT + (FP_WORD_MOD - 1) < 2**63


def test_sampling_deterministic_under_repartitioning(spark):
    """The docstring property that matters at 100 TB: hash-driven
    sampling and packing decisions are pure functions of the row, so
    results are identical no matter how the input is partitioned."""
    from argus_spark.datapipe.sampling import pack_sequences, sample_stratified
    from tests.conftest import SF_SMOKE

    for fn in (sample_stratified, pack_sequences):
        base = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
        parts = sorted(
            map(
                tuple,
                fn(spark, SF_SMOKE)
                .repartition(7)
                .collect(),
            )
        )
        assert base == parts, fn.__name__
