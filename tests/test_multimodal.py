"""Multimodal plumbing: binary payloads stay opaque inside the plan, the
mapInPandas stages keep their schema contracts, and stages compose
(resize output feeds feature extraction)."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    multimodal as mm,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(E._aug(spark, SF_DIR)).persist()


def test_decode_is_stubbed_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"\x00\x01", "image")


def test_resize_produces_fixed_width_binary(media):
    rows = mm.resize_payloads(media).collect()
    assert rows
    for r in rows:
        assert r["out_len"] == mm.RESIZE_OUT_LEN
        assert isinstance(r["payload"], (bytes, bytearray))
        assert len(r["payload"]) == mm.RESIZE_OUT_LEN
        assert r["head_hex"] == bytes(r["payload"][:8]).hex()


def test_resize_composes_with_feature_extraction(media):
    """Resized payloads are a valid media frame for downstream stages:
    features over thumbnails, all inside the plan (no driver hop)."""
    resized = mm.resize_payloads(media).select("media_id", "kind", "payload")
    feats = mm.extract_features(resized).collect()
    assert feats and all(r["byte_len"] == mm.RESIZE_OUT_LEN for r in feats)
    assert all(len(r["features"]) == mm.FEATURE_DIM for r in feats)


def test_frame_sampling_fanout(media):
    """One input row fans out to ceil(n/frame_len) frames sampled every
    stride-th — verified against the per-doc byte lengths."""
    n_by_id = {r["media_id"]: r["meta"]["byte_len"]
               for r in media.select("media_id", "meta").collect()}
    frames = mm.sample_frames(media).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    L, S = mm.FRAME_LEN, mm.FRAME_STRIDE
    for mid, n in n_by_id.items():
        total = (n + L - 1) // L
        want = len(range(0, total, S))
        got = sorted(r["frame_idx"] for r in by_id.get(mid, []))
        assert got == list(range(0, total, S))[:want]
        # every frame but possibly the last is full-length
        for r in by_id.get(mid, []):
            if r["frame_idx"] < total - 1:
                assert r["frame_len"] == L
            else:
                assert 1 <= r["frame_len"] <= L
