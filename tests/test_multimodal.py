"""Multimodal plumbing tests: schema, determinism, batch shape, fan-out,
and the stubbed codec contract."""

import numpy as np
import pytest

from pagerank_optimization_spark.operators.multimodal import (
    decode_with_real_codec,
    extract_features,
    resize_stub,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, 60, seed=42).cache()


def test_media_synthesis_deterministic(spark, media):
    a = sorted((r.media_id, bytes(r.payload)) for r in media.collect())
    b = sorted((r.media_id, bytes(r.payload)) for r in synthesize_media(spark, 60, seed=42).collect())
    assert a == b
    assert all(len(p) == 256 for _, p in a)


def test_metadata_consistency(media):
    for r in media.collect():
        if r.kind == "image":
            assert r.meta.width is not None and r.meta.height == r.meta.width
        elif r.kind == "audio":
            assert r.meta.sample_rate == 16000
        else:
            assert r.meta.n_frames == 8


def test_extract_features(media):
    rows = extract_features(media, n_bins=16).collect()
    assert len(rows) == 60
    for r in rows:
        assert r.n_bytes == 256
        assert 0 <= r.byte_mean <= 255
        assert sum(r.histogram) == 256 and len(r.histogram) == 16


def test_features_match_numpy(media):
    got = {r.media_id: (r.byte_mean, r.byte_std) for r in extract_features(media).collect()}
    for r in media.collect():
        a = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        assert abs(got[r.media_id][0] - a.mean()) < 1e-9
        assert abs(got[r.media_id][1] - a.std()) < 1e-9


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every=2).collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(frames) == n_videos * 4  # 8 frames, every 2nd
    assert all(r.frame_idx in (0, 2, 4, 6) for r in frames)
    assert all(len(r.frame_bytes) == 32 for r in frames)  # 256 bytes / 8 frames


def test_resize_stub(media):
    out = resize_stub(media, width=8, height=8).collect()
    assert all(r.kind == "image" and len(r.payload) == 64 for r in out)
    assert all(r.meta.width == 8 and r.meta.height == 8 for r in out)


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_with_real_codec(b"\x00", "image")


def test_media_features_driver_query_numpy_twin(spark):
    """Pins the media_features DRIVER QUERY values end-to-end (r4 VERDICT
    stretch #8): the one rows-only driver query (no SQL twin — synthesized
    binary media) gets a value check anyway — every output row of the exact
    driver projection (media_id, kind, n_bytes, byte_mean, byte_std,
    histogram_csv; 300 rows, seed 42) recomputed driver-side in numpy from
    the same seeded synthesizer. Recorded as pytest-twinned in COVERAGE."""
    import __spark_entry__ as entrymod

    got = {r.media_id: r for r in entrymod.queries()["media_features"](spark, "").collect()}
    src = synthesize_media(spark, 300, seed=42).collect()
    assert len(got) == len(src) == 300
    for m in src:
        a = np.frombuffer(bytes(m.payload), dtype=np.uint8)
        r = got[m.media_id]
        assert r.kind == m.kind
        assert r.n_bytes == len(a)
        # driver query rounds to 6 dp (cross-engine float hygiene)
        assert abs(r.byte_mean - float(a.mean())) < 5e-7
        assert abs(r.byte_std - float(a.std())) < 5e-7
        hist = np.histogram(a, bins=16, range=(0, 256))[0]
        assert r.histogram_csv == ",".join(str(int(x)) for x in hist)
