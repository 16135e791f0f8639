"""Semantic tests for the round-8 multimodal feature lanes: the
histogram image decoder, the spectral audio features, and the
cross-format feature-space dedup. Cross-engine parity is the oracle
gate's job; these pin the math on crafted inputs where the right
answer is known by hand."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from flink_ms_spark.operators.multimodal import (
    histogram_image_decoder,
    spectral_audio_features,
)
from flink_ms_spark.plans.catalog import QUERIES


def _wav(samples: list[int], sr: int = 8000) -> bytes:
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _ppm(pixels: bytes, w: int, h: int) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def test_histogram_decoder_single_color_image():
    # a 2x2 image of pure (255, 0, 0): bytes 255 -> bin 15, 0 -> bin 0
    px = bytes([255, 0, 0] * 4)
    hist = histogram_image_decoder(_ppm(px, 2, 2))
    assert len(hist) == 16
    assert hist[0] == round(8 / 12.0, 6)   # the two zero channels
    assert hist[15] == round(4 / 12.0, 6)  # the 255 channel
    assert all(h == 0.0 for h in hist[1:15])
    assert math.isclose(sum(hist), 1.0, abs_tol=1e-5)


def test_spectral_features_dc_and_nyquist():
    # constant (DC) signal: all spectral mass in bin 0
    c, r, fl, rms = spectral_audio_features(_wav([1000] * 64))
    assert c == 0.0 and r == 0.0
    assert rms == 1000.0
    assert fl < 1e-6  # single-line spectrum is maximally peaked

    # sign-alternating signal: all mass at Nyquist (sr/2 = 4000 Hz)
    alt = [2000 if i % 2 == 0 else -2000 for i in range(64)]
    c, r, fl, rms = spectral_audio_features(_wav(alt))
    assert c == 4000.0 and r == 4000.0
    assert rms == 2000.0

    # white-ish (md5-style) noise sits strictly between the extremes
    rng = np.random.RandomState(7)
    noise = [int(x) for x in rng.randint(-3000, 3000, 64)]
    c, r, fl, rms = spectral_audio_features(_wav(noise))
    assert 0.0 < c < 4000.0 and 0.0 < fl <= 1.0


def test_spectral_rejects_malformed_payload():
    with pytest.raises(ValueError):
        spectral_audio_features(b"not a wav")


def test_media_dup_pairs_groups_both_formats(spark, sf_smoke):
    rows = QUERIES["media_dup_pairs"](spark, sf_smoke).collect()
    assert rows
    # every doc appears in BOTH formats with the same pixel stream, so
    # each group's member count is exactly twice its distinct-doc count
    for r in rows:
        assert r.n_members == 2 * r.n_docs
        assert r.doc_min <= r.doc_max
    n_docs_total = sum(r.n_docs for r in rows)
    n_members_total = sum(r.n_members for r in rows)
    assert n_members_total == 2 * n_docs_total


# ---------------------------------------------------------------------------
# Round-9: REAL video lane (concatenated-P6 demux replaces the
# byte-slicing sample_frames stub — VERDICT r8 task 6)


def _ppm_frame(w, h, fill):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes([fill]) * (w * h * 3)


def test_decode_ppm_stream_walks_frames_and_comments():
    from flink_ms_spark.operators.multimodal import decode_ppm_stream

    stream = (
        _ppm_frame(2, 2, 10)
        + b"P6\n# a netpbm header comment\n3 1\n255\n" + bytes(range(9))
        + _ppm_frame(1, 1, 255)
    )
    frames = decode_ppm_stream(stream)
    assert [(w, h) for w, h, _ in frames] == [(2, 2), (3, 1), (1, 1)]
    assert frames[0][2].reshape(-1).tolist() == [10] * 12
    assert frames[1][2].reshape(-1).tolist() == list(range(9))


def test_decode_ppm_stream_fails_loud():
    from flink_ms_spark.operators.multimodal import decode_ppm_stream

    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm_stream(b"\x00\x00MP4 junk")
    with pytest.raises(ValueError, match="truncated P6 frame"):
        decode_ppm_stream(b"P6\n4 4\n255\n" + b"\x01" * 10)
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm_stream(b"P6\n1 1\n65535\n" + b"\x01" * 6)
    with pytest.raises(ValueError, match="empty"):
        decode_ppm_stream(b"")


def test_sample_frames_real_demux_even_selection(spark):
    """A 6-frame stream sampled at 4 keeps original indices (k*6)//4 =
    {0,1,3,4}; a 2-frame stream collapses duplicates to {0,1}; every
    emitted frame is a standalone decodable P6 of the right content."""
    from flink_ms_spark.operators.multimodal import (
        decode_image,
        sample_frames,
    )

    six = b"".join(_ppm_frame(2, 2, 10 * f) for f in range(6))
    two = b"".join(_ppm_frame(2, 2, 200 + f) for f in range(2))
    media = spark.createDataFrame(
        [(1, six), (2, two)], "media_id long, payload binary"
    )
    rows = sorted(
        ((r.media_id, r.frame_idx, bytes(r.frame_payload))
         for r in sample_frames(media, n_frames=4).collect())
    )
    assert [(m, i) for m, i, _ in rows] == [
        (1, 0), (1, 1), (1, 3), (1, 4), (2, 0), (2, 1),
    ]
    for m, i, payload in rows:
        w, h, px = decode_image(payload)
        fill = 10 * i if m == 1 else 200 + i
        assert (w, h) == (2, 2) and px.reshape(-1).tolist() == [fill] * 12


def test_sample_frames_rejects_non_p6_payload(spark):
    from flink_ms_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [(1, b"RIFF....WEBP")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a P6"):
        sample_frames(media).collect()


def test_frame_motion_features_hand_checked(spark):
    """Two constant frames at gray 10 and 40: first/last gray exact,
    motion = mean |10-40| = 30 on every pixel."""
    from flink_ms_spark.operators.multimodal import (
        frame_motion_features,
        sample_frames,
    )

    stream = _ppm_frame(2, 2, 10) + _ppm_frame(2, 2, 40)
    media = spark.createDataFrame(
        [(7, stream)], "media_id long, payload binary"
    )
    out = frame_motion_features(sample_frames(media, n_frames=4)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.media_id, r.n_sampled) == (7, 2)
    assert (r.first_gray, r.last_gray, r.motion) == (10.0, 40.0, 30.0)


def test_video_round_trip_generator_vs_demux(spark, sf_smoke):
    """synthesize_video_media payloads demux into 3 + doc_id % 4
    frames whose pixel bytes equal the md5 generator stream."""
    import hashlib

    from flink_ms_spark.operators.multimodal import (
        decode_ppm_stream,
        synthesize_video_media,
    )
    from flink_ms_spark.plans.mixing import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(5)
    for r in synthesize_video_media(docs).collect():
        frames = decode_ppm_stream(bytes(r.payload))
        assert len(frames) == 3 + r.media_id % 4
        for f, (w, h, px) in enumerate(frames):
            seed = hashlib.md5(f"{r.media_id}:{f}".encode()).digest()
            need = w * h * 3
            expect = (seed * (need // len(seed) + 1))[:need]
            assert px.reshape(-1).tobytes() == expect


def test_video_frame_features_fused_equals_composed(spark, sf_smoke):
    """The fused map-only operator must be row-identical to the
    sample_frames -> frame_motion_features composition (the composed
    form keeps the per-frame table for pipelines that consume frames;
    the fused form removes the keyed shuffle + per-video group)."""
    from flink_ms_spark.operators.multimodal import (
        frame_motion_features,
        sample_frames,
        synthesize_video_media,
        video_frame_features,
    )
    from flink_ms_spark.plans.mixing import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    media = synthesize_video_media(docs)
    fused = {r.media_id: r for r in video_frame_features(media).collect()}
    composed = {
        r.media_id: r
        for r in frame_motion_features(sample_frames(media, 4)).collect()
    }
    assert fused.keys() == composed.keys() and len(fused) == 40
    for k in fused:
        assert fused[k] == composed[k]


def test_ppm_stream_round_trip_property():
    """encode_ppm ∘ decode_ppm_stream is the identity on arbitrary
    frame sequences (varying dims per frame, arbitrary pixel bytes) —
    the demux never mixes adjacent frames' bytes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_ms_spark.operators.multimodal import (
        decode_ppm_stream,
        encode_ppm,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 5), st.integers(1, 5), st.randoms()),
            min_size=1,
            max_size=6,
        )
    )
    def check(specs):
        frames = []
        stream = b""
        for w, h, rng in specs:
            px = bytes(rng.randrange(256) for _ in range(w * h * 3))
            arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
            frames.append((w, h, arr))
            stream += encode_ppm(w, h, arr)
        out = decode_ppm_stream(stream)
        assert len(out) == len(frames)
        for (w, h, arr), (ow, oh, oarr) in zip(frames, out):
            assert (w, h) == (ow, oh)
            assert oarr.tobytes() == arr.tobytes()

    check()


def test_video_fingerprint_dedup_rediscovers_planted_groups(spark, sf_smoke):
    """group_size=3 plants mod-3 duplicate cohorts; the content
    fingerprint (sampled-frame pixel md5) must rediscover exactly that
    structure — and group_size=1 (the default every other oracle
    replays) must keep every video unique."""
    from pyspark.sql import functions as F

    from flink_ms_spark.operators.multimodal import (
        synthesize_video_media,
        video_fingerprints,
    )
    from flink_ms_spark.plans.mixing import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(30)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]

    fps = video_fingerprints(synthesize_video_media(docs, group_size=3))
    groups = {
        tuple(sorted(r.members))
        for r in fps.groupBy("fp").agg(
            F.collect_list("media_id").alias("members")
        ).collect()
    }
    expect = {}
    for d in ids:
        expect.setdefault(d - d % 3, []).append(d)
    assert groups == {tuple(sorted(v)) for v in expect.values()}

    unique = video_fingerprints(synthesize_video_media(docs))
    assert unique.select("fp").distinct().count() == len(ids)
