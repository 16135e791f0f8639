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
