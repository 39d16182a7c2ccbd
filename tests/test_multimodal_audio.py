"""Audio tier: energy features and silence segmentation on fake-codec
assets — constructed payloads with known silent regions must produce
the expected segments and fractions."""

from __future__ import annotations

from pyspark.sql import Row

from my_feast_spark.multimodal.audio import (
    audio_features,
    encode_fake_audio_assets,
    segment_silence,
)

# u8 payload via latin-1 chars: chr(128) = silence (sample 0.0),
# chr(200) = loud (~0.56). 8000 Hz, 25 ms windows -> 200 samples/window.
SIL = chr(128) * 400     # 2 windows of silence
LOUD = chr(200) * 400    # 2 windows of voice


def _assets(spark, payloads):
    df = spark.createDataFrame(
        [Row(asset_id=i, payload=p) for i, p in enumerate(payloads)]
    )
    return encode_fake_audio_assets(df, "asset_id", "payload")


def test_features_measure_silence_fraction(spark):
    rows = {r.asset_id: r for r in audio_features(
        _assets(spark, [SIL + LOUD, SIL + SIL])
    ).collect()}
    a, b = rows[0], rows[1]
    assert a.sample_rate == 8000 and a.n_samples == 800
    assert abs(a.duration_s - 0.1) < 1e-9
    assert abs(a.silence_frac - 0.5) < 1e-9, a
    assert b.silence_frac == 1.0 and b.rms == 0.0
    assert a.peak > 0.5


def test_segments_split_on_silence(spark):
    # voice, silence, voice -> two segments with correct bounds
    payload = LOUD + SIL + LOUD
    segs = sorted(
        (r.segment_idx, r.start_ms, r.end_ms)
        for r in segment_silence(_assets(spark, [payload])).collect()
    )
    assert segs == [(0, 0, 50), (1, 100, 150)], segs


def test_short_clicks_dropped(spark):
    click = chr(200) * 200  # a single voiced window
    segs = segment_silence(
        _assets(spark, [SIL + click + SIL]), min_segment_windows=2
    ).collect()
    assert segs == []
