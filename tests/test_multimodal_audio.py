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


class TestAudioPerceptualDedup:
    def _assets(self, spark, payloads):
        from pyspark.sql import Row

        from my_feast_spark.multimodal.audio import encode_fake_audio_assets

        df = spark.createDataFrame(
            [Row(asset_id=i, payload=p) for i, p in enumerate(payloads)]
        )
        return encode_fake_audio_assets(df, "asset_id", "payload")

    def test_near_identical_audio_pairs_up(self, spark):
        from my_feast_spark.multimodal.audio import audio_near_dup_pairs

        base = "".join(chr(100 + (i * 13) % 80) for i in range(400))
        edited = base[:200] + chr(200) + base[201:]  # one-sample edit
        unrelated = "".join(chr(30 + (i * 31) % 200) for i in range(400))
        pairs = audio_near_dup_pairs(
            self._assets(spark, [base, edited, unrelated])
        )
        got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        for c in pairs._owned_caches:
            c.unpersist()
        assert (0, 1) in got, "one-sample edit must stay within hamming budget"
        assert not any(2 in p for p in got), "unrelated audio paired"

    def test_fingerprint_matches_reference_and_brute_force(self, spark):
        """The Arrow fingerprint must equal an in-process replay of the
        same 65-frame energy-delta reduction, and the blocked pair join
        must equal brute-force hamming over those fingerprints."""
        import itertools

        import numpy as np

        from my_feast_spark.multimodal.audio import (
            audio_fingerprint,
            audio_near_dup_pairs,
        )

        payloads = [
            "".join(chr(50 + ((i * k + k * k) % 150)) for i in range(300))
            for k in range(8)
        ]
        assets = self._assets(spark, payloads)
        got = {r.asset_id: r.afp for r in audio_fingerprint(assets).collect()}

        def ref_fp(p: str) -> int:
            samples = (np.frombuffer(
                p.encode("ISO-8859-1"), dtype=np.uint8
            ).astype(np.float32) - 128.0) / 128.0
            if samples.size < 65:
                samples = np.pad(samples, (0, 65 - samples.size))
            n = samples.size
            sq = samples.astype(np.float64) ** 2
            energy = [
                float(sq[(i * n) // 65:((i + 1) * n) // 65].mean())
                for i in range(65)
            ]
            bits = 0
            for i in range(64):
                bits = (bits << 1) | (1 if energy[i] > energy[i + 1] else 0)
            return bits - (1 << 64) if bits >= 1 << 63 else bits

        assert got == {i: ref_fp(p) for i, p in enumerate(payloads)}

        pairs = audio_near_dup_pairs(assets, max_hamming=6)
        blocked = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        for c in pairs._owned_caches:
            c.unpersist()
        brute = {
            (i, j)
            for i, j in itertools.combinations(range(len(payloads)), 2)
            if bin((got[i] ^ got[j]) & ((1 << 64) - 1)).count("1") <= 6
        }
        assert blocked == brute
