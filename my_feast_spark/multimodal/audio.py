"""Audio asset operators: energy features and silence segmentation.

Same design contract as ``assets.py``: audio is an opaque ``binary``
column plus typed metadata; decode/feature passes are Arrow-batched
``mapInPandas`` (one Arrow transfer per batch, no shuffle); the real
codecs (ffmpeg/soundfile) are NOT in this container, so the decode
core is a deterministic fake — the ``MFAU`` header (magic + u32 sample
rate + u32 channels) followed by unsigned 8-bit "PCM" samples. The
windowing, feature math (numpy over the sample vector), schemas, and
the flatMap-shaped segment explode are exactly what the real-codec
path would run after decoding.

Header layout (big-endian u32 after 4-byte magic)::

    bytes 0-3   b"MFAU"
    bytes 4-7   sample_rate (Hz)
    bytes 8-11  channels
    bytes 12..  payload: u8 samples, centered at 128
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_MAGIC = b"MFAU"

FEATURE_SCHEMA = (
    "asset_id long, sample_rate int, channels int, n_samples long, "
    "duration_s double, rms double, peak double, silence_frac double"
)
SEGMENT_SCHEMA = (
    "asset_id long, segment_idx int, start_ms long, end_ms long, "
    "rms double"
)


def encode_fake_audio_assets(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    sample_rate: int = 8000,
    channels: int = 1,
) -> DataFrame:
    """Build an audio asset table from any string payload — JVM-side
    only (hex header + binary concat, whole-stage codegen), mirroring
    ``assets.encode_fake_image_assets``. The payload encodes as
    ISO-8859-1 so each char is exactly one u8 PCM sample (UTF-8 would
    expand chars >= 0x80 to two bytes and shift every sample after
    them)."""
    header = F.unhex(
        F.concat(
            F.lit(AUDIO_MAGIC.hex()),
            F.format_string("%08x", F.lit(sample_rate)),
            F.format_string("%08x", F.lit(channels)),
        )
    )
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit("audio").alias("kind"),
        F.concat(
            header, F.encode(F.col(payload_col), "ISO-8859-1")
        ).alias("content"),
    )


def _make_audio_parser():
    """Parser as a closure so worker-side pickles are self-contained
    (same rationale as ``assets._make_parser``: nested functions
    serialize by value, so executors need only stdlib + numpy — never
    this package on their PYTHONPATH)."""
    magic = AUDIO_MAGIC

    def parse(b: bytes) -> tuple[int, int, np.ndarray]:
        if b[:4] != magic:
            raise ValueError(
                "not an MFAU asset (real audio codecs are stubbed — see "
                "module docstring)"
            )
        sr, ch = struct.unpack(">II", b[4:12])
        # u8 samples centered at 128 -> float in [-1, 1)
        samples = (np.frombuffer(b[12:], dtype=np.uint8).astype(np.float32)
                   - 128.0) / 128.0
        return sr, ch, samples

    return parse


def audio_features(assets: DataFrame, *, silence_rms: float = 0.02,
                   window_ms: int = 25) -> DataFrame:
    """Per-asset energy profile: duration, RMS, peak, and the fraction
    of ``window_ms`` windows whose RMS falls below ``silence_rms`` —
    the cheap quality gate a speech pipeline applies before transcribing
    (drop near-silent or clipped clips). Map-only."""
    _parse_audio = _make_audio_parser()

    def features(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                sr, ch, s = _parse_audio(bytes(content))
                n = len(s)
                win = max(int(sr * window_ms / 1000), 1)
                if n:
                    n_win = n // win
                    if n_win:
                        w = s[: n_win * win].reshape(n_win, win)
                        wrms = np.sqrt((w * w).mean(axis=1))
                        silence = float((wrms < silence_rms).mean())
                    else:
                        silence = float(np.sqrt((s * s).mean()) < silence_rms)
                    rms = float(np.sqrt((s * s).mean()))
                    peak = float(np.abs(s).max())
                else:
                    silence, rms, peak = 1.0, 0.0, 0.0
                recs.append((
                    asset_id, sr, ch, n, n / (sr * max(ch, 1)),
                    rms, peak, silence,
                ))
            yield pd.DataFrame(
                recs,
                columns=["asset_id", "sample_rate", "channels", "n_samples",
                         "duration_s", "rms", "peak", "silence_frac"],
            )

    return assets.mapInPandas(features, schema=FEATURE_SCHEMA)


def segment_silence(assets: DataFrame, *, silence_rms: float = 0.02,
                    window_ms: int = 25,
                    min_segment_windows: int = 2) -> DataFrame:
    """Split each asset into voiced segments separated by silence: one
    output row per segment with its time bounds and RMS — the
    flatMap-shaped VAD pass (same batch contract as
    ``assets.sample_frames``) that feeds per-utterance transcription.
    Segments shorter than ``min_segment_windows`` windows are dropped
    as clicks."""
    _parse_audio = _make_audio_parser()

    def segments(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                sr, _ch, s = _parse_audio(bytes(content))
                win = max(int(sr * window_ms / 1000), 1)
                n_win = len(s) // win
                if not n_win:
                    continue
                w = s[: n_win * win].reshape(n_win, win)
                voiced = np.sqrt((w * w).mean(axis=1)) >= silence_rms
                # run-length over the voiced mask
                seg = 0
                i = 0
                while i < n_win:
                    if voiced[i]:
                        j = i
                        while j < n_win and voiced[j]:
                            j += 1
                        if j - i >= min_segment_windows:
                            seg_s = s[i * win:j * win]
                            recs.append((
                                asset_id, seg,
                                int(i * win * 1000 / sr),
                                int(j * win * 1000 / sr),
                                float(np.sqrt((seg_s * seg_s).mean())),
                            ))
                            seg += 1
                        i = j
                    else:
                        i += 1
            yield pd.DataFrame(
                recs,
                columns=["asset_id", "segment_idx", "start_ms", "end_ms",
                         "rms"],
            )

    return assets.mapInPandas(segments, schema=SEGMENT_SCHEMA)


def audio_fingerprint(assets: DataFrame) -> DataFrame:
    """64-bit energy-delta perceptual fingerprint per audio asset — the
    audio analogue of ``assets.image_dhash`` (and a toy chromaprint:
    real Chromaprint also thresholds energy deltas across frames, just
    over chroma bands). The sample vector splits into 65 equal frames;
    bit i = 1 when frame i's RMS energy exceeds frame i+1's. Locality
    is preserved — a local edit to the audio flips only the frame
    comparisons it touches, so near-identical assets land within small
    hamming distance, which is what the dedup tier needs. One Arrow
    batch in -> (asset_id, afp) out, map-only."""
    _parse = _make_audio_parser()

    def fingerprint(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                _sr, _ch, samples = _parse(bytes(content))
                # 65 frames of RMS energy; pad tiny payloads so every
                # frame is fed
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
                if bits >= 1 << 63:
                    bits -= 1 << 64
                ids.append(asset_id)
                hashes.append(bits)
            yield pd.DataFrame({"asset_id": ids, "afp": hashes})

    return assets.mapInPandas(fingerprint, schema="asset_id long, afp long")


def audio_near_dup_pairs(assets: DataFrame, *, max_hamming: int = 6) -> DataFrame:
    """Perceptual near-duplicate audio pairs: energy-delta fingerprints
    + the dedup tier's pigeonhole hamming join (8 chunks of 8 bits —
    recall exactly 1 up to hamming 7, no cross join; the same blocked
    join the text-simhash and image tiers ride). The fingerprint
    relation is 16 bytes/asset and persisted across both join sides;
    released via ``_owned_caches``."""
    from my_feast_spark.operators.dedup import hamming_pairs

    fp = audio_fingerprint(assets).persist()
    pairs = hamming_pairs(
        fp, "asset_id", "afp", max_hamming=max_hamming, n_chunks=8
    )
    pairs._owned_caches = [fp]
    return pairs
