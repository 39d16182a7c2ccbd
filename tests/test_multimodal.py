"""Multimodal asset plumbing tests: binary envelope round-trip, Arrow batch
shapes, resize/frame-sample contracts, and the real-codec stub gate."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import Row

from my_feast_spark.multimodal import (
    MAGIC,
    decode_assets,
    encode_fake_image_assets,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="hello multimodal world " * 20),
        Row(doc_id=2, text="tiny"),
        Row(doc_id=481, text="x" * 700),  # height wraps: 481 % 480 + 1 = 2
    ])
    return encode_fake_image_assets(df, "doc_id", "text")


def test_envelope_layout(assets):
    r = {x.asset_id: bytes(x.content) for x in assets.collect()}
    b = r[2]
    assert b[:4] == MAGIC
    w, h, c = struct.unpack(">III", b[4:16])
    assert (w, h, c) == (len("tiny") % 640 + 1, 2 % 480 + 1, 3)
    assert b[16:] == b"tiny"


def test_decode_roundtrip(assets):
    out = {r.asset_id: r for r in decode_assets(assets).collect()}
    assert out[1].width == len("hello multimodal world " * 20) % 640 + 1
    assert out[481].height == 2
    assert out[2].n_bytes == 16 + 4
    assert out[2].payload_md5 == hashlib.md5(b"tiny").hexdigest()


def test_resize_rewrites_header_and_sizes_payload(assets):
    out = {r.asset_id: bytes(r.content) for r in resize_images(assets, 8, 4).collect()}
    for b in out.values():
        w, h, _c = struct.unpack(">III", b[4:16])
        assert (w, h) == (8, 4)
        assert len(b) == 16 + 8 * 4
    # tiling: short payloads repeat deterministically
    assert out[2][16:] == (b"tiny" * 8)[:32]


def test_sample_frames_shape(assets):
    frames = sample_frames(assets, frame_bytes=16, every_k=2).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
        assert len(bytes(r.frame)) == 16
    # 700-byte payload -> 43 full frames -> every 2nd -> 22 samples
    assert len(by_asset[481]) == 22
    assert [r.frame_idx for r in sorted(by_asset[481], key=lambda r: r.frame_idx)] == list(range(22))


def test_real_codec_is_clearly_stubbed(assets):
    with pytest.raises(NotImplementedError, match="STUB"):
        decode_assets(assets, real_codec=True)


class TestImagePerceptualDedup:
    def _assets(self, spark, payloads):
        from my_feast_spark.multimodal.assets import encode_fake_image_assets
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(asset_id=i, payload=p) for i, p in enumerate(payloads)]
        )
        return encode_fake_image_assets(df, "asset_id", "payload")

    def test_near_identical_images_pair_up(self, spark):
        from my_feast_spark.multimodal.assets import image_near_dup_pairs

        base = "x" * 300
        edited = base[:150] + "Y" + base[151:]      # one-byte edit
        unrelated = "".join(chr(65 + (i * 7) % 26) for i in range(300))
        pairs = image_near_dup_pairs(
            self._assets(spark, [base, edited, unrelated])
        )
        got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        assert (0, 1) in got, "one-byte edit must stay within hamming budget"
        assert not any(2 in p for p in got), "unrelated image paired"
        for c in pairs._owned_caches:
            c.unpersist()

    def test_hamming_join_recall_is_exact(self, spark):
        """Pigeonhole blocking vs brute force on random fingerprints:
        every pair within the hamming budget must be found."""
        import itertools
        import random

        from my_feast_spark.operators.dedup import hamming_pairs

        rng = random.Random(7)
        base = rng.getrandbits(63)
        fps = [base]
        for _ in range(12):  # cluster of small perturbations
            flips = rng.sample(range(64), rng.randint(1, 8))
            v = base
            for f in flips:
                v ^= 1 << f
            fps.append(v if v < 1 << 63 else v - (1 << 64))
        fps += [rng.getrandbits(63) for _ in range(12)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(fps)], "id long, h long"
        )
        got = {(r.doc_a, r.doc_b)
               for r in hamming_pairs(df, "id", "h", max_hamming=6,
                                      n_chunks=8).collect()}
        want = {
            (i, j)
            for i, j in itertools.combinations(range(len(fps)), 2)
            if bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1") <= 6
        }
        assert got == want


class TestVideoNearDup:
    def _assets(self, spark, payloads):
        from pyspark.sql import Row

        from my_feast_spark.multimodal.assets import encode_fake_image_assets

        df = spark.createDataFrame(
            [Row(asset_id=i, payload=p) for i, p in enumerate(payloads)]
        )
        return encode_fake_image_assets(df, "asset_id", "payload")

    def test_trimmed_copy_pairs_up_blocked_equals_brute_force(self, spark):
        """A trimmed/re-cut copy shares most sampled frame hashes ->
        high frame-set Jaccard; the banded-LSH candidates + exact
        verify must equal brute-force Jaccard over the collected frame
        sets (precision 1; recall 1 here because identical frame
        subsets collide in some band)."""
        import itertools

        from pyspark.sql import functions as F

        from my_feast_spark.multimodal.assets import (
            frame_dhash,
            sample_frames,
            video_near_dup_pairs,
        )

        base = "".join(chr(40 + (i * 17) % 180) for i in range(2000))
        trimmed = base[:1600]                  # same leading frames
        unrelated = "".join(chr(35 + (i * 29) % 190) for i in range(2000))
        assets = self._assets(spark, [base, trimmed, unrelated])

        pairs_df = video_near_dup_pairs(assets, every_k=1, threshold=0.5)
        got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs_df.collect()}
        for c in pairs_df._owned_caches:
            c.unpersist()
        assert (0, 1) in got and got[(0, 1)] >= 0.5
        assert not any(2 in p for p in got)

        # brute force over the same frame-hash sets
        fsets: dict = {}
        fr = sample_frames(assets, every_k=1)
        for r in frame_dhash(fr).collect():
            fsets.setdefault(r.asset_id, set()).add(r.fh)
        brute = {}
        for i, j in itertools.combinations(sorted(fsets), 2):
            jac = len(fsets[i] & fsets[j]) / len(fsets[i] | fsets[j])
            if round(jac, 4) >= 0.5:
                brute[(i, j)] = round(jac, 4)
        assert {k: round(v, 4) for k, v in got.items()} == brute

    def test_releases_cleanly(self, spark):
        from my_feast_spark.multimodal.assets import video_near_dup_pairs

        def pinned():
            return {
                int(k)
                for k in spark.sparkContext._jsc.getPersistentRDDs()
                .keySet().toArray()
            }

        base = "".join(chr(40 + (i * 17) % 180) for i in range(1000))
        assets = self._assets(spark, [base, base[:800]])
        before = pinned()
        pairs = video_near_dup_pairs(assets, every_k=1)
        pairs.count()
        for c in pairs._owned_caches:
            c.unpersist(blocking=True)
        assert pinned() - before == set()


def test_video_minhash_columns_are_independent(spark):
    """Regression: a 2-arg transform lambda binds its second parameter
    to the ARRAY INDEX, shadowing the seed and collapsing every minhash
    column into one — the signatures must differ across hash indexes
    and be independent of element order."""
    from pyspark.sql import Row

    from my_feast_spark.multimodal.assets import (
        encode_fake_image_assets,
        video_near_dup_pairs,
    )

    base = "".join(chr(40 + (i * 17) % 180) for i in range(1500))
    df = spark.createDataFrame([Row(asset_id=0, payload=base)])
    assets = encode_fake_image_assets(df, "asset_id", "payload")
    pairs = video_near_dup_pairs(assets, every_k=1)
    sigs = pairs._owned_caches[0]
    row = sigs.collect()[0]
    mhs = [row[f"mh_{i}"] for i in range(32)]
    for c in pairs._owned_caches:
        c.unpersist()
    assert len(set(mhs)) > 16, "minhash columns collapsed to one hash"
