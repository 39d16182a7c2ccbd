from my_feast_spark.multimodal.assets import (
    ASSET_SCHEMA,
    MAGIC,
    DECODED_SCHEMA,
    FRAME_SCHEMA,
    decode_assets,
    encode_fake_image_assets,
    image_dhash,
    image_near_dup_pairs,
    resize_images,
    sample_frames,
)
from my_feast_spark.multimodal.audio import (
    audio_features,
    encode_fake_audio_assets,
    segment_silence,
)

__all__ = [
    "ASSET_SCHEMA",
    "MAGIC",
    "DECODED_SCHEMA",
    "FRAME_SCHEMA",
    "audio_features",
    "decode_assets",
    "encode_fake_audio_assets",
    "encode_fake_image_assets",
    "image_dhash",
    "image_near_dup_pairs",
    "resize_images",
    "sample_frames",
    "segment_silence",
]
