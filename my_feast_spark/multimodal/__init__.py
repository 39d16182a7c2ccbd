from my_feast_spark.multimodal.assets import (
    ASSET_SCHEMA,
    MAGIC,
    DECODED_SCHEMA,
    FRAME_SCHEMA,
    decode_assets,
    encode_fake_image_assets,
    resize_images,
    sample_frames,
)

__all__ = [
    "ASSET_SCHEMA",
    "MAGIC",
    "DECODED_SCHEMA",
    "FRAME_SCHEMA",
    "decode_assets",
    "encode_fake_image_assets",
    "resize_images",
    "sample_frames",
]
