from fotmobdatapipeline_spark.multimodal.binary_ops import (
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    attach_binary_payload,
    encode_media_as_bmp,
    extract_features,
    fake_decoder,
    fake_frame_splitter,
    fake_resizer,
    resize_media,
    sample_frames,
)
from fotmobdatapipeline_spark.multimodal.bmp import (
    bmp_feature_decoder,
    decode_bmp,
    encode_bmp,
)

__all__ = [
    "FRAME_SCHEMA",
    "MEDIA_SCHEMA",
    "RESIZED_SCHEMA",
    "attach_binary_payload",
    "bmp_feature_decoder",
    "decode_bmp",
    "encode_bmp",
    "encode_media_as_bmp",
    "extract_features",
    "fake_decoder",
    "fake_frame_splitter",
    "fake_resizer",
    "resize_media",
    "sample_frames",
]
