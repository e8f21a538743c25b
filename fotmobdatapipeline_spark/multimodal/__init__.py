from fotmobdatapipeline_spark.multimodal.binary_ops import (
    AUDIO_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    attach_binary_payload,
    encode_media_as_bmp,
    encode_media_as_wav,
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
from fotmobdatapipeline_spark.multimodal.wav import (
    decode_wav,
    encode_wav,
    wav_feature_decoder,
)

__all__ = [
    "AUDIO_SCHEMA",
    "FRAME_SCHEMA",
    "MEDIA_SCHEMA",
    "RESIZED_SCHEMA",
    "attach_binary_payload",
    "bmp_feature_decoder",
    "decode_bmp",
    "decode_wav",
    "encode_bmp",
    "encode_wav",
    "encode_media_as_bmp",
    "encode_media_as_wav",
    "extract_features",
    "fake_decoder",
    "fake_frame_splitter",
    "fake_resizer",
    "resize_media",
    "sample_frames",
    "wav_feature_decoder",
]
