from fotmobdatapipeline_spark.multimodal.binary_ops import (
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    attach_binary_payload,
    extract_features,
    fake_decoder,
    fake_frame_splitter,
    fake_resizer,
    resize_media,
    sample_frames,
)

__all__ = [
    "FRAME_SCHEMA",
    "MEDIA_SCHEMA",
    "RESIZED_SCHEMA",
    "attach_binary_payload",
    "extract_features",
    "fake_decoder",
    "fake_frame_splitter",
    "fake_resizer",
    "resize_media",
    "sample_frames",
]
