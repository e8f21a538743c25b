from fotmobdatapipeline_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    attach_binary_payload,
    extract_features,
    fake_decoder,
)

__all__ = ["MEDIA_SCHEMA", "attach_binary_payload", "extract_features", "fake_decoder"]
