from farmrpg_etl_spark.multimodal.binary_ops import (
    decode_media_meta,
    extract_binary_meta,
    frame_sample,
)

__all__ = ["extract_binary_meta", "decode_media_meta", "frame_sample"]
