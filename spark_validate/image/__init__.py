from spark_validate.image.synth import synth_image_table, reference_manifest
from spark_validate.image.payload import PayloadDriftCheck, decode_pixel_stats, psnr_check
from spark_validate.image.header import (
    REAL_SPECS,
    SVI0_SPEC,
    PayloadHeaderCheck,
    header_issue_expr,
    svi0_specs,
)
from spark_validate.image.consistency import (
    CaptionConsistencyCheck,
    CaptionSpamCheck,
    apply_canonical_captions,
    elect_canonical_captions,
)
from spark_validate.image.transforms import (
    decode_audio_stats,
    extract_image_features,
    resize_images,
    sample_video_frames,
    synth_audio_payload,
    synth_video_payload,
)

__all__ = [
    "CaptionConsistencyCheck",
    "CaptionSpamCheck",
    "apply_canonical_captions",
    "elect_canonical_captions",
    "synth_image_table",
    "reference_manifest",
    "decode_pixel_stats",
    "psnr_check",
    "PayloadDriftCheck",
    "resize_images",
    "extract_image_features",
    "sample_video_frames",
    "synth_video_payload",
    "decode_audio_stats",
    "synth_audio_payload",
]
