from spark_validate.image.synth import synth_image_table, reference_manifest
from spark_validate.image.payload import decode_pixel_stats, psnr_check

__all__ = ["synth_image_table", "reference_manifest", "decode_pixel_stats", "psnr_check"]
