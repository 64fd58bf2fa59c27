from jcf_tpu.infer.engine import (
    TTAEngine,
    encode_image_batched,
    device_random_crops,
    crop_resize_matrices,
)
from jcf_tpu.infer.predict import (
    ensemble_base_logits,
    format_impath,
    write_top5,
    update_txt_file,
    process_result_lines,
    ood_side,
)

__all__ = [
    "TTAEngine",
    "encode_image_batched",
    "device_random_crops",
    "crop_resize_matrices",
    "ensemble_base_logits",
    "format_impath",
    "write_top5",
    "update_txt_file",
    "process_result_lines",
    "ood_side",
]
