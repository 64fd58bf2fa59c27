from jcf_tpu.models.clip import (
    CLIPConfig,
    VIT_B_32,
    init_clip_params,
    encode_image,
    encode_text,
    clip_forward,
)
from jcf_tpu.models.loader import (
    load_state_dict_file,
    config_from_state_dict,
    params_from_state_dict,
    load_clip,
)

__all__ = [
    "CLIPConfig",
    "VIT_B_32",
    "init_clip_params",
    "encode_image",
    "encode_text",
    "clip_forward",
    "load_state_dict_file",
    "config_from_state_dict",
    "params_from_state_dict",
    "load_clip",
]
