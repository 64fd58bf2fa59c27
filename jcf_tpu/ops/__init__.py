from jcf_tpu.ops.layers import (
    layer_norm,
    quick_gelu,
    linear,
    l2_normalize,
    mlp,
)
from jcf_tpu.ops.attention import multi_head_attention, fused_attention, packed_attention
from jcf_tpu.ops.block_kernel import fused_block, run_fused_tower
from jcf_tpu.ops.mha_full import multi_head_attention_full
from jcf_tpu.ops.quant import int8_linear, quantize_weight, quantize_clip_params
from jcf_tpu.ops.stats import logit_normalize, top_k_accuracy, boundary_accuracy

__all__ = [
    "layer_norm",
    "quick_gelu",
    "linear",
    "l2_normalize",
    "mlp",
    "multi_head_attention",
    "fused_attention",
    "packed_attention",
    "fused_block",
    "run_fused_tower",
    "multi_head_attention_full",
    "int8_linear",
    "quantize_weight",
    "quantize_clip_params",
    "logit_normalize",
    "top_k_accuracy",
    "boundary_accuracy",
]
