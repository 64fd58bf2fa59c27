from jcf_tpu.ops.layers import (
    layer_norm,
    quick_gelu,
    linear,
    l2_normalize,
    mlp,
)
from jcf_tpu.ops.attention import multi_head_attention, fused_attention
from jcf_tpu.ops.stats import logit_normalize, top_k_accuracy, boundary_accuracy

__all__ = [
    "layer_norm",
    "quick_gelu",
    "linear",
    "l2_normalize",
    "mlp",
    "multi_head_attention",
    "fused_attention",
    "logit_normalize",
    "top_k_accuracy",
    "boundary_accuracy",
]
