from jcf_tpu.tta.mta import solve_mta, solve_mta_logits, solve_mta_batch
from jcf_tpu.tta.classifier import (
    encode_class_templates,
    build_classifier_weights,
)

__all__ = [
    "solve_mta",
    "solve_mta_logits",
    "solve_mta_batch",
    "encode_class_templates",
    "build_classifier_weights",
]
