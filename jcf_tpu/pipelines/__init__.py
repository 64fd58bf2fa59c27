from jcf_tpu.pipelines.common import (
    load_model_for_pipeline,
    build_text_weights,
    tta_loader,
)
from jcf_tpu.pipelines.ood import run_ood_split
from jcf_tpu.pipelines.predict import run_predict
from jcf_tpu.pipelines.train_lora import run_train_lora
from jcf_tpu.pipelines.train_joint import run_train_joint

__all__ = [
    "load_model_for_pipeline",
    "build_text_weights",
    "tta_loader",
    "run_ood_split",
    "run_predict",
    "run_train_lora",
    "run_train_joint",
]
