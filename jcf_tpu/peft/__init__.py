from jcf_tpu.peft.lora import (
    LoraSpec,
    INDEX_POSITIONS_TEXT,
    INDEX_POSITIONS_VISION,
    init_lora_params,
    merge_lora_params,
    make_lora_context,
    lora_layer_masks,
)
from jcf_tpu.peft.lora_io import save_lora, load_lora, load_lora_swa
from jcf_tpu.peft.prompt import (
    PromptLearner,
    init_prompt_learner,
    build_prompt_embeddings,
    prompt_text_features,
)

__all__ = [
    "LoraSpec",
    "INDEX_POSITIONS_TEXT",
    "INDEX_POSITIONS_VISION",
    "init_lora_params",
    "merge_lora_params",
    "make_lora_context",
    "lora_layer_masks",
    "save_lora",
    "load_lora",
    "load_lora_swa",
    "PromptLearner",
    "init_prompt_learner",
    "build_prompt_embeddings",
    "prompt_text_features",
]
