from jcf_tpu.train.optim import adamw, cosine_annealing_lr
from jcf_tpu.train.lora_stage1 import make_stage1_step, Stage1State
from jcf_tpu.train.joint_stage2 import make_stage2_step, Stage2State

__all__ = [
    "adamw",
    "cosine_annealing_lr",
    "make_stage1_step",
    "Stage1State",
    "make_stage2_step",
    "Stage2State",
]
