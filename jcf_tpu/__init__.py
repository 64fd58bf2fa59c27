"""jcf_tpu — a TPU-native (JAX / XLA / Pallas / pjit) CLIP few-shot framework.

Re-implements, TPU-first, every capability of the reference Jittor stack
``Dokumushikun/jittor-clip-fewshot`` (see SURVEY.md): CLIP ViT / text towers,
IVLP prompting, ModifiedResNet, LoRA adaptation, prompt tuning, LP++/MoCo
heads, MTA test-time augmentation, zero-shot OOD splitting, and the four
pipeline CLIs (ood / predict / train-lora / train-joint).

The compute path is pure-functional JAX: parameters are pytrees, models are
functions, transformer layers run under ``lax.scan``, the attention inner
loop is a fused Pallas TPU kernel, and whole TTA crop batches compile to a
single XLA program. Scale-out uses ``jax.sharding.Mesh`` + data-parallel
sharding over crops/images (see ``jcf_tpu.parallel``).
"""

__version__ = "0.1.0"

from jcf_tpu.tokenizer import SimpleTokenizer, tokenize  # noqa: F401
