from jcf_tpu.utils.checkpoint import save_pytree, load_pytree
from jcf_tpu.utils.logging import get_logger, MetricLogger
from jcf_tpu.utils.seeding import set_random_seed
from jcf_tpu.utils.profiling import Timer, profile_trace

__all__ = [
    "save_pytree",
    "load_pytree",
    "get_logger",
    "MetricLogger",
    "set_random_seed",
    "Timer",
    "profile_trace",
]
