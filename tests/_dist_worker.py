"""Worker process for the multi-host DP test (tests/test_distributed.py).

Each worker joins a 2-process jax.distributed cluster over localhost
(standing in for DCN), contributes 2 virtual CPU devices to a global
4-device "data" mesh, and runs ONE stage-1 LoRA train step on its local
shard of a deterministic global batch. Prints the loss and a post-step
parameter checksum so the parent can assert cross-process agreement and
parity with a single-process run of the same step.

Usage: python _dist_worker.py <port> <process_id> <num_processes>
"""

import os
import sys

port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# a sitecustomize hook may have pre-imported jax on the ambient TPU
# platform before this script's env assignments ran — drop any live
# backend and force CPU (same dance as __graft_entry__._force_cpu_mesh)
try:
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        xla_bridge._clear_backends()
        jax.clear_caches()
except Exception:
    pass
jax.config.update("jax_platforms", "cpu")

from jcf_tpu.parallel import batch_sharding, initialize_distributed, make_mesh  # noqa: E402


def main() -> None:
    initialize_distributed(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, (
        f"expected {nprocs} processes, got {jax.process_count()}"
    )

    from jcf_tpu.models import CLIPConfig, init_clip_params
    from jcf_tpu.peft import LoraSpec, init_lora_params
    from jcf_tpu.train import adamw, make_stage1_step

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=120, text_width=64,
        text_heads=2, text_layers=2,
    )
    spec = LoraSpec(r=2, alpha=1.0, dropout_rate=0.0, params=("q", "k", "v"),
                    encoder="both", position="bottom", backbone="ViT-B/16")
    params = init_clip_params(0, cfg)
    lora = init_lora_params(1, spec, cfg.text_layers, cfg.text_width,
                            cfg.vision_layers, cfg.vision_width)

    rng = np.random.default_rng(7)
    n_classes = 5
    banks = rng.integers(1, cfg.vocab_size, (2, n_classes, cfg.context_length))
    banks = jnp.asarray(banks.astype(np.int32))

    init_state, step_fn, frozen = make_stage1_step(
        params, cfg, spec, banks, adamw(1e-3), impl="xla"
    )
    state = init_state(lora)

    global_batch = 8
    images = rng.random((global_batch, 3, 32, 32)).astype(np.float32)
    targets = rng.integers(0, n_classes, global_batch).astype(np.int32)

    mesh = make_mesh()  # all 4 global devices on the "data" axis
    per_proc = global_batch // nprocs
    lo = pid * per_proc
    img_g = jax.make_array_from_process_local_data(
        batch_sharding(mesh, 4), images[lo : lo + per_proc]
    )
    tgt_g = jax.make_array_from_process_local_data(
        batch_sharding(mesh, 1), targets[lo : lo + per_proc]
    )

    step = jax.jit(step_fn)
    new_state, metrics = step(frozen, state, img_g, tgt_g, 0, jax.random.PRNGKey(0))
    jax.block_until_ready(metrics)
    loss = float(metrics["loss"])
    checksum = float(
        jnp.sum(new_state.lora["text"]["a_qkv"])
        + jnp.sum(new_state.lora["vision"]["b_qkv"])
    )
    print(
        f"RESULT ndev={len(jax.devices())} nproc={jax.process_count()} "
        f"loss={loss:.8f} checksum={checksum:.8f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
