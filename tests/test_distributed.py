"""Multi-host (DCN) exercise: 2 jax.distributed processes x 2 virtual CPU
devices run one DP stage-1 train step on a global 4-device mesh; losses and
post-step parameter checksums must agree across processes AND match a
single-process run of the identical step (gradient agreement over DCN+ICI
— SURVEY.md §2.5 multi-host deliverable; the reference has no multi-device
story at all, /root/reference/ood.py:25)."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference() -> tuple:
    """Same step as tests/_dist_worker.py on this process's devices."""
    import jax
    import jax.numpy as jnp

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
    banks = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (2, n_classes, cfg.context_length)).astype(np.int32)
    )
    init_state, step_fn, frozen = make_stage1_step(
        params, cfg, spec, banks, adamw(1e-3), impl="xla"
    )
    state = init_state(lora)
    images = rng.random((8, 3, 32, 32)).astype(np.float32)
    targets = rng.integers(0, n_classes, 8).astype(np.int32)
    new_state, metrics = jax.jit(step_fn)(
        frozen, state, jnp.asarray(images), jnp.asarray(targets), 0,
        jax.random.PRNGKey(0)
    )
    loss = float(metrics["loss"])
    checksum = float(
        jnp.sum(new_state.lora["text"]["a_qkv"])
        + jnp.sum(new_state.lora["vision"]["b_qkv"])
    )
    return loss, checksum


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    results = []
    for out in outs:
        m = re.search(
            r"RESULT ndev=(\d+) nproc=(\d+) loss=([-\d.]+) checksum=([-\d.]+)", out
        )
        assert m, f"no RESULT line in worker output: {out!r}"
        results.append((int(m[1]), int(m[2]), float(m[3]), float(m[4])))

    for ndev, nproc, _, _ in results:
        assert ndev == 4 and nproc == 2
    # replicated outputs agree bit-for-bit across processes
    assert results[0][2] == results[1][2]
    assert results[0][3] == results[1][3]

    ref_loss, ref_checksum = _single_process_reference()
    np.testing.assert_allclose(results[0][2], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(results[0][3], ref_checksum, rtol=1e-4, atol=1e-6)
