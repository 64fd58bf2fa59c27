"""Stage-1 train-step section attribution (VERDICT r4 #7).

Decomposes the stage-1 LoRA step (bs 256: 403-class text re-encode +
vision fwd + joint backward + AdamW) into separately-jitted sections and
times each on the real chip:

  full      one make_stage1_step step (the PERF.md train-table row)
  text_fb   fwd+bwd of the 403-class text tower w.r.t. the text LoRA
  vis_fb    fwd+bwd of the bs-256 vision tower w.r.t. the vision LoRA
  text_f    text tower forward only
  vis_f     vision tower forward only
  opt       AdamW update+apply on fixed grads

The reference's dominant stage-1 cost is the per-batch re-encode of all
403 class templates (/root/reference/lora_train_vlp.py:976); this decides
whether the pre-tokenized-bank design already amortizes it on TPU or a
fused text tower is warranted.

Discipline (PERF.md r4 measurement rules): every section is a FRESH
function (no jaxpr-cache contamination), every timed iteration uses a
distinct input (rng key / bank index cycling), and each section prints a
checksum of its outputs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jcf_tpu.models import VIT_B_32, init_clip_params
from jcf_tpu.models.clip import encode_image, encode_text
from jcf_tpu.peft import LoraSpec, init_lora_params
from jcf_tpu.peft.lora import make_lora_context
from jcf_tpu.tokenizer import tokenize
from jcf_tpu.train import adamw, make_stage1_step

BS = int(os.environ.get("JCF_ATTR_BS", "256"))
N_CLASSES = 403
TIMED = int(os.environ.get("JCF_ATTR_TIMED", "10"))
DTYPE = jnp.bfloat16


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _time_section(name, fn, args_for):
    # a failed section (e.g. the remote compile helper's request-size
    # limit, HTTP 413 on the r5 first run) must not kill the rest
    try:
        return _time_section_inner(name, fn, args_for)
    except Exception as exc:  # noqa: BLE001
        print(f"{name:8s}   FAILED: {type(exc).__name__}: {str(exc)[:120]}",
              flush=True)
        return float("nan")


def _time_section_inner(name, fn, args_for):
    out = None
    for i in range(2):
        out = fn(*args_for(i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args_for(100 + i)) for i in range(TIMED)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / TIMED * 1e3
    leaves = jax.tree_util.tree_leaves(outs[-1])
    csum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves
                     if hasattr(l, "astype")))
    print(f"{name:8s} {dt:8.2f} ms  (checksum {csum:.4e})", flush=True)
    return dt


def main():
    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    spec = LoraSpec()
    lora = init_lora_params(
        1, spec, cfg.text_layers, cfg.text_width, cfg.vision_layers, cfg.vision_width
    )
    banks = jnp.asarray(
        np.stack([
            np.asarray(tokenize(
                [f"a photo of a class {i} variant {b}." for i in range(N_CLASSES)],
                truncate=True,
            ))
            for b in range(12)
        ])
    )
    opt = adamw(lr=2e-4, weight_decay=1e-2)
    init_state, step_fn, frozen = make_stage1_step(
        params, cfg, spec, banks, opt, dtype=DTYPE
    )
    state = init_state(lora)
    rng = np.random.default_rng(0)
    # one DISTINCT image buffer per timed iteration (fresh-input rule:
    # a pool smaller than TIMED lets the axon dispatch memoization elide
    # repeats — the r5 first run measured a 0.74 ms "full step" that way)
    image_pool = [
        jnp.asarray(rng.random((BS, 3, 224, 224)).astype(np.float32))
        for _ in range(TIMED + 2)
    ]
    n_pool = len(image_pool)
    targets = jnp.asarray(rng.integers(0, 374, BS).astype(np.int32))

    rows = {}

    # --- full step, state THREADED through the timed loop ---
    # (an unthreaded loop on the async axon dispatch path measured
    # 0.41 ms/step — the per-iteration loss buffers resolve while the
    # pipelined steps overlap; threading the state forces each step to
    # consume the previous one's outputs, like bench_train.py)
    step = jax.jit(step_fn, donate_argnums=(1,))
    st, _ = step(frozen, state, image_pool[0], targets, 0, jax.random.PRNGKey(0))
    st, _ = step(frozen, st, image_pool[1], targets, 1, jax.random.PRNGKey(1))
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    metrics = None
    for i in range(TIMED):
        st, metrics = step(frozen, st, image_pool[i % n_pool], targets,
                           i % 12, jax.random.PRNGKey(100 + i))
    jax.block_until_ready((st, metrics))
    rows["full"] = (time.perf_counter() - t0) / TIMED * 1e3
    print(f"full     {rows['full']:8.2f} ms  (loss {float(metrics['loss']):.4f})",
          flush=True)

    # --- text tower fwd+bwd (proxy reduction; tower work identical) ---
    def text_loss(lora_t, bank_idx, key):
        ctx = make_lora_context(lora_t, spec, "text", cfg.text_layers, rng=key)
        emb = encode_text(params, cfg, banks[bank_idx], dtype=DTYPE,
                          lora_ctx=ctx, remat=True)
        return jnp.sum(jnp.square(emb.astype(jnp.float32)))

    text_fb = jax.jit(jax.value_and_grad(text_loss))
    rows["text_fb"] = _time_section(
        "text_fb", lambda b, k: text_fb(state.lora, b, k)[0],
        lambda i: (i % 12, jax.random.PRNGKey(i)),
    )
    text_f = jax.jit(text_loss)
    rows["text_f"] = _time_section(
        "text_f", lambda b, k: text_f(state.lora, b, k),
        lambda i: (i % 12, jax.random.PRNGKey(i)),
    )

    # --- vision tower fwd+bwd ---
    def vis_loss(lora_t, img, key):
        ctx = make_lora_context(lora_t, spec, "vision", cfg.vision_layers, rng=key)
        emb = encode_image(params, cfg, img, dtype=DTYPE, lora_ctx=ctx, remat=True)
        return jnp.sum(jnp.square(emb.astype(jnp.float32)))

    vis_fb = jax.jit(jax.value_and_grad(vis_loss))
    rows["vis_fb"] = _time_section(
        "vis_fb", lambda img, k: vis_fb(state.lora, img, k)[0],
        lambda i: (image_pool[i % n_pool], jax.random.PRNGKey(i)),
    )
    vis_f = jax.jit(vis_loss)
    rows["vis_f"] = _time_section(
        "vis_f", lambda img, k: vis_f(state.lora, img, k),
        lambda i: (image_pool[i % n_pool], jax.random.PRNGKey(i)),
    )

    # --- optimizer alone (fixed synthetic grads, scaled per iter) ---
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 1e-4, state.lora)

    def opt_step(scale):
        g = jax.tree_util.tree_map(lambda x: x * scale, grads)
        updates, opt_state = opt.update(g, state.opt_state, state.lora)
        return optax.apply_updates(state.lora, updates)

    opt_j = jax.jit(opt_step)
    rows["opt"] = _time_section(
        "opt", lambda s: opt_j(s), lambda i: (jnp.float32(1.0 + 0.01 * i),)
    )

    import math

    if math.isnan(rows["vis_fb"]):
        # the standalone vision fwd+bwd program exceeds the remote compile
        # helper's request-size limit (HTTP 413; the full step only
        # compiles because its persistent-cache entry predates the limit)
        # — derive it from the threaded full step instead
        rows["vis_fb_derived"] = rows["full"] - rows["text_fb"] - rows["opt"]
    rows["sections_sum"] = rows["text_fb"] + rows["vis_fb"] + rows["opt"]
    rows["imgs_per_sec_full"] = round(BS / rows["full"] * 1e3, 1)
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in rows.items()}), flush=True)


if __name__ == "__main__":
    main()
