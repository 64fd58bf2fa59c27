"""Throughput benchmark: ViT-B/32 TTA inference, images/sec/chip.

BASELINE.md target: >= 5,000 images/sec/chip at N=8 crops on TPU v5e.

Measures the steady-state throughput of the full compiled TTA pipeline on
one chip: device-side crop sampling (center + 7 random views per image)
-> CLIP normalize -> int8 W8A8 ViT-B/32 forward with fused Pallas block
kernels -> L2 norm -> MTA solve -> 403-class logits. Source images are
staged on device once; each timed iteration uses a fresh RNG key so crops
differ.

Besides throughput, the run attaches a CORRECTNESS CERTIFICATE to the
benched config (VERDICT r1 #3/#7):
  - int8-vs-f32 ranking agreement through the SAME TTA pipeline on the
    same device-sampled crops (top-1 agreement, top-5 overlap) — the perf
    number provably belongs to a rankings-equivalent model;
  - a compile-smoke of the Pallas kernel variants the engine dispatches
    (packed attention, fused halves at an odd group size) asserted
    allclose against the XLA composable path on the real chip, so Mosaic
    regressions fail the bench run, not a later serving run.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...cert}

Env knobs: JCF_BENCH_BATCH, JCF_BENCH_VIEWS, JCF_BENCH_ITERS,
JCF_BENCH_QUANT=int8|none, JCF_BENCH_CERT=1|0, JCF_BENCH_SMOKE=1|0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compilation cache: compiles through the axon tunnel can take
# minutes; repeat bench runs (and the driver's end-of-round run) reuse them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _ranking_certificate(engine_q, params, cfg, images, text, key) -> dict:
    """int8 vs f32 through the same pipeline on the same crops."""
    from jcf_tpu.infer import TTAEngine

    engine_f32 = TTAEngine(
        params, cfg, dtype=jnp.float32,
        n_views=engine_q.n_views, normalize_views=True, quant=None,
    )
    imgs32 = images.astype(jnp.float32)
    modes_q = engine_q.features_from_images(images, text, key)
    modes_f = engine_f32.features_from_images(imgs32, text, key)
    logits_q = np.asarray(modes_q @ text.T)
    logits_f = np.asarray(modes_f @ text.T)

    top5_q = np.argsort(-logits_q, axis=1)[:, :5]
    top5_f = np.argsort(-logits_f, axis=1)[:, :5]
    top1_agree = float(np.mean(top5_q[:, 0] == top5_f[:, 0]))
    overlap = float(
        np.mean([len(set(a) & set(b)) / 5.0 for a, b in zip(top5_q, top5_f)])
    )
    cos = float(
        np.mean(
            np.sum(np.asarray(modes_q) * np.asarray(modes_f), axis=-1)
            / (
                np.linalg.norm(np.asarray(modes_q), axis=-1)
                * np.linalg.norm(np.asarray(modes_f), axis=-1)
            )
        )
    )
    _log(
        f"cert int8-vs-f32: top1_agree={top1_agree:.4f} "
        f"top5_overlap={overlap:.4f} mode_cos={cos:.6f}"
    )
    assert top1_agree >= 0.98, f"int8 flips top-1 rankings: {top1_agree}"
    assert overlap >= 0.95, f"int8 flips top-5 rankings: {overlap}"
    return {
        "int8_top1_agree": round(top1_agree, 4),
        "int8_top5_overlap": round(overlap, 4),
        "int8_mode_cos": round(cos, 6),
    }


def _kernel_smoke(params, cfg) -> str:
    """Compile + numerics smoke of the Pallas variants the engine
    dispatches, on the real chip, vs the XLA composable path."""
    from jcf_tpu.ops.attention import multi_head_attention
    from jcf_tpu.ops.block_kernel import run_fused_tower
    from jcf_tpu.ops.quant import quantize_clip_params

    rng = np.random.default_rng(3)
    e, h = cfg.vision_width, cfg.vision_heads
    blocks_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params["visual"]["blocks"]
    )
    qp = quantize_clip_params(params)["visual"]

    # packed attention kernel vs XLA at tower shapes
    x = jnp.asarray(rng.standard_normal((16, 50, e)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    attn_params = jax.tree_util.tree_map(
        lambda a: a[0].astype(jnp.bfloat16), params["visual"]["blocks"]["attn"]
    )
    a_pl = multi_head_attention(x, attn_params, h, None, impl="pallas")
    a_xla = multi_head_attention(x, attn_params, h, None, impl="xla")
    d = float(jnp.max(jnp.abs(a_pl.astype(jnp.float32) - a_xla.astype(jnp.float32))))
    assert d < 0.1, f"packed attention kernel drifted from XLA: {d}"

    # fused bf16 tower at an odd group size (36 -> group 6) vs composable
    x36 = jnp.asarray(rng.standard_normal((36, 50, e)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    from jcf_tpu.models.clip import _run_blocks

    y_fused = run_fused_tower(x36, blocks_bf16, h)
    y_comp = _run_blocks(x36, blocks_bf16, h, None, impl="xla")
    d = float(
        jnp.max(jnp.abs(y_fused.astype(jnp.float32) - y_comp.astype(jnp.float32)))
    )
    assert d < 0.5, f"fused bf16 tower drifted from composable: {d}"

    # fused int8 tower compiles and tracks bf16
    y_q = run_fused_tower(x36, blocks_bf16, h, quant=qp)
    cos = float(
        jnp.mean(
            jnp.sum(
                (y_q / jnp.linalg.norm(y_q, axis=-1, keepdims=True)).astype(jnp.float32)
                * (y_comp / jnp.linalg.norm(y_comp, axis=-1, keepdims=True)).astype(
                    jnp.float32
                ),
                axis=-1,
            )
        )
    )
    assert cos > 0.995, f"fused int8 tower drifted: cos {cos}"
    _log(f"kernel smoke ok (attn d<0.1, fused towers cos={cos:.5f})")
    return "ok"


def main() -> None:
    batch = int(os.environ.get("JCF_BENCH_BATCH", "128"))
    # total views per image (BASELINE's N=8): center + (N-1) random crops
    n_views_total = int(os.environ.get("JCF_BENCH_VIEWS", "8"))
    n_views = n_views_total - 1
    iters = int(os.environ.get("JCF_BENCH_ITERS", "20"))
    warmup = int(os.environ.get("JCF_BENCH_WARMUP", "3"))
    baseline = float(os.environ.get("JCF_BENCH_BASELINE", "5000"))
    # serving config: int8 W8A8 towers by default, certified against f32
    # below (rankings-equivalent; see JSON cert fields)
    quant = os.environ.get("JCF_BENCH_QUANT", "int8")
    quant = None if quant in ("", "none", "bf16") else quant
    run_cert = os.environ.get("JCF_BENCH_CERT", "1") == "1" and quant is not None
    # smoke compiles several extra kernel variants (~1 slow compile each
    # through the tunnel) — opt-in to keep the driver bench run bounded
    run_smoke = os.environ.get("JCF_BENCH_SMOKE", "0") == "1"
    # skip the cert if the throughput phase already burned this much wall
    # clock (cold compiles; the cert engine would add its own multi-minute
    # compile and risk losing the JSON to an outer timeout) — warm-cache
    # runs finish the throughput phase in ~60-90 s and the cert proceeds
    cert_deadline = float(os.environ.get("JCF_BENCH_CERT_DEADLINE", "360"))
    t_start = time.perf_counter()

    from jcf_tpu.infer import TTAEngine
    from jcf_tpu.models import VIT_B_32, init_clip_params

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    engine = TTAEngine(
        params,
        cfg,
        dtype=jnp.bfloat16,
        n_views=n_views,
        normalize_views=True,
        quant=quant,
    )

    rng = np.random.default_rng(0)
    # staged in the compute dtype: the serving host uploads bf16 pixels
    # (raw [0,1] range — normalization is folded into the patch embed)
    images = jax.device_put(
        jnp.asarray(rng.random((batch, 3, 256, 256)).astype(np.float32)).astype(
            jnp.bfloat16
        )
    )
    text = rng.standard_normal((403, cfg.embed_dim)).astype(np.float32)
    text = jax.device_put(jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True)))

    keys = jax.random.split(jax.random.PRNGKey(0), warmup + iters)

    # warmup / compile
    for i in range(warmup):
        out = engine.features_from_images(images, text, keys[i])
    jax.block_until_ready(out)

    start = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(engine.features_from_images(images, text, keys[warmup + i]))
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - start

    images_per_sec = batch * iters / elapsed
    record = {
        "metric": (
            f"ViT-B/32 TTA inference throughput (N={n_views_total} views/image "
            f"incl. center, {'int8 W8A8' if quant else 'bf16'}, device crops, MTA)"
        ),
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / baseline, 4),
    }

    try:
        if run_cert and time.perf_counter() - t_start > cert_deadline:
            record["cert"] = "skipped (cold-compile wall clock over deadline)"
            run_cert = False
        if run_cert:
            record.update(_ranking_certificate(engine, params, cfg, images, text, keys[0]))
        if run_smoke:
            record["kernel_smoke"] = _kernel_smoke(params, cfg)
    except AssertionError as exc:  # correctness gate: fail loudly
        record["cert_error"] = str(exc)
        print(json.dumps(record))
        raise
    except Exception as exc:  # cert infra failure: record, keep the number
        record["cert_error"] = f"{type(exc).__name__}: {str(exc)[:300]}"
        print(json.dumps(record))
        return

    print(json.dumps(record))


if __name__ == "__main__":
    main()
