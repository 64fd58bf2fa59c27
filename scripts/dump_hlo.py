"""Dump the optimized HLO of the bench serving program and print the
definitions of named ops (fusion.161, copy.142, ...) the Perfetto trace
attributes time to — maps trace names back to source computations.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/dump_hlo.py [names...]
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from jcf_tpu.infer import TTAEngine
    from jcf_tpu.models import VIT_B_32, init_clip_params

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    rng = np.random.default_rng(0)
    images_np = rng.random(
        (int(os.environ.get("JCF_TRACE_BATCH", "128")), 3, 256, 256)
    ).astype(np.float32)
    engine = TTAEngine(params, cfg, dtype=jnp.bfloat16, n_views=7,
                       normalize_views=True, quant="int8",
                       embed_impl=os.environ.get("JCF_TRACE_EMBED") or None,
                       static_quant_mode=os.environ.get(
                           "JCF_TRACE_STATIC_MODE", "full"),
                       calibration_images=images_np)
    images = jnp.asarray(images_np).astype(jnp.bfloat16)
    text = rng.standard_normal((403, cfg.embed_dim)).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    key = jax.random.PRNGKey(0)

    lowered = engine._features_from_images.lower(
        engine._params, images, text, key)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = os.environ.get("JCF_HLO_OUT", "/tmp/bench_hlo.txt")
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")

    names = sys.argv[1:] or ["fusion.161", "copy.142"]
    lines = txt.splitlines()
    for name in names:
        print(f"\n===== {name} =====")
        for i, ln in enumerate(lines):
            s = ln.strip()
            if s.startswith(f"%{name} ") or s.startswith(f"{name} ") or (
                f" {name} = " in ln
            ):
                print(ln[:400])


if __name__ == "__main__":
    main()
