"""Capture a profiler trace of the real bench program and print the
device-time breakdown by op, aggregated from the perfetto trace.

The standalone component timings (exp_glue/exp_embed) measure DIFFERENT
XLA layouts than the fused bench program chooses in context — this is the
ground truth for where the 51 ms per 128-image batch actually goes.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/trace_bench.py
"""

import glob
import gzip
import json
import os
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/jcf_trace"


def main():
    from jcf_tpu.infer import TTAEngine
    from jcf_tpu.models import VIT_B_32, init_clip_params

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    rng = np.random.default_rng(0)
    images_np = rng.random((int(os.environ.get("JCF_TRACE_BATCH", "128")), 3, 256, 256)).astype(np.float32)
    engine = TTAEngine(params, cfg, dtype=jnp.bfloat16, n_views=7,
                       normalize_views=True, quant="int8",
                       embed_impl=os.environ.get("JCF_TRACE_EMBED", "conv"),
                       static_quant_mode=os.environ.get("JCF_TRACE_STATIC_MODE", "full"),
                       calibration_images=(
                           images_np if os.environ.get("JCF_TRACE_STATIC", "1") == "1"
                           else None))
    images = jax.device_put(jnp.asarray(images_np).astype(jnp.bfloat16))
    text = rng.standard_normal((403, cfg.embed_dim)).astype(np.float32)
    text = jax.device_put(jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True)))

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    for i in range(3):
        out = engine.features_from_images(images, text, keys[i])
    jax.block_until_ready(out)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        outs = [engine.features_from_images(images, text, keys[3 + i]) for i in range(3)]
        jax.block_until_ready(outs)

    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no perfetto trace found; files:",
              glob.glob(f"{TRACE_DIR}/**/*", recursive=True))
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # device-track events: aggregate wall duration by (trimmed) name
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        proc = pid_names.get(ev.get("pid"), "")
        if "TPU" not in proc and "tpu" not in proc.lower():
            continue
        name = ev.get("name", "")[:80]
        totals[name] += ev.get("dur", 0) / 1e3  # us -> ms
        counts[name] += 1
    print(f"device tracks: {sorted(set(pid_names.values()))}")
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    total = sum(totals.values())
    print(f"total device op time over 3 iters: {total:.2f} ms")
    for name, ms in items[:30]:
        print(f"{ms / 3:8.3f} ms/iter  x{counts[name] // 3:4d}  {name}")


if __name__ == "__main__":
    main()
