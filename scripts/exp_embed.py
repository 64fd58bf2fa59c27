"""A/B the patchify-embed formulations on chip.

v1 (current): one 6D dot_general straight off the NHCW views.
v2: explicit transpose to patch-major + one flat [M*49, 2304] GEMM.
v3: lax.conv_general_dilated stride-32 (XLA's conv path) from NCHW.

Measured standalone embed v1 = 5.9 ms at 1024 views — ~6x the GEMM
roofline; the 6D contraction forces a bad layout.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    which = os.environ.get("JCF_EMBED", "v2")
    rng = np.random.default_rng(0)
    m, p, e = 1024, 32, 768
    views = jax.device_put(jnp.asarray(
        rng.random((m, 224, 3, 224)).astype(np.float32)).astype(jnp.bfloat16))
    w4 = jax.device_put(jnp.asarray(
        rng.standard_normal((3, p, p, e)).astype(np.float32)).astype(jnp.bfloat16))
    g = 224 // p

    if which == "v1":
        def fn(v, w):
            x = v.reshape(m, g, p, 3, g, p)
            out = jax.lax.dot_general(
                x, w, (((2, 3, 5), (1, 0, 2)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(m, g * g, e)
    elif which == "v2":
        w_flat = w4.transpose(0, 1, 2, 3).reshape(3 * p * p, e)  # (c, ph, pw, e)
        def fn(v, w):
            x = v.reshape(m, g, p, 3, g, p)
            x = x.transpose(0, 1, 4, 3, 2, 5)  # [m, gh, gw, c, ph, pw]
            x = x.reshape(m * g * g, 3 * p * p)
            out = jnp.dot(x, w_flat, preferred_element_type=jnp.float32)
            return out.reshape(m, g * g, e)
    else:  # v3: conv from NCHW
        kern = w4.transpose(3, 0, 1, 2)  # [E, C, p, p]
        def fn(v, w):
            x = v.transpose(0, 2, 1, 3)  # NHCW -> NCHW
            out = jax.lax.conv_general_dilated(
                x, kern, (p, p), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(m, e, g * g).transpose(0, 2, 1)

    t = timed(jax.jit(fn), views, w4)
    print(f"embed {which}: {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
