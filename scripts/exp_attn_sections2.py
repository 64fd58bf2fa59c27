"""Round 2 of attention-half attribution: the inner section is FREE.

exp_attn_sections.py showed stubbing scores/softmax/PV/stacking/repack
changes tower time by <0.3% — the attention inner work hides behind the
kernel's binding resource. This round stubs the REMAINING sections of
_attn_half_int8_kernel to find it:

  attncopy    out = x (pure DMA floor of the attention half)
  attnresid   out = x + 0 GEMMs (LN+quant+epilogues gone, keeps dtypes)
  noln        h_ln = rows (skip mean/var normalize)
  noquantrt   x_q = rows.astype(int8) (skip scale/round/clip; keeps the
              f32->int8 relayout and the GEMM)
  noqkvepi    qkv GEMM raw s32 -> bf16 cast only (skip scale mul + bias)
  nooutepi    out-proj dequant skipped (proj = acc f32 cast)

Timing-only (numerics wrong). PYTHONPATH=... python scripts/exp_attn_sections2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def _timed(fn, x, iters=10, tag=""):
    for _ in range(2):
        o = fn(x)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(iters)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / iters * 1e3
    chk = float(jnp.sum(jnp.abs(outs[0].astype(jnp.float32))))
    print(f"  [{tag} checksum {chk:.6g}]", flush=True)
    return ms


def main():
    import jcf_tpu.ops.block_kernel as bk
    from jcf_tpu.models import VIT_B_32, init_clip_params
    from jcf_tpu.models.clip import vision_ln_z_amax
    from jcf_tpu.ops.quant import quantize_clip_params

    cfg = VIT_B_32
    params = init_clip_params(0, cfg)
    rng = np.random.default_rng(0)
    heads = {"visual": cfg.vision_heads, "text": cfg.text_heads}
    imgs = jnp.asarray(rng.random((32, 3, 224, 224)), jnp.float32)
    amax = jax.jit(lambda p, im: vision_ln_z_amax(p, cfg, im))(params, imgs)
    qp = jax.jit(
        lambda p, a: quantize_clip_params(
            p, fold=True, heads=heads, act_scales={"visual": a},
            act_static=("ctx", "hidden"),
        )["visual"]
    )(params, amax)
    blocks = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params["visual"]["blocks"]
    )
    x = jax.device_put(
        jnp.asarray(
            rng.standard_normal((4096, 50, cfg.vision_width)), jnp.bfloat16
        )
    )

    def fresh_tower():
        # a NEW function object per variant: jax caches traced jaxprs per
        # function identity, so re-jitting the same `tower` after a
        # monkeypatch silently reuses the UNPATCHED program
        def tower(x):
            return bk.run_fused_tower(
                x, blocks, cfg.vision_heads, quant=qp, quant_folded=True
            )
        return jax.jit(tower)

    orig = bk._attn_half_int8_kernel

    def make_kernel(mode):
        def kern(x_ref, ln_s_ref, ln_b_ref, ln_inv_ref, ctx_inv_ref,
                 shift_ref, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref,
                 wout_i8_ref, wout_sc_ref, bout_ref, bias_ref, out_ref,
                 *, n_heads, head_dim, scale, group, s_pad,
                 s_real=None, use_mask=True, folded=False,
                 static_act=False, static_ctx=False, static_shift=False,
                 dense=False):
            e = n_heads * head_dim
            gs = group * s_real
            rows = x_ref[...]
            if mode == "attncopy":
                out_ref[...] = rows
                return
            h_ln = rows if mode == "noln" else bk._ln_norm(rows)
            if mode == "attnresid":
                out_ref[...] = (h_ln + rows).astype(out_ref.dtype)
                return
            if mode == "noquantrt":
                x_q = h_ln.astype(jnp.int8)
            else:
                x_q = bk._quant_rows_static(h_ln, ln_inv_ref[0, 0])
            if mode == "noqkvepi":
                acc = jax.lax.dot_general(
                    x_q, wqkv_i8_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                qkv = acc.astype(jnp.bfloat16)
            else:
                qkv = bk._int8_gemm(
                    x_q, None, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref
                ).astype(jnp.bfloat16)
            qkv_att = jnp.concatenate(
                [jnp.pad(qkv[g * s_real : (g + 1) * s_real],
                         ((0, s_pad - s_real), (0, 0)))
                 for g in range(group)], axis=0)
            ctx = bk._batched_attention(
                qkv_att, bias_ref[...], n_heads, head_dim, None,
                group, s_pad, s_real=s_real, use_mask=False)
            ctx = jnp.concatenate(
                [ctx[g * s_pad : g * s_pad + s_real] for g in range(group)],
                axis=0)
            c_q = bk._quant_rows_static(ctx, ctx_inv_ref[0, 0])
            if mode == "nooutepi":
                proj = jax.lax.dot_general(
                    c_q, wout_i8_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                proj = bk._int8_gemm(c_q, None, wout_i8_ref, wout_sc_ref,
                                     bout_ref)
            out_ref[...] = (rows.astype(jnp.float32) + proj).astype(
                out_ref.dtype)
        return kern

    base = _timed(fresh_tower(), x, tag="base")
    print(f"base: {base:.2f} ms", flush=True)
    for mode in ("attncopy", "attnresid", "noln", "noquantrt",
                 "noqkvepi", "nooutepi"):
        bk._attn_half_int8_kernel = make_kernel(mode)
        try:
            t = _timed(fresh_tower(), x, tag=mode)
            print(f"{mode}: {t:.2f} ms (delta {base - t:+.2f})", flush=True)
        except Exception as exc:
            print(f"{mode}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)
        finally:
            bk._attn_half_int8_kernel = orig


if __name__ == "__main__":
    main()
