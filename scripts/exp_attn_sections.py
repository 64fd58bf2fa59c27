"""Per-section attribution of the attention-half fat (r4).

The b512 trace puts the attention halves at 52.6 ms/iter vs ~37 ms of
MXU ideal; the fat is distributed VPU passes. This times the DENSE int8
tower at serving scale with individual sections STUBBED (timing-only,
numerics intentionally wrong) by monkeypatching block_kernel internals:

  base     full serving config (dense, folded, static ln+hidden+ctx)
  nostack  k2/v2 built without the zero-masking selects
  nomax    softmax without the row-max reduction (exp(scores) direct)
  noexp    probabilities = raw scores (no max, no exp)
  nonorm   context unnormalized (no selector dot, no reciprocal multiply)
  noinner  _ATTN_STUB: whole scores/softmax/PV section gone
  norepack one tail pad instead of the per-crop dense->padded repack
           (and a head slice instead of the per-crop unpack)

Run on the real chip: PYTHONPATH=/root/repo:$PYTHONPATH python
scripts/exp_attn_sections.py. Each variant is one tower compile.
"""

import functools
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

    orig_pa = bk._paired_attention_nomask
    orig_kernel = bk._attn_half_int8_kernel

    def patched_pa(mode):
        def pa(q3, n_heads, head_dim, scale, group, s_pad, precision=None,
               *, s_real, score_shift=None):
            e = n_heads * head_dim
            d2 = 2 * head_dim
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2)
            lo_lane = (lane % d2) < head_dim
            row = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad, 1), 1)
            row_ok = row < s_real
            lo_mask = lo_lane & row_ok
            hi_mask = (~lo_lane) & row_ok
            r_i = jax.lax.broadcasted_iota(jnp.int32, (2 * s_pad, d2), 0)
            l_i = jax.lax.broadcasted_iota(jnp.int32, (2 * s_pad, d2), 1)
            sel = jnp.where(
                ((l_i < head_dim) & (r_i < s_real))
                | ((l_i >= head_dim) & (r_i >= s_pad) & (r_i < s_pad + s_real)),
                jnp.float32(1.0), jnp.float32(0.0),
            )
            k_all = q3[:, :, e : 2 * e]
            v_all = q3[:, :, 2 * e : 3 * e]
            zero = jnp.zeros_like(k_all)
            if mode == "nostack":
                k2_all = jnp.concatenate([k_all, k_all], axis=1)
                v2_all = jnp.concatenate([v_all, v_all], axis=1)
            else:
                k2_all = jnp.concatenate(
                    [jnp.where(lo_mask, k_all, zero),
                     jnp.where(hi_mask, k_all, zero)], axis=1)
                v2_all = jnp.concatenate(
                    [jnp.where(lo_mask, v_all, zero),
                     jnp.where(hi_mask, v_all, zero)], axis=1)
            selc = sel.astype(q3.dtype)
            ctx = []
            for p_idx in range(n_heads // 2):
                o = p_idx * d2
                qp_ = q3[:, :, o : o + d2]
                k2 = k2_all[:, :, o : o + d2]
                v2 = v2_all[:, :, o : o + d2]
                scores = jax.lax.dot_general(
                    qp_, k2, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=precision)
                if mode == "noexp":
                    p = scores
                elif mode == "nomax":
                    p = jnp.exp(scores * 0.01)
                else:
                    m = jnp.max(scores, axis=-1, keepdims=True)
                    p = jnp.exp(scores - m)
                pc = p.astype(v2.dtype)
                ctx_u = jax.lax.dot_general(
                    pc, v2, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=precision)
                if mode == "nonorm":
                    ctx.append(ctx_u)
                else:
                    sums = jax.lax.dot_general(
                        pc, selc, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)
                    ctx.append(ctx_u * (1.0 / jnp.maximum(sums, 1e-30)))
            return jnp.concatenate(ctx, axis=-1).reshape(group * s_pad, e)

        return pa

    def norepack_kernel(*refs, **kw):
        # same kernel, but repack/unpack replaced by one tail pad / head
        # slice (timing-only: token<->crop mapping is wrong)
        (x_ref, ln_s_ref, ln_b_ref, ln_inv_ref, ctx_inv_ref, shift_ref,
         wqkv_i8_ref, wqkv_sc_ref, bqkv_ref, wout_i8_ref, wout_sc_ref,
         bout_ref, bias_ref, out_ref) = refs
        n_heads = kw["n_heads"]
        e = n_heads * kw["head_dim"]
        group, s_pad, s_real = kw["group"], kw["s_pad"], kw["s_real"]
        gs = group * s_real
        rows = x_ref[...]
        h_ln = bk._ln_norm(rows)
        x_q = bk._quant_rows_static(h_ln, ln_inv_ref[0, 0])
        qkv = bk._int8_gemm(
            x_q, None, wqkv_i8_ref, wqkv_sc_ref, bqkv_ref
        ).astype(jnp.bfloat16)
        qkv_att = jnp.pad(qkv, ((0, group * s_pad - gs), (0, 0)))
        ctx = bk._batched_attention(
            qkv_att, bias_ref[...], n_heads, kw["head_dim"], None,
            group, s_pad, s_real=s_real, use_mask=False)
        ctx = ctx[:gs]
        c_q = bk._quant_rows_static(ctx, ctx_inv_ref[0, 0])
        proj = bk._int8_gemm(c_q, None, wout_i8_ref, wout_sc_ref, bout_ref)
        out_ref[...] = (rows.astype(jnp.float32) + proj).astype(out_ref.dtype)

    results = {}
    results["base"] = _timed(fresh_tower(), x, tag="base")
    print(f"base: {results['base']:.2f} ms", flush=True)

    for mode in ("nostack", "nomax", "noexp", "nonorm"):
        bk._paired_attention_nomask = patched_pa(mode)
        try:
            results[mode] = _timed(fresh_tower(), x, tag=mode)
            print(f"{mode}: {results[mode]:.2f} ms "
                  f"(delta {results['base'] - results[mode]:+.2f})",
                  flush=True)
        except Exception as exc:
            print(f"{mode}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)
        finally:
            bk._paired_attention_nomask = orig_pa

    bk._ATTN_STUB = True
    try:
        results["noinner"] = _timed(fresh_tower(), x, tag="noinner")
        print(f"noinner: {results['noinner']:.2f} ms "
              f"(delta {results['base'] - results['noinner']:+.2f})",
              flush=True)
    finally:
        bk._ATTN_STUB = False

    bk._attn_half_int8_kernel = norepack_kernel
    try:
        results["norepack"] = _timed(fresh_tower(), x, tag="norepack")
        print(f"norepack: {results['norepack']:.2f} ms "
              f"(delta {results['base'] - results['norepack']:+.2f})",
              flush=True)
    except Exception as exc:
        print(f"norepack: FAILED {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)
    finally:
        bk._attn_half_int8_kernel = orig_kernel


if __name__ == "__main__":
    main()
