"""Fused vision-token assembly: conv output -> dense tower rows.

The serving vision path between the patchify conv and the fused tower is
pure elementwise glue — conv epilogue (per-column scale+bias), CLS
prepend, positional add, ln_pre, bf16 cast, dense flatten — but XLA
executes it as ~8 ms/iter of f32 traffic at 4096 crops (trace r4:
fusion.12 1.4 + copy.182 2.0 + reshape.75 2.0 + add_convert 2.7), because
the conv's batch-minor NHWC layout fights the tower's canonical row
layout and the [B', 50, 768] intermediates round-trip HBM in f32.

This kernel does the whole assembly in one pass over VMEM tiles and emits
the EXACT flat [B'*S, E] bf16 row stream the dense tower consumes
(`block_kernel.run_fused_tower(..., flat_s=s)`), so no padded [B, S, E]
intermediate ever exists in HBM:

  per crop g:  t   = conv_out[g] * col_scale + col_bias     (f32 epilogue)
               y   = t.astype(bf16) + pos_tail              (bf16, like
                                                             encode_image_tokens)
               out[g*S + 1:] = ln_pre(y).astype(bf16)
               out[g*S]     = cls_row  (precomputed: ln_pre(cls + pos[0])
                              is crop-independent — one [E] vector)

Numerics are BIT-IDENTICAL to the unfused path (models/clip.py
encode_image_tokens, reference jclip/model.py VisionTransformer.forward:
cls concat -> +pos -> ln_pre): same cast points, same f32 LN formula.

Capability parity: reference `jclip/model.py` VisionTransformer.forward
(conv1 -> flatten -> cls -> pos -> ln_pre); this fuses those five ops for
the TPU serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jcf_tpu.ops.block_kernel import _ln_rows


def _assemble_kernel(
    x_ref,        # [G, gy, gx, E] conv output tile (int32 or f32, NHWC)
    scale_ref,    # [1, E] f32 per-column epilogue scale
    cbias_ref,    # [1, E] f32 per-column epilogue bias
    pos_ref,      # [gy*gx, E] bf16 positional embedding tail (pos[1:])
    cls_ref,      # [1, E] bf16 precomputed ln_pre(cls + pos[0]) row
    lns_ref,      # [1, E] f32 ln_pre scale
    lnb_ref,      # [1, E] f32 ln_pre bias
    out_ref,      # [G*S, E] bf16 dense rows (S = gy*gx + 1)
    *, group, n_gy, n_gx, s_real,
):
    n_tok = n_gy * n_gx
    scale = scale_ref[0]
    cbias = cbias_ref[0]
    pos = pos_ref[...]
    lns = lns_ref[0]
    lnb = lnb_ref[0]
    for g in range(group):
        # [gy, E] strips concatenated on the sublane axis — Mosaic has no
        # free [gy, gx, E] -> [gy*gx, E] leading-dim merge (the middle dim
        # would need a sublane relayout), but trailing-2D loads are exact
        t = jnp.concatenate(
            [x_ref[g, r] for r in range(n_gy)], axis=0
        )  # [n_tok, E]
        t = t.astype(jnp.float32) * scale + cbias
        y = t.astype(jnp.bfloat16) + pos
        rows = _ln_rows(y, lns, lnb).astype(out_ref.dtype)  # [n_tok, E]
        base = g * s_real
        out_ref[base : base + 1, :] = cls_ref[...]
        out_ref[base + 1 : base + 1 + n_tok, :] = rows


def assemble_dense_rows(
    conv_out: jax.Array,   # [B', gy, gx, E] patchify conv output (NHWC)
    col_scale: jax.Array,  # [E] f32 epilogue scale (ones for pre-scaled)
    col_bias: jax.Array,   # [E] f32 epilogue bias (the folded embed bias)
    pos_tail: jax.Array,   # [gy*gx, E] positional embedding rows 1..S-1
    cls_row: jax.Array,    # [E] precomputed ln_pre'd CLS row
    ln_scale: jax.Array,   # [E] ln_pre scale
    ln_bias: jax.Array,    # [E] ln_pre bias
    *,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """-> [B' * (gy*gx + 1), E] flat dense rows for the fused tower."""
    b, n_gy, n_gx, e = conv_out.shape
    s_real = n_gy * n_gx + 1
    group = _pick_group(b)
    grid = b // group

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def vec(a):
        return a.reshape(1, e)

    return pl.pallas_call(
        functools.partial(
            _assemble_kernel, group=group, n_gy=n_gy, n_gx=n_gx,
            s_real=s_real,
        ),
        grid=(grid,),
        in_specs=[
            vmem((group, n_gy, n_gx, e), lambda i: (i, 0, 0, 0)),
            vmem((1, e), lambda i: (0, 0)),
            vmem((1, e), lambda i: (0, 0)),
            vmem((n_gy * n_gx, e), lambda i: (0, 0)),
            vmem((1, e), lambda i: (0, 0)),
            vmem((1, e), lambda i: (0, 0)),
            vmem((1, e), lambda i: (0, 0)),
        ],
        out_specs=vmem((group * s_real, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * s_real, e), dtype),
        interpret=interpret,
    )(
        conv_out,
        vec(col_scale.astype(jnp.float32)),
        vec(col_bias.astype(jnp.float32)),
        pos_tail.astype(dtype),
        vec(cls_row.astype(dtype)),
        vec(ln_scale.astype(jnp.float32)),
        vec(ln_bias.astype(jnp.float32)),
    )


def _pick_group(b: int, target: int = 16) -> int:
    # 16 crops/program: the [G,7,7,E] s32 input + [G*S,E] bf16 output tiles
    # double-buffer at ~7.3 MB; G=32 hit the 16.8 MB scoped-vmem limit on
    # v5e (17.18M, +388K over) at the 8192-crop serving batch.
    group = min(target, b)
    while b % group:
        group -= 1
    return group


def make_cls_row(
    class_embedding: jax.Array,  # [E]
    pos_row0: jax.Array,         # [E] positional embedding row 0
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    *,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """ln_pre(cls + pos[0]) with encode_image_tokens' exact cast points —
    crop-independent, so it is computed ONCE and broadcast by the kernel."""
    from jcf_tpu.ops.layers import layer_norm

    y = class_embedding.astype(dtype) + pos_row0.astype(dtype)
    return layer_norm(y[None, :], ln_scale, ln_bias)[0]


def assemble_reference(
    conv_out, col_scale, col_bias, pos_tail, cls_row, ln_scale, ln_bias,
    *, dtype=jnp.bfloat16,
):
    """Unfused XLA twin of assemble_dense_rows (tests + non-TPU backends)."""
    b, n_gy, n_gx, e = conv_out.shape
    from jcf_tpu.ops.layers import layer_norm

    t = (
        conv_out.reshape(b, n_gy * n_gx, e).astype(jnp.float32)
        * col_scale.astype(jnp.float32)
        + col_bias.astype(jnp.float32)
    )
    y = t.astype(dtype) + pos_tail.astype(dtype)
    rows = layer_norm(y, ln_scale, ln_bias).astype(dtype)
    out = jnp.concatenate(
        [jnp.broadcast_to(cls_row.astype(dtype), (b, 1, e)), rows], axis=1
    )
    return out.reshape(b * (n_gy * n_gx + 1), e)
