"""Memory attention (TPU-native functional form).

Re-design of sam2/sam2/modeling/memory_attention.py:18-381 and the RoPE
attention in sam2/sam2/modeling/sam/transformer.py:297-424.

Key TPU-first departure from the reference: instead of two separately exported
graphs ("none"/"exclude") with dynamic memory length, there is ONE compiled
graph over a fixed-capacity memory layout:

    kv = [ num_frames * 4096 spatial-memory tokens | ptr_capacity obj-ptr tokens ]

with a boolean validity mask. RoPE is applied to the (static) spatial region
only — rotating masked-out padding slots is harmless because attention masks
them — and obj-ptr tokens are never rotated, reproducing the reference's
`num_k_exclude_rope` partial-RoPE semantics (transformer.py:392-418) without
any data-dependent shapes.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import MemoryAttentionConfig
from sam2_opt_tpu.ops import common as ops
from sam2_opt_tpu.ops import posenc


@lru_cache(maxsize=8)
def _rope_tables(dim: int, end_x: int, end_y: int, theta: float):
    # numpy-valued (safe to cache across jit traces; becomes an XLA constant)
    return posenc.axial_rope_cos_sin(dim, end_x, end_y, theta)


@lru_cache(maxsize=8)
def _rope_half_tables(dim: int, end_x: int, end_y: int, theta: float):
    return posenc.rope_half_tables(dim, end_x, end_y, theta)


@lru_cache(maxsize=8)
def _kv_half_tables(dim: int, end_x: int, end_y: int, theta: float,
                    reps: int, n_extra: int):
    """Split-layout K tables for the fixed-capacity memory: the axial table
    tiled per 4096-token frame (rope_k_repeat, transformer.py:380-381) plus
    identity rows for the never-rotated obj-ptr tokens
    (num_k_exclude_rope, transformer.py:392-418)."""
    import numpy as np

    c, s = posenc.rope_half_tables(dim, end_x, end_y, theta)
    c = np.concatenate(
        [np.tile(c, (reps, 1)), np.ones((n_extra, c.shape[1]), c.dtype)]
    )
    s = np.concatenate(
        [np.tile(s, (reps, 1)), np.zeros((n_extra, s.shape[1]), s.dtype)]
    )
    return c, s


def _use_fused_rope(q_len: int, kv_len: int) -> bool:
    """Route through the rope-fused Pallas kernel (SAM2_TPU_FUSED_ROPE,
    default on) when the flash kernel would be used anyway: K is then
    rotated in-kernel as the kv stream loads, instead of making an extra
    HBM round trip through an XLA rotary op per layer. Read at jit-trace
    time: flipping the env var after a shape has compiled has no effect
    until the jit cache is cleared."""
    import os

    if os.environ.get("SAM2_TPU_FUSED_ROPE", "1") == "0":
        return False
    return ops.use_flash_attention() and q_len * kv_len >= 1024 * 1024


def _use_fused_kv_proj() -> bool:
    """Fuse the cross-attn K/V projections into the flash kernel
    (SAM2_TPU_FUSED_KV_PROJ, default OFF; single-head cross-attn only).

    Measured on v5e: the memory-attention stack is MXU-compute-bound, and
    the in-kernel per-block projections serialize against the attention
    matmuls — 4.24 ms (best blocks 2048x512) vs 3.9 ms for the plain
    rope-fused kernel with XLA-side projections. Kept behind the flag for
    bandwidth-starved TPU generations where the 4x kv-stream saving wins.
    Read at jit-trace time — see _use_fused_rope."""
    import os

    return os.environ.get("SAM2_TPU_FUSED_KV_PROJ", "0") == "1"


def _perm_proj(p, perm):
    """Permute the OUTPUT channels of a projection so rotation operates on
    contiguous half-lanes (ops/posenc.py split_perm). Weight is [in, out].

    Int8-quantized projections (quant/int8.py) permute the int8 columns and
    the per-output-channel scales identically; the per-tensor input-side
    act_scale is permutation-invariant."""
    if "w_int8" in p:
        out = {"w_int8": p["w_int8"][:, perm], "w_scale": p["w_scale"][perm]}
        if "act_scale" in p:
            out["act_scale"] = p["act_scale"]
    else:
        out = {"weight": p["weight"][:, perm]}
    if "bias" in p:
        out["bias"] = p["bias"][perm]
    return out


def _proj_out_dim(p) -> int:
    """Output width of a (possibly int8-quantized) projection."""
    w = p.get("weight")
    return (w if w is not None else p["w_int8"]).shape[1]


def rope_self_attention(p, cfg: MemoryAttentionConfig, q_in, k_in, v_in):
    """RoPE self-attention over the current frame's 4096 tokens
    (reference transformer.py:345-424 with q_len == k_len)."""
    num_heads = cfg.num_heads
    ex, ey = cfg.rope_feat_sizes
    head_dim = _proj_out_dim(p["q_proj"]) // num_heads

    if _use_fused_rope(q_in.shape[1], k_in.shape[1]) and q_in.shape[1] == ex * ey:
        from sam2_opt_tpu.kernels.flash_attention import flash_attention

        perm = posenc.split_perm(head_dim, num_heads)
        q = ops.separate_heads(ops.linear(_perm_proj(p["q_proj"], perm), q_in),
                               num_heads)
        k = ops.separate_heads(ops.linear(_perm_proj(p["k_proj"], perm), k_in),
                               num_heads)
        v = ops.separate_heads(ops.linear(p["v_proj"], v_in), num_heads)
        c, s = _rope_half_tables(head_dim, ex, ey, cfg.rope_theta)
        cj = jnp.asarray(c, q.dtype)
        sj = jnp.asarray(s, q.dtype)
        q = posenc.apply_rotary_split(q, cj, sj)
        out = flash_attention(q, k, v, rope_cos_k=cj, rope_sin_k=sj)
        return ops.linear(p["out_proj"], ops.recombine_heads(out))

    q = ops.separate_heads(ops.linear(p["q_proj"], q_in), num_heads)
    k = ops.separate_heads(ops.linear(p["k_proj"], k_in), num_heads)
    v = ops.separate_heads(ops.linear(p["v_proj"], v_in), num_heads)
    cos, sin = _rope_tables(head_dim, ex, ey, cfg.rope_theta)
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    q = posenc.apply_rotary(q, cos, sin)
    k = posenc.apply_rotary(k, cos, sin)
    out = ops.flash_or_sdpa(q, k, v)
    return ops.linear(p["out_proj"], ops.recombine_heads(out))


def rope_cross_attention(
    p,
    cfg: MemoryAttentionConfig,
    q_in,        # [B, 4096, 256]
    k_in,        # [B, S, mem_dim]
    v_in,        # [B, S, mem_dim]
    kv_mask,     # [B, S] bool or None
    num_frame_tokens: int,
):
    """Partial-RoPE cross-attention: keys in the spatial-memory region get the
    axial RoPE table tiled per 4096-token frame (rope_k_repeat,
    transformer.py:380-381); obj-ptr keys are left unrotated."""
    num_heads = cfg.num_heads
    ex, ey = cfg.rope_feat_sizes
    seq = ex * ey
    assert num_frame_tokens % seq == 0
    reps = num_frame_tokens // seq
    head_dim = _proj_out_dim(p["q_proj"]) // num_heads

    if _use_fused_rope(q_in.shape[1], k_in.shape[1]) and q_in.shape[1] == seq:
        from sam2_opt_tpu.kernels import flash_attention as fa

        perm = posenc.split_perm(head_dim, num_heads)
        q = ops.separate_heads(ops.linear(_perm_proj(p["q_proj"], perm), q_in),
                               num_heads)
        cq, sq_ = _rope_half_tables(head_dim, ex, ey, cfg.rope_theta)
        q = posenc.apply_rotary_split(
            q, jnp.asarray(cq, q.dtype), jnp.asarray(sq_, q.dtype)
        )
        n_extra = k_in.shape[1] - num_frame_tokens
        ck, sk = _kv_half_tables(head_dim, ex, ey, cfg.rope_theta, reps, n_extra)
        ckj = jnp.asarray(ck, q.dtype)
        skj = jnp.asarray(sk, q.dtype)
        if (num_heads == 1 and _use_fused_kv_proj()
                and "weight" in p["k_proj"] and "weight" in p["v_proj"]):
            # (int8-quantized k/v projections cannot stream raw weights into
            # the kernel; they take the XLA-side projection branch below)
            # deepest fusion: stream kv at mem_dim width, project + bias +
            # rotate in-kernel (the projected K/V never hit HBM)
            kp = _perm_proj(p["k_proj"], perm)
            out = fa.flash_attention_kv_proj(
                q, k_in, v_in,
                kp["weight"].astype(q.dtype), kp["bias"],
                p["v_proj"]["weight"].astype(q.dtype), p["v_proj"]["bias"],
                kv_mask=kv_mask, rope_cos_k=ckj, rope_sin_k=skj,
            )
        else:
            k = ops.separate_heads(
                ops.linear(_perm_proj(p["k_proj"], perm), k_in), num_heads
            )
            v = ops.separate_heads(ops.linear(p["v_proj"], v_in), num_heads)
            out = fa.flash_attention(
                q, k, v, kv_mask=kv_mask, rope_cos_k=ckj, rope_sin_k=skj,
            )
        return ops.linear(p["out_proj"], ops.recombine_heads(out))

    q = ops.separate_heads(ops.linear(p["q_proj"], q_in), num_heads)
    k = ops.separate_heads(ops.linear(p["k_proj"], k_in), num_heads)
    v = ops.separate_heads(ops.linear(p["v_proj"], v_in), num_heads)
    cos, sin = _rope_tables(head_dim, ex, ey, cfg.rope_theta)
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    q = posenc.apply_rotary(q, cos, sin)

    k_frames = k[:, :, :num_frame_tokens, :]
    k_ptrs = k[:, :, num_frame_tokens:, :]
    cos_k = jnp.tile(cos, (reps, 1))
    sin_k = jnp.tile(sin, (reps, 1))
    k_frames = posenc.apply_rotary(k_frames, cos_k, sin_k)
    k = jnp.concatenate([k_frames, k_ptrs], axis=2)

    out = ops.flash_or_sdpa(q, k, v, kv_mask=kv_mask)
    return ops.linear(p["out_proj"], ops.recombine_heads(out))


def memory_attention_layer(
    p,
    cfg: MemoryAttentionConfig,
    tgt,          # [B, 4096, 256]
    mem_k,        # [B, S, mem_dim] cross-attn key input (pos already added)
    mem_v,        # [B, S, mem_dim] cross-attn value input
    query_pos,    # [B, 4096, 256]
    kv_mask,
    num_frame_tokens: int,
):
    """One memory-attention layer (reference memory_attention.py:18-109):
    pre-LN self-attn, pre-LN partial-RoPE cross-attn, FFN. The key input
    (memory + memory_pos under pos_enc_at_cross_attn_keys) is layer-invariant
    and hoisted to memory_attention()."""
    # Self-attention (pos_enc_at_attn=False in all shipped configs)
    tgt2 = ops.layer_norm(p["norm1"], tgt)
    qk = tgt2 + query_pos if cfg.pos_enc_at_attn else tgt2
    tgt = tgt + rope_self_attention(p["self_attn"], cfg, qk, qk, tgt2)

    # Cross-attention to memory
    tgt2 = ops.layer_norm(p["norm2"], tgt)
    q = tgt2 + query_pos if cfg.pos_enc_at_cross_attn_queries else tgt2
    tgt = tgt + rope_cross_attention(
        p["cross_attn_image"], cfg, q, mem_k, mem_v, kv_mask, num_frame_tokens
    )

    # FFN
    tgt2 = ops.layer_norm(p["norm3"], tgt)
    act = jax.nn.relu if cfg.activation == "relu" else ops.gelu
    tgt2 = ops.linear(p["linear2"], act(ops.linear(p["linear1"], tgt2)))
    return tgt + tgt2


def memory_attention(
    p,
    cfg: MemoryAttentionConfig,
    curr,         # [B, 4096, 256] current-frame features
    memory,       # [B, S, mem_dim] fixed-capacity memory bank tokens
    curr_pos,     # [B, 4096, 256]
    memory_pos,   # [B, S, mem_dim]
    kv_mask=None,  # [B, S] bool validity; None = all valid
    num_frame_tokens: Optional[int] = None,
):
    """Full 4-layer memory attention (reference memory_attention.py:263-349).

    `num_frame_tokens` marks the static boundary between spatial-memory tokens
    (RoPE'd) and obj-ptr tokens (not RoPE'd); defaults to the full length.
    """
    if num_frame_tokens is None:
        num_frame_tokens = memory.shape[1]
    output = curr
    if cfg.pos_enc_at_input and curr_pos is not None:
        output = output + 0.1 * curr_pos
    # layer-invariant: the cross-attn key input (memory + pos) is the same for
    # every layer — add once instead of once per layer
    mem_k = memory + memory_pos if cfg.pos_enc_at_cross_attn_keys else memory
    for i in range(len(p["layers"])):
        output = memory_attention_layer(
            p["layers"][i], cfg, output, mem_k, memory, curr_pos, kv_mask,
            num_frame_tokens,
        )
    return ops.layer_norm(p["norm"], output)
