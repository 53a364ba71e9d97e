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


def rope_self_attention(p, cfg: MemoryAttentionConfig, q_in, k_in, v_in):
    """RoPE self-attention over the current frame's 4096 tokens
    (reference transformer.py:345-424 with q_len == k_len)."""
    num_heads = cfg.num_heads
    q = ops.separate_heads(ops.linear(p["q_proj"], q_in), num_heads)
    k = ops.separate_heads(ops.linear(p["k_proj"], k_in), num_heads)
    v = ops.separate_heads(ops.linear(p["v_proj"], v_in), num_heads)
    head_dim = q.shape[-1]
    ex, ey = cfg.rope_feat_sizes
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
    q = ops.separate_heads(ops.linear(p["q_proj"], q_in), num_heads)
    k = ops.separate_heads(ops.linear(p["k_proj"], k_in), num_heads)
    v = ops.separate_heads(ops.linear(p["v_proj"], v_in), num_heads)
    head_dim = q.shape[-1]
    ex, ey = cfg.rope_feat_sizes
    cos, sin = _rope_tables(head_dim, ex, ey, cfg.rope_theta)
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    q = posenc.apply_rotary(q, cos, sin)

    seq = ex * ey
    assert num_frame_tokens % seq == 0
    reps = num_frame_tokens // seq
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
    memory,       # [B, S, mem_dim]
    query_pos,    # [B, 4096, 256]
    memory_pos,   # [B, S, mem_dim]
    kv_mask,
    num_frame_tokens: int,
):
    """One memory-attention layer (reference memory_attention.py:18-109):
    pre-LN self-attn, pre-LN partial-RoPE cross-attn, FFN."""
    # Self-attention (pos_enc_at_attn=False in all shipped configs)
    tgt2 = ops.layer_norm(p["norm1"], tgt)
    qk = tgt2 + query_pos if cfg.pos_enc_at_attn else tgt2
    tgt = tgt + rope_self_attention(p["self_attn"], cfg, qk, qk, tgt2)

    # Cross-attention to memory
    tgt2 = ops.layer_norm(p["norm2"], tgt)
    q = tgt2 + query_pos if cfg.pos_enc_at_cross_attn_queries else tgt2
    k = memory + memory_pos if cfg.pos_enc_at_cross_attn_keys else memory
    tgt = tgt + rope_cross_attention(
        p["cross_attn_image"], cfg, q, k, memory, kv_mask, num_frame_tokens
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
    for i in range(len(p["layers"])):
        output = memory_attention_layer(
            p["layers"][i], cfg, output, memory, curr_pos, memory_pos, kv_mask,
            num_frame_tokens,
        )
    return ops.layer_norm(p["norm"], output)
