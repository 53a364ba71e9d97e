"""Hiera hierarchical ViT trunk + FPN neck (TPU-native, NHWC, pure functions).

Functional re-design of the reference trunk/neck
(sam2/sam2/modeling/backbones/hieradet.py, image_encoder.py). Everything is a
pure function of (params, inputs) with static shapes, so the whole image
encoder jit-compiles to a single XLA program.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import HieraConfig, FpnNeckConfig
from sam2_opt_tpu.ops import common as ops
from sam2_opt_tpu.ops import posenc


def _do_pool(x, stride: Tuple[int, int]):
    """Max-pool in NHWC (reference hieradet.py:25 do_pool)."""
    return ops.max_pool2d(x, stride, stride)


def _patch_embed_s2d(p, x):
    """7x7 stride-4 pad-3 patch embed as space-to-depth + 2x2 conv.

    The direct conv contracts only 3 input channels per tap — ~1% MXU
    utilization, measured 1.36 ms of the hiera-L encode on v5e. Rewriting it
    as: pad the kernel to 8x8 (zero tap), space-to-depth the input by 4
    (exact for stride 4), then a VALID 2x2 conv over 4*4*3=48 packed
    channels, computes the identical sums with an MXU-shaped contraction
    (192 wide). Output o reads padded columns [4o, 4o+8) = original taps
    [4o-3, 4o+4]; the added tap is zero-weighted, and the trailing
    pad/output row is sliced off.
    """
    w, b = p["proj"]["weight"], p["proj"]["bias"]  # [7,7,3,C] HWIO
    B, H, W, Cin = x.shape
    C = w.shape[-1]
    # kernel: [7,7,3,C] -> zero-pad to [8,8,3,C] -> [2,4,2,4,3,C] -> [2,2,48,C]
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w8 = w8.reshape(2, 4, 2, 4, Cin, C).transpose(0, 2, 1, 3, 4, 5)
    w8 = w8.reshape(2, 2, 16 * Cin, C).astype(x.dtype)
    # input: pad (3,5) -> [B, H/4+2, W/4+2, 48]
    xq = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    hb, wb = xq.shape[1] // 4, xq.shape[2] // 4
    xs = xq.reshape(B, hb, 4, wb, 4, Cin).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, hb, wb, 16 * Cin)
    y = jax.lax.conv_general_dilated(
        xs, w8, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return y[:, : H // 4, : W // 4, :] + b.astype(x.dtype)


def _packed_window_max_tokens() -> int:
    """Windows with <= this many tokens route to the packed block-diagonal
    Pallas kernel (kernels/window_attention.py) instead of the einsum path.
    Env override SAM2_TPU_PACKED_WINDOW=<max tokens|0>. Read at jit-trace
    time: changing it after a shape has compiled has no effect until the jit
    cache is cleared (e.g. model.set_runtime_backend(...) or a new process)."""
    import os

    v = os.environ.get("SAM2_TPU_PACKED_WINDOW", "")
    if v:
        try:
            return int(v)
        except ValueError:
            return 0
    return 0


def _flash_window_min_tokens() -> int:
    """Smallest window (tokens) routed through the fused per-window flash
    kernel (kernels/window_attention.py window_flash_3d) instead of the
    einsum path. Env override SAM2_TPU_FLASH_WINDOW_MIN; 0 disables.

    MEASURED NEGATIVE IN-TRUNK on v5e — default stays OFF: in isolation the
    kernel wins at stage-3's 256-token windows (27 vs 40 us — its S² logits
    stay in VMEM; tools/bench_window_flash.py), but inside the full encode
    the einsum's logits chain fuses with its neighbors while the kernel's
    layout transposes do not: stage 3 measured 11.17 -> 12.65 ms with
    SAM2_TPU_FLASH_WINDOW_MIN=256 (tools/bench_hiera_stages.py). Kept for
    re-evaluation on other TPU generations. Read at jit-trace time — see
    _packed_window_max_tokens."""
    import os

    try:
        v = int(os.environ.get("SAM2_TPU_FLASH_WINDOW_MIN", "0"))
        return v if v > 0 else 1 << 30
    except ValueError:
        return 1 << 30


def _flat_window_min_tokens() -> int:
    """Smallest window (tokens) whose runs keep the token-flat
    [B*nW, 1, ws*ws, C] layout (see hiera() below). Env override
    SAM2_TPU_FLAT_WINDOW_MIN (default 256, the measured v5e crossover:
    flat wins for stage-3's 256-token windows and loses for the 16/64-token
    stages). Read at jit-trace time — see _packed_window_max_tokens."""
    import os

    try:
        return int(os.environ.get("SAM2_TPU_FLAT_WINDOW_MIN", "256"))
    except ValueError:
        return 256


def _global_in_window_run() -> bool:
    """Opt-in (SAM2_TPU_GLOBAL_IN_WINDOW=1): run global-attention blocks on
    the window-ordered token layout instead of breaking the surrounding
    window run. Read at jit-trace time — see _packed_window_max_tokens.

    Global attention is permutation-equivariant and hiera injects position
    only via the patch-embed pos_embed, so a global block computes identical
    per-token features whether tokens arrive in raster or window order
    (verified to 1.5e-8 relative in f32) — and [B*nW, 1, ws², C] ->
    [B, 1, nW*ws², C] is a FREE reshape (row-major window-major order),
    while window_unpartition/partition are HBM transposes. Only taken when
    the run formed without padding (the run gate already requires exact
    divisibility), the block keeps dim and has no q_pool — true for all
    three stage-3 globals of hiera-L.

    MEASURED NEGATIVE on v5e — default stays OFF: same-process interleaved
    A/B of the full hiera-L 1024² trunk (in-graph fori differencing, median
    of 9) measured 19.34 ms window-ordered vs 18.81 ms with the round trips,
    non-overlapping distributions. The attention op itself sees identical
    [B, 4096, C] shapes either way; the loss is in how XLA lays out and
    fuses the run tensor around the [16,1,256,C] <-> [1,1,4096,C] reshape —
    the "free" reshape forces a relayout the explicit transposes apparently
    let XLA schedule better. Kept for other TPU generations."""
    import os

    return os.environ.get("SAM2_TPU_GLOBAL_IN_WINDOW", "0") == "1"


def _split_window_min_tokens() -> int:
    """Smallest window (tokens) routed to the split-qkv einsum path; smaller
    windows keep the interleaved SDPA path. Env override
    SAM2_TPU_SPLIT_WINDOW_MIN (default 64, the measured v5e crossover).
    Read at jit-trace time — see _packed_window_max_tokens."""
    import os

    try:
        return int(os.environ.get("SAM2_TPU_SPLIT_WINDOW_MIN", "64"))
    except ValueError:
        return 64


def _split_window_attention(p, x, num_heads: int, packed: bool = False):
    """Windowed attention with split q/k/v projections and einsum attention in
    the natural [windows, tokens, heads, head_dim] layout.

    Equivalent math to the interleaved-qkv + SDPA path, but the three output
    slices come straight out of their own matmuls (no strided gather from the
    [.., 3, h, d] tensor) and the contraction runs without pre/post
    [B,h,S,d] transposes. Measured on v5e (hiera-L, bf16): 0.159 -> 0.097 ms
    per stage-3 block (~2 ms/encode over its 33 windowed blocks), with a
    smaller gain at stage 1; stage 2's 16-token windows measured faster on
    the interleaved path, hence the S >= 64 gate at the call site.
    """
    B, H, W, C = x.shape
    S = H * W
    head_dim = C // num_heads
    xf = x.reshape(B, S, C)
    qp = p["qkv"]

    if "w_int8" in qp:
        # Per-output-channel scales slice cleanly by column range, so each of
        # q/k/v is its own quantized matmul (XLA CSEs the shared activation
        # quantization on the act_scale path).
        from sam2_opt_tpu.quant.int8 import quantized_linear

        def proj(lo, hi):
            sub = {"w_int8": qp["w_int8"][:, lo:hi], "w_scale": qp["w_scale"][lo:hi]}
            if "bias" in qp:
                sub["bias"] = qp["bias"][lo:hi]
            if "act_scale" in qp:
                sub["act_scale"] = qp["act_scale"]
            return quantized_linear(sub, xf).reshape(B, S, num_heads, head_dim)
    else:
        wqkv, bqkv = qp["weight"], qp["bias"]

        def proj(lo, hi):
            y = jnp.matmul(xf, wqkv[:, lo:hi], preferred_element_type=x.dtype)
            return (y + bqkv[lo:hi]).reshape(B, S, num_heads, head_dim)

    q, k, v = proj(0, C), proj(C, 2 * C), proj(2 * C, 3 * C)
    if packed:
        from sam2_opt_tpu.kernels.window_attention import packed_window_attention

        out = packed_window_attention(q, k, v)
    elif S >= _flash_window_min_tokens():
        from sam2_opt_tpu.kernels.window_attention import window_flash_3d

        out = window_flash_3d(
            q, k, v,
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )
    else:
        acc = x.dtype if ops.use_fast_softmax() else jnp.float32
        s = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=acc)
        s = s * jnp.asarray(1.0 / math.sqrt(head_dim), acc)
        probs = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum(
            "nhqk,nkhd->nqhd", probs.astype(v.dtype), v,
            preferred_element_type=x.dtype,
        )
    return ops.linear(p["proj"], out.reshape(B, H, W, C))


def multiscale_attention(p, x, num_heads: int, q_stride=None):
    """Windowed/global attention with optional query pooling
    (reference hieradet.py:39-81). x: [B, H, W, C] -> [B, H', W', C_out]."""
    B, H, W, _ = x.shape

    # bf16 TPU fast paths for the windowed blocks (see _split_window_attention)
    if (
        q_stride is None
        and x.dtype == jnp.bfloat16
        and ops.use_flash_attention()
    ):
        S = H * W
        if S <= _packed_window_max_tokens():
            return _split_window_attention(p, x, num_heads, packed=True)
        if _split_window_min_tokens() <= S <= 1024:
            return _split_window_attention(p, x, num_heads)

    qkv = ops.linear(p["qkv"], x.reshape(B, H * W, -1))
    qkv = qkv.reshape(B, H * W, 3, num_heads, -1)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    if q_stride is not None:
        q = q.reshape(B, H, W, -1)
        q = _do_pool(q, q_stride)
        H, W = q.shape[1], q.shape[2]
        q = q.reshape(B, H * W, num_heads, -1)

    # Pallas flash kernel for the global-attention blocks (4096^2 softmax kept
    # in VMEM); windowed attention stays on fused XLA SDPA, which measured
    # faster than a per-window kernel (see kernels/window_attention.py).
    out = ops.flash_or_sdpa(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)
    out = out.reshape(B, H, W, -1)
    return ops.linear(p["proj"], out)


def _use_fused_mlp() -> bool:
    """Opt-in route through kernels/fused_mlp.py (SAM2_TPU_FUSED_MLP=1).

    MEASURED NEGATIVE on v5e (kept for other TPU generations): the Pallas
    fused MLP loses 15-55% to XLA's unfused graph at every hiera stage shape
    (s1 274 vs 177 us, s3 157 vs 137 us) — XLA overlaps the hidden tensor's
    HBM round trip with MXU compute, so the fusion saves no wall-clock, and
    the in-kernel GELU serializes VPU work between the two matmuls.
    Read at jit-trace time — see _packed_window_max_tokens."""
    import os

    return os.environ.get("SAM2_TPU_FUSED_MLP", "0") == "1"


def _block_mlp(p, x):
    """norm2 + 2-layer GELU MLP + residual, with the optional fused route."""
    xn = ops.layer_norm(p["norm2"], x, eps=1e-6)
    m = p["mlp"]["layers"]
    # the fused kernel reads raw bf16 weights — int8-quantized layers
    # ({w_int8, w_scale} in place of weight) stay on ops.mlp, which
    # dispatches through the quantized linear
    if (x.dtype == jnp.bfloat16 and _use_fused_mlp()
            and "weight" in m[0] and "weight" in m[1]):
        from sam2_opt_tpu.kernels.fused_mlp import fused_mlp

        return x + fused_mlp(
            xn, m[0]["weight"], m[0]["bias"], m[1]["weight"], m[1]["bias"],
            fast_act=True,
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )
    return x + ops.mlp(p["mlp"], xn, num_layers=2, activation=ops.gelu)


def multiscale_block(p, x, spec: dict, q_stride: Tuple[int, int], mlp_ratio: float,
                     windowed: bool = False):
    """One Hiera block (reference hieradet.py:84-166).

    `windowed=True` means x is ALREADY in token-flat window layout
    ([B*nW, 1, ws*ws, C] — flat so the two minor dims fill whole TPU tiles,
    see hiera() below) and the output stays windowed: residual/LN/MLP are
    pointwise over tokens and attention sees the same ws*ws token set, so
    consecutive same-window blocks skip the unpartition -> partition HBM
    round trip between them entirely (the caller hoists the layout changes
    to window-run boundaries). Only valid for non-pooling windowed blocks
    with dim == dim_out — which is every block that is not a stage
    transition or a global block.
    """
    dim, dim_out = spec["dim"], spec["dim_out"]
    window_size = spec["window_size"]
    has_pool = spec["q_pool"]

    shortcut = x
    x = ops.layer_norm(p["norm1"], x, eps=1e-6)

    if windowed:
        x = shortcut + multiscale_attention(p["attn"], x, spec["num_heads"])
        return _block_mlp(p, x)

    if dim != dim_out:
        shortcut = ops.linear(p["proj"], x)
        if has_pool:
            shortcut = _do_pool(shortcut, q_stride)

    H, W = x.shape[1], x.shape[2]
    pad_hw = (H, W)
    if window_size > 0:
        x, pad_hw = ops.window_partition(x, window_size)

    x = multiscale_attention(
        p["attn"], x, spec["num_heads"], q_stride=q_stride if has_pool else None
    )

    out_ws = window_size
    if has_pool:
        out_ws = window_size // q_stride[0]
        H, W = shortcut.shape[1], shortcut.shape[2]
        if out_ws > 0:
            pad_h = (out_ws - H % out_ws) % out_ws
            pad_w = (out_ws - W % out_ws) % out_ws
            pad_hw = (H + pad_h, W + pad_w)

    if window_size > 0:
        x = ops.window_unpartition(x, out_ws, pad_hw, (H, W))

    x = shortcut + x
    return _block_mlp(p, x)


def hiera_pos_embed(p, h: int, w: int, cfg: HieraConfig):
    """Interpolated global+window positional embedding
    (reference hieradet.py:273-281). Returns [1, h, w, C]."""
    pos = p["pos_embed"]  # [1, bh, bw, C]
    C = pos.shape[-1]
    pos = jax.image.resize(pos, (1, h, w, C), method="cubic", antialias=False)
    win = p["pos_embed_window"]  # [1, ws, ws, C]
    reps = (1, h // win.shape[1], w // win.shape[2], 1)
    pos = pos + jnp.tile(win, reps)
    return pos


def hiera(p, x, cfg: HieraConfig, max_blocks: int | None = None) -> List[jnp.ndarray]:
    """Full trunk: [B, H, W, 3] image -> 4-scale NHWC feature pyramid,
    highest resolution first (reference hieradet.py:283-299).

    `max_blocks` truncates the trunk after that many blocks and appends the
    (unpartitioned) running tensor as the final output — used by the
    per-stage profiler (tools/bench_hiera_stages.py) so it times exactly the
    production block routing rather than a reimplementation."""
    if (
        x.dtype == jnp.bfloat16
        and cfg.patch_stride == (4, 4)
        and cfg.patch_padding == (3, 3)
        and p["patch_embed"]["proj"]["weight"].shape[:2] == (7, 7)
        and x.shape[1] % 4 == 0
        and x.shape[2] % 4 == 0
    ):
        x = _patch_embed_s2d(p["patch_embed"], x)
    else:
        x = ops.conv2d(
            p["patch_embed"]["proj"],
            x,
            stride=cfg.patch_stride,
            padding=[(cfg.patch_padding[0],) * 2, (cfg.patch_padding[1],) * 2],
        )
    x = x + hiera_pos_embed(p, x.shape[1], x.shape[2], cfg).astype(x.dtype)

    plan = cfg.block_plan()
    truncated = max_blocks is not None and max_blocks < len(plan)
    if max_blocks is not None:
        plan = plan[:max_blocks]
    stage_ends = set(cfg.stage_ends)
    outputs = []
    # Window-run layout persistence: between consecutive windowed blocks with
    # the same window size (no pooling, no padding) the unpartition ->
    # partition pair is the identity on real tokens (everything between is
    # pointwise), so the tensor stays in window layout across the run and the
    # HBM transpose round trips collapse to one per run boundary.
    #
    # Large-window runs (ws*ws >= SAM2_TPU_FLAT_WINDOW_MIN tokens, default
    # 256 = hiera-L stage 3) are additionally kept TOKEN-FLAT as
    # [B*nW, 1, ws*ws, C] instead of [B*nW, ws, ws, C]. Measured on v5e:
    # stage 3 (33 blocks, 16x16 windows) 12.35 -> 11.28 ms; the small-window
    # stages measured SLOWER flat (s1 1.94 -> 2.19, s2 3.32 -> 3.99,
    # s4 0.89 -> 1.35 — XLA's fusions handle their (ws, C) minors fine), so
    # they keep the square layout. Identical math either way (attention over
    # the same ws*ws token sets; pointwise ops are shape-agnostic).
    cur_ws = 0          # 0 = flat [B, H, W, C]
    cur_flat = False    # True = run tensor is [B*nW, 1, ws*ws, C]
    flat_hw = None      # (H, W) of the flat view while windowed
    for i, spec in enumerate(plan):
        ws = spec["window_size"]
        runnable = (
            ws > 0
            and not spec["q_pool"]
            and spec["dim"] == spec["dim_out"]
            and (x.shape[1] % ws == 0 and x.shape[2] % ws == 0
                 if cur_ws == 0 else cur_ws == ws)
        )
        # Opt-in (measured negative on v5e, see _global_in_window_run):
        # global blocks inside a window run stay in window-ordered token
        # layout — reshape to [B, 1, nW*ws², C], attend over all tokens,
        # reshape back, skipping 2 HBM transposes per global block.
        if (
            cur_ws != 0
            and ws == 0
            and not spec["q_pool"]
            and spec["dim"] == spec["dim_out"]
            and _global_in_window_run()
        ):
            shape_w = x.shape
            n_win = (flat_hw[0] // cur_ws) * (flat_hw[1] // cur_ws)
            xg = x.reshape(shape_w[0] // n_win, 1, -1, shape_w[-1])
            blk = functools.partial(
                multiscale_block, spec=spec, q_stride=cfg.q_stride,
                mlp_ratio=cfg.mlp_ratio,
            )
            if cfg.remat_blocks:
                blk = jax.checkpoint(blk)
            x = blk(p["blocks"][i], xg).reshape(shape_w)
            if i in stage_ends:
                if cur_flat:
                    x = x.reshape(-1, cur_ws, cur_ws, x.shape[-1])
                x = ops.window_unpartition(x, cur_ws, flat_hw, flat_hw)
                cur_ws = 0
                outputs.append(x)
            continue
        want_ws = ws if runnable else 0
        if cur_ws != want_ws:
            if cur_ws != 0:
                if cur_flat:
                    x = x.reshape(-1, cur_ws, cur_ws, x.shape[-1])
                x = ops.window_unpartition(
                    x, cur_ws, flat_hw, flat_hw
                )
            if want_ws != 0:
                flat_hw = (x.shape[1], x.shape[2])
                x, _ = ops.window_partition(x, want_ws)
                cur_flat = want_ws * want_ws >= _flat_window_min_tokens()
                if cur_flat:
                    x = x.reshape(
                        x.shape[0], 1, want_ws * want_ws, x.shape[-1]
                    )
            cur_ws = want_ws
        blk = functools.partial(
            multiscale_block, spec=spec, q_stride=cfg.q_stride,
            mlp_ratio=cfg.mlp_ratio, windowed=cur_ws != 0,
        )
        if cfg.remat_blocks:
            # per-block rematerialization: under grad, only each block's
            # INPUT is saved; its intermediates are recomputed one block at
            # a time in the backward pass (training-memory knob, see
            # HieraConfig.remat_blocks)
            blk = jax.checkpoint(blk)
        x = blk(p["blocks"][i], x)
        if i in stage_ends:
            if cur_ws != 0:
                if cur_flat:
                    x = x.reshape(-1, cur_ws, cur_ws, x.shape[-1])
                x = ops.window_unpartition(x, cur_ws, flat_hw, flat_hw)
                cur_ws = 0
            outputs.append(x)
    if truncated:
        if cur_ws != 0:
            if cur_flat:
                x = x.reshape(-1, cur_ws, cur_ws, x.shape[-1])
            x = ops.window_unpartition(x, cur_ws, flat_hw, flat_hw)
        if not plan or (len(plan) - 1) not in stage_ends:
            outputs.append(x)
    return outputs


def fpn_neck(p, xs: List[jnp.ndarray], cfg: FpnNeckConfig):
    """FPN neck (reference image_encoder.py:45-134). xs highest-res first.

    Returns (features, pos) lists in the same order (highest-res first), NHWC.
    Lateral 1x1 convs; top-down 2x-nearest fusion only on `fpn_top_down_levels`.
    """
    n = len(xs) - 1
    out = [None] * len(xs)
    pos = [None] * len(xs)
    prev = None
    for i in range(n, -1, -1):
        lateral = ops.conv2d(p["convs"][n - i]["conv"], xs[i])
        if i in cfg.fpn_top_down_levels and prev is not None:
            top_down = ops.upsample2x_nearest(prev.astype(jnp.float32)).astype(
                lateral.dtype
            )
            prev = lateral + top_down
            if cfg.fuse_type == "avg":
                prev = prev / 2
        else:
            prev = lateral
        out[i] = prev
        h, w = prev.shape[1], prev.shape[2]
        pe = posenc.sine_pos_embed_2d(h, w, cfg.pos_num_feats)
        pos[i] = jnp.broadcast_to(pe[None], (prev.shape[0], h, w, pe.shape[-1])).astype(
            prev.dtype
        )
    return out, pos


def image_encoder(p, x, trunk_cfg: HieraConfig, neck_cfg: FpnNeckConfig, scalp: int = 1):
    """Trunk + neck with `scalp` lowest-res levels dropped
    (reference image_encoder.py:14-42). Returns dict of NHWC tensors."""
    features, pos = fpn_neck(p["neck"], hiera(p["trunk"], x, trunk_cfg), neck_cfg)
    if scalp > 0:
        features, pos = features[:-scalp], pos[:-scalp]
    return {
        "vision_features": features[-1],
        "vision_pos_enc": pos,
        "backbone_fpn": features,
    }
