"""Random parameter initialization for the full SAM2 tree.

Produces exactly the same pytree structure/shapes as
sam2_opt_tpu.io.torch_convert.convert_state_dict on a reference checkpoint, so
models can be trained from scratch or tested without torch. Initializers follow
the torch defaults loosely (kaiming-uniform-ish fan-in scaling for weights,
zero biases, trunc-normal 0.02 for learned tokens, matching
sam2_base_official.py:135-181).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam2_opt_tpu.config import SAM2Config


class _Init:
    def __init__(self, key):
        self._key = key

    def _next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def linear(self, d_in: int, d_out: int, bias: bool = True) -> Dict:
        bound = 1.0 / math.sqrt(d_in)
        p = {
            "weight": jax.random.uniform(
                self._next(), (d_in, d_out), jnp.float32, -bound, bound
            )
        }
        if bias:
            p["bias"] = jnp.zeros((d_out,), jnp.float32)
        return p

    def conv(self, kh: int, kw: int, c_in: int, c_out: int, groups: int = 1) -> Dict:
        fan_in = kh * kw * c_in
        bound = 1.0 / math.sqrt(max(fan_in, 1))
        return {
            "weight": jax.random.uniform(
                self._next(), (kh, kw, c_in // 1, c_out), jnp.float32, -bound, bound
            )
            if groups == 1
            else jax.random.uniform(
                self._next(), (kh, kw, 1, c_out), jnp.float32, -bound, bound
            ),
            "bias": jnp.zeros((c_out,), jnp.float32),
        }

    def conv_transpose(self, kh: int, kw: int, c_in: int, c_out: int) -> Dict:
        bound = 1.0 / math.sqrt(kh * kw * c_in)
        return {
            "weight": jax.random.uniform(
                self._next(), (kh, kw, c_out, c_in), jnp.float32, -bound, bound
            ),
            "bias": jnp.zeros((c_out,), jnp.float32),
        }

    def norm(self, dim: int) -> Dict:
        return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}

    def embed(self, n: int, dim: int, std: float = 0.02) -> Dict:
        return {"weight": std * jax.random.normal(self._next(), (n, dim))}

    def token(self, shape, std: float = 0.02):
        return std * jax.random.normal(self._next(), shape)

    def mlp(self, dims) -> Dict:
        return {"layers": {i: self.linear(dims[i], dims[i + 1]) for i in range(len(dims) - 1)}}

    def attention(self, embed_dim: int, internal: int, kv_in: int) -> Dict:
        return {
            "q_proj": self.linear(embed_dim, internal),
            "k_proj": self.linear(kv_in, internal),
            "v_proj": self.linear(kv_in, internal),
            "out_proj": self.linear(internal, embed_dim),
        }


def init_params(cfg: SAM2Config, key) -> Dict:
    ini = _Init(key)
    t = cfg.trunk
    E = t.embed_dim

    # trunk
    blocks = {}
    for i, spec in enumerate(t.block_plan()):
        dim, dim_out, nh = spec["dim"], spec["dim_out"], spec["num_heads"]
        b = {
            "norm1": ini.norm(dim),
            "attn": {
                "qkv": ini.linear(dim, 3 * dim_out),
                "proj": ini.linear(dim_out, dim_out),
            },
            "norm2": ini.norm(dim_out),
            "mlp": ini.mlp([dim_out, int(dim_out * t.mlp_ratio), dim_out]),
        }
        if dim != dim_out:
            b["proj"] = ini.linear(dim, dim_out)
        blocks[i] = b
    trunk = {
        "patch_embed": {"proj": ini.conv(*t.patch_kernel, 3, E)},
        "pos_embed": ini.token((1, *t.window_pos_embed_bkg_spatial_size, E)),
        "pos_embed_window": ini.token((1, t.window_spec[0], t.window_spec[0], E)),
        "blocks": blocks,
    }
    neck = {
        "convs": {
            j: {"conv": ini.conv(1, 1, c, cfg.neck.d_model)}
            for j, c in enumerate(cfg.neck.backbone_channel_list)
        }
    }

    # memory attention
    mac = cfg.memory_attention
    ma_layers = {}
    for i in range(mac.num_layers):
        ma_layers[i] = {
            "self_attn": ini.attention(mac.d_model, mac.d_model, mac.d_model),
            "cross_attn_image": ini.attention(mac.d_model, mac.d_model, mac.kv_in_dim),
            "linear1": ini.linear(mac.d_model, mac.dim_feedforward),
            "linear2": ini.linear(mac.dim_feedforward, mac.d_model),
            "norm1": ini.norm(mac.d_model),
            "norm2": ini.norm(mac.d_model),
            "norm3": ini.norm(mac.d_model),
        }
    memory_attention = {"layers": ma_layers, "norm": ini.norm(mac.d_model)}

    # memory encoder
    mec = cfg.memory_encoder
    enc = {}
    c_in, idx = 1, 0
    num_ds = int(math.log2(mec.mask_total_stride) // math.log2(mec.mask_downsampler_stride))
    for _ in range(num_ds):
        c_out = c_in * mec.mask_downsampler_stride**2
        enc[idx] = ini.conv(mec.mask_downsampler_kernel, mec.mask_downsampler_kernel, c_in, c_out)
        enc[idx + 1] = ini.norm(c_out)
        c_in = c_out
        idx += 3
    enc[idx] = ini.conv(1, 1, c_in, mec.in_dim)
    fuser_layers = {}
    for i in range(mec.fuser_num_layers):
        fuser_layers[i] = {
            "dwconv": ini.conv(mec.cx_kernel_size, mec.cx_kernel_size, mec.in_dim,
                               mec.in_dim, groups=mec.in_dim),
            "norm": ini.norm(mec.in_dim),
            "pwconv1": ini.linear(mec.in_dim, 4 * mec.in_dim),
            "pwconv2": ini.linear(4 * mec.in_dim, mec.in_dim),
            "gamma": 1e-6 * jnp.ones((mec.in_dim,)),
        }
    memory_encoder = {
        "mask_downsampler": {"encoder": enc},
        "pix_feat_proj": ini.conv(1, 1, mec.in_dim, mec.in_dim),
        "fuser": {"layers": fuser_layers},
        "out_proj": ini.conv(1, 1, mec.in_dim, mec.out_dim),
    }

    # prompt encoder
    C = cfg.hidden_dim
    mc = cfg.mask_in_chans
    prompt_encoder = {
        "pe_layer": {
            "positional_encoding_gaussian_matrix": jax.random.normal(
                jax.random.PRNGKey(17), (2, C // 2)
            )
        },
        "point_embeddings": {i: ini.embed(1, C) for i in range(4)},
        "not_a_point_embed": ini.embed(1, C),
        "mask_downscaling": {
            0: ini.conv(2, 2, 1, mc // 4),
            1: ini.norm(mc // 4),
            3: ini.conv(2, 2, mc // 4, mc),
            4: ini.norm(mc),
            6: ini.conv(1, 1, mc, C),
        },
        "no_mask_embed": ini.embed(1, C),
    }

    # mask decoder
    internal = C // 2  # attention_downsample_rate=2
    def twoway_layer():
        return {
            "self_attn": ini.attention(C, C, C),
            "norm1": ini.norm(C),
            "cross_attn_token_to_image": ini.attention(C, internal, C),
            "norm2": ini.norm(C),
            "mlp": ini.mlp([C, cfg.sam_mask_decoder_mlp_dim, C]),
            "norm3": ini.norm(C),
            "norm4": ini.norm(C),
            "cross_attn_image_to_token": ini.attention(C, internal, C),
        }

    num_mask_tokens = cfg.num_multimask_outputs + 1
    mask_decoder = {
        "transformer": {
            "layers": {i: twoway_layer() for i in range(cfg.sam_mask_decoder_depth)},
            "final_attn_token_to_image": ini.attention(C, internal, C),
            "norm_final_attn": ini.norm(C),
        },
        "iou_token": ini.embed(1, C),
        "mask_tokens": ini.embed(num_mask_tokens, C),
        "obj_score_token": ini.embed(1, C),
        "output_upscaling": {
            0: ini.conv_transpose(2, 2, C, C // 4),
            1: ini.norm(C // 4),
            3: ini.conv_transpose(2, 2, C // 4, C // 8),
        },
        "conv_s0": ini.conv(1, 1, C, C // 8),
        "conv_s1": ini.conv(1, 1, C, C // 4),
        "output_hypernetworks_mlps": {
            i: ini.mlp([C, C, C, C // 8]) for i in range(num_mask_tokens)
        },
        "iou_prediction_head": ini.mlp(
            [C] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1) + [num_mask_tokens]
        ),
        "pred_obj_score_head": ini.mlp([C, C, C, 1]),
    }

    params = {
        "image_encoder": {"trunk": trunk, "neck": neck},
        "memory_attention": memory_attention,
        "memory_encoder": memory_encoder,
        "sam_prompt_encoder": prompt_encoder,
        "sam_mask_decoder": mask_decoder,
        # projection variants per config flags (reference :317-325, :148-153):
        # SAM 2.1 uses MLP + Linear; 2.0-style configs use Linear / Identity
        # the MLP/Linear choice only applies when pointers are in use —
        # Identity otherwise, regardless of use_mlp (reference :322-330
        # nests the use_mlp branch inside `if use_obj_ptrs_in_encoder`)
        "obj_ptr_proj": (
            {} if not cfg.use_obj_ptrs_in_encoder
            else ini.mlp([C, C, C, C]) if cfg.use_mlp_for_obj_ptr_proj
            else ini.linear(C, C)
        ),
        "obj_ptr_tpos_proj": (
            ini.linear(C, cfg.mem_dim) if cfg.proj_tpos_enc_in_obj_ptrs else {}
        ),
        "mask_downsample": ini.conv(4, 4, 1, 1),
        "maskmem_tpos_enc": ini.token((cfg.num_maskmem, 1, 1, cfg.mem_dim)),
        "no_mem_embed": ini.token((1, 1, C)),
        "no_mem_pos_enc": ini.token((1, 1, C)),
        "no_obj_ptr": ini.token((1, C)),
        "no_obj_embed_spatial": ini.token((1, cfg.mem_dim)),
    }
    return params
