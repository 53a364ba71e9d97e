"""Torch checkpoint -> JAX params pytree converter.

Parity requirement (SURVEY.md §5 checkpoint/resume): users of the reference load
`sd["model"]` torch state_dicts (reference sam2/sam2/build_sam.py:164-174). This
module converts those tensors into the nested pytree consumed by
sam2_opt_tpu.models.*:

- conv kernels:            OIHW  -> HWIO
- conv-transpose kernels:  IOHW  -> HWOI  (mask decoder output_upscaling only)
- linear weights:          [out, in] -> [in, out]
- embeddings / learned tokens / buffers: unchanged
- 4-D positional embeddings (pos_embed, pos_embed_window): NCHW -> NHWC

Key paths mirror the torch module names, with integer components becoming
int-keyed dict levels (e.g. "image_encoder.trunk.blocks.3.attn.qkv.weight" ->
params["image_encoder"]["trunk"]["blocks"][3]["attn"]["qkv"]["weight"]).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

# Learned-token / embedding weights that must NOT be transposed despite being
# 2-D "weight" tensors.
_EMBED_WEIGHT_RES = [
    re.compile(r"point_embeddings\.\d+\.weight$"),
    re.compile(r"not_a_point_embed\.weight$"),
    re.compile(r"no_mask_embed\.weight$"),
    re.compile(r"iou_token\.weight$"),
    re.compile(r"mask_tokens\.weight$"),
    re.compile(r"obj_score_token\.weight$"),
]

# 4-D parameters that are positional embeddings in NCHW, not conv kernels.
_NCHW_PARAM_RES = [
    re.compile(r"pos_embed$"),
    re.compile(r"pos_embed_window$"),
]


def _is_match(key: str, patterns) -> bool:
    return any(p.search(key) for p in patterns)


def convert_tensor(key: str, value: np.ndarray) -> np.ndarray:
    """Convert one torch tensor to the jax-side layout."""
    v = np.asarray(value)
    if _is_match(key, _NCHW_PARAM_RES):
        return np.transpose(v, (0, 2, 3, 1))  # NCHW -> NHWC
    if v.ndim == 4 and key.endswith("weight"):
        # one transpose covers both layouts: conv OIHW -> HWIO and
        # conv-transpose IOHW -> HWOI relabel the same axis permutation
        return np.transpose(v, (2, 3, 1, 0))
    if v.ndim == 2 and key.endswith("weight") and not _is_match(key, _EMBED_WEIGHT_RES):
        return np.transpose(v)  # [out, in] -> [in, out]
    return v


def insert(tree: Dict, key: str, value) -> None:
    parts = [int(p) if p.isdigit() else p for p in key.split(".")]
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_state_dict(state_dict: Mapping[str, np.ndarray], dtype=np.float32) -> Dict:
    """Convert a full torch state_dict (numpy-valued mapping) to a params tree."""
    tree: Dict = {}
    for key, value in state_dict.items():
        v = convert_tensor(key, np.asarray(value)).astype(dtype)
        insert(tree, key, v)
    return tree


def infer_variant(state_dict: Mapping[str, "np.ndarray"]) -> str:
    """Infer the model variant from a reference `sd["model"]` state_dict by
    trunk depth + embed dim (reference build_sam.py maps config names to
    these; checkpoints carry no explicit variant tag)."""
    depth = 1 + max(
        int(m.group(1))
        for k in state_dict
        for m in [re.match(r"image_encoder\.trunk\.blocks\.(\d+)\.", k)]
        if m
    )
    embed_dim = np.asarray(
        state_dict["image_encoder.trunk.patch_embed.proj.weight"]
    ).shape[0]
    table = {(12, 96): "hiera_t", (16, 96): "hiera_s",
             (24, 112): "hiera_b+", (48, 144): "hiera_l"}
    try:
        return table[(depth, embed_dim)]
    except KeyError:
        raise ValueError(
            f"unrecognized checkpoint: trunk depth {depth}, embed {embed_dim}"
        )


def load_torch_checkpoint(path: str, dtype=np.float32) -> Dict:
    """Load a reference .pt checkpoint (expects sd["model"], matching
    build_sam.py:164-174) and convert to a params tree. Requires torch."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd:
        sd = sd["model"]
    np_sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_state_dict(np_sd, dtype=dtype)


def as_jax(tree, dtype=None):
    """Move a converted numpy tree onto the default JAX device."""
    import jax.numpy as jnp

    def _leaf(x):
        a = jnp.asarray(x)
        return a.astype(dtype) if dtype is not None else a

    import jax

    return jax.tree_util.tree_map(_leaf, tree)
