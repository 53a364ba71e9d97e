"""Offline graph export: StableHLO artifacts for the compiled seams.

The TPU-native analogue of the reference's ONNX export toolchain
(export_image_onnx.py / export_memory_attention_onnx.py / export_other_onnx.py):
each accelerable seam is exported as a serialized StableHLO function via
jax.export, loadable without the model code (e.g. for serving systems or
cross-version deployment). Where the reference pre-baked TWO memory-attention
graphs with TRT optimization profiles, the masked fixed-capacity design needs
exactly ONE graph per seam.

CLI:
    python -m sam2_opt_tpu.export.export_stablehlo --variant hiera_l \
        --checkpoint ckpt.pt --out_dir exported/
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _register_serializations():
    from jax import export as jexport

    from sam2_opt_tpu.models.video_core import MemoryInput

    try:
        jexport.register_namedtuple_serialization(
            MemoryInput, serialized_name="sam2_opt_tpu.MemoryInput"
        )
    except ValueError:
        pass  # already registered


def _export_fn(fn, args, path: str):
    from jax import export as jexport

    _register_serializations()
    exported = jexport.export(jax.jit(fn))(*args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str):
    """Deserialize an exported seam; call via `.call(*args)`."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_all(model, out_dir: str, dtype=jnp.bfloat16,
               ptr_cap: int = 0) -> Dict[str, str]:
    """Export the four compiled seams (encoder e2e, memory attention via a
    full conditioned track step, memory encoder, mask decode) with the
    parameters baked in — the moral equivalent of the reference's
    forward_image / set_image_e2e / memory_attention_{...} / prompt+memory
    encoder ONNX set."""
    from sam2_opt_tpu.models import sam2_base as base
    from sam2_opt_tpu.models import video_core as vc
    from sam2_opt_tpu.models.model import _cast_tree

    os.makedirs(out_dir, exist_ok=True)
    cfg = model.cfg
    p = _cast_tree(model.params, dtype)
    S = cfg.image_size
    g = cfg.image_embedding_size
    out: Dict[str, str] = {}

    # 1) set_image_e2e (normalize + encoder + no-mem + head projections)
    def set_image_e2e(img):
        o = base.forward_image(p, cfg, base.image_normalize(img))
        f0, f1, f2 = o["backbone_fpn"]
        return f0, f1, f2 + p["no_mem_embed"][0, 0].astype(f2.dtype)

    path = os.path.join(out_dir, "set_image_e2e.stablehlo")
    _export_fn(set_image_e2e, (jnp.zeros((1, S, S, 3), dtype),), path)
    out["set_image_e2e"] = path

    # 2) conditioned track step (memory attention + heads + memory encoder).
    # Index fields are batched [1, S]/[1, P] exactly like the production
    # MemoryInput builders (predictors/video.py _gather_memory).
    # `ptr_cap` sizes the pointer region: the default is the config cap,
    # which covers single-cond-frame sessions; sessions with >= 2 past cond
    # frames grow pointers in buckets of 8 at runtime — re-export with a
    # larger ptr_cap to serve those shapes (one graph per bucket, the same
    # way TRT profiles would be re-built).
    P = ptr_cap or cfg.max_obj_ptrs_in_encoder
    mem = vc.MemoryInput(
        feats=tuple(jnp.zeros((1, g, g, cfg.mem_dim), jnp.bfloat16)
                    for _ in range(cfg.num_maskmem)),
        tpos_idx=jnp.zeros((1, cfg.num_maskmem), jnp.int32),
        valid=jnp.zeros((1, cfg.num_maskmem), bool),
        ptrs=tuple(jnp.zeros((1, cfg.hidden_dim), jnp.float32)
                   for _ in range(P)),
        ptr_pos=jnp.zeros((1, P), jnp.float32),
        ptr_valid=jnp.zeros((1, P), bool),
    )

    def track_cond(f0, f1, f2, mem):
        o = vc.track_step_conditioned(
            p, cfg, (f0, f1, f2), mem,
            multimask_output=True, run_mem_encoder=True, fill_hole_area=0,
        )
        return (o["pred_masks"], o["obj_ptr"], o["object_score_logits"],
                o["maskmem_features"])

    feats = (
        jnp.zeros((1, 4 * g, 4 * g, cfg.hidden_dim // 8), dtype),
        jnp.zeros((1, 2 * g, 2 * g, cfg.hidden_dim // 4), dtype),
        jnp.zeros((1, g, g, cfg.hidden_dim), dtype),
    )
    path = os.path.join(out_dir, "track_step.stablehlo")
    _export_fn(track_cond, (*feats, mem), path)
    out["track_step"] = path

    # 3) memory encoder
    def mem_enc(f2, high_res_masks, obj_score):
        return vc.encode_memory_only(p, cfg, f2, high_res_masks, obj_score,
                                     is_mask_from_pts=False)

    path = os.path.join(out_dir, "memory_encoder.stablehlo")
    _export_fn(
        mem_enc,
        (feats[2], jnp.zeros((1, 1, S, S), jnp.float32),
         jnp.zeros((1, 1), jnp.float32)),
        path,
    )
    out["memory_encoder"] = path

    # 4) prompt-encode + mask-decode (single point, multimask)
    def predict_masks(embed, f0, f1, coords, labels):
        from sam2_opt_tpu.models import mask_decoder as md
        from sam2_opt_tpu.models import prompt_encoder as pe

        sparse, dense = pe.prompt_encoder(p["sam_prompt_encoder"], cfg, coords, labels)
        image_pe = pe.get_dense_pe(p["sam_prompt_encoder"], (g, g)).astype(embed.dtype)
        return md.mask_decoder(
            p["sam_mask_decoder"], cfg, embed, image_pe,
            sparse.astype(embed.dtype), dense.astype(embed.dtype),
            multimask_output=True, high_res_features=(f0, f1),
        )[:2]

    path = os.path.join(out_dir, "predict_masks.stablehlo")
    _export_fn(
        predict_masks,
        (feats[2], feats[0], feats[1], jnp.zeros((1, 1, 2), jnp.float32),
         jnp.zeros((1, 1), jnp.int32)),
        path,
    )
    out["predict_masks"] = path
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="hiera_l")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out_dir", default="exported")
    args = parser.parse_args()

    from sam2_opt_tpu.build_sam import build_sam2

    model = build_sam2(args.variant, args.checkpoint)
    paths = export_all(model, args.out_dir)
    for name, path in paths.items():
        print(f"{name}: {path} ({os.path.getsize(path)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
