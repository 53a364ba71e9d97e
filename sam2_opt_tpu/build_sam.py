"""Model/predictor builders (reference sam2/sam2/build_sam.py without hydra).

The reference resolves Hydra yaml names like "configs/sam2.1/sam2.1_hiera_l.yaml";
we accept those strings too and map them to config variants, so existing
call sites keep working.
"""

from __future__ import annotations

import re
from typing import Optional

from sam2_opt_tpu.models.model import SAM2Model, build_sam2 as _build_model


def _variant_from_config_name(name: str) -> str:
    m = re.search(r"hiera_(t|s|b\+|l)", name)
    if m:
        return f"hiera_{m.group(1)}"
    return name


def build_sam2(config_or_variant: str = "hiera_l", ckpt_path: Optional[str] = None,
               device=None, mode="eval", **kwargs) -> SAM2Model:
    """Build the core model (reference build_sam2, build_sam.py:71-97).

    Accepts a variant name ("hiera_l"), a reference config resource name
    ("configs/sam2.1/sam2.1_hiera_l.yaml" — mapped by variant), or a PATH
    to a reference Hydra yaml on disk, which is ingested field-by-field
    (io/hydra_config.py) so custom reference topologies port mechanically.
    """
    import os

    if (config_or_variant.endswith((".yaml", ".yml"))
            and os.path.exists(config_or_variant)):
        from sam2_opt_tpu.io.hydra_config import config_from_yaml

        return _build_model(cfg=config_from_yaml(config_or_variant),
                            checkpoint_path=ckpt_path)
    variant = _variant_from_config_name(config_or_variant)
    return _build_model(variant, checkpoint_path=ckpt_path)


def build_sam2_image_predictor(config_or_variant: str = "hiera_l",
                               ckpt_path: Optional[str] = None, **kwargs):
    from sam2_opt_tpu.predictors.image import SAM2ImagePredictor

    return SAM2ImagePredictor(build_sam2(config_or_variant, ckpt_path), **kwargs)


def build_sam2_video_predictor(config_or_variant: str = "hiera_l",
                               ckpt_path: Optional[str] = None,
                               vos_optimized: bool = False, **kwargs):
    """Build the video predictor (reference build_sam2_video_predictor,
    build_sam.py:100-141: adds binarize_mask_from_pts + fill_hole_area=8;
    vos_optimized selects the always-compiled variant :113-117). The tracker
    track is switchable via SAM2_VERSION_TRACK (official/legacy/dam4sam)."""
    from sam2_opt_tpu.predictors.variants import (
        SAM2VideoPredictorVOS,
        select_video_predictor_cls,
    )

    kwargs.setdefault("fill_hole_area", 8)
    model = build_sam2(config_or_variant, ckpt_path)
    cls = SAM2VideoPredictorVOS if vos_optimized else select_video_predictor_cls()
    return cls(model, **kwargs)


def build_sam2_hf(model_id: str, **kwargs):
    """HuggingFace-hub loader (reference build_sam.py:144-161). Downloads the
    torch checkpoint from the hub and converts it."""
    from huggingface_hub import hf_hub_download

    name_map = {
        "facebook/sam2.1-hiera-tiny": ("hiera_t", "sam2.1_hiera_tiny.pt"),
        "facebook/sam2.1-hiera-small": ("hiera_s", "sam2.1_hiera_small.pt"),
        "facebook/sam2.1-hiera-base-plus": ("hiera_b+", "sam2.1_hiera_base_plus.pt"),
        "facebook/sam2.1-hiera-large": ("hiera_l", "sam2.1_hiera_large.pt"),
    }
    if model_id not in name_map:
        raise ValueError(f"unknown hub model id {model_id}")
    variant, filename = name_map[model_id]
    ckpt = hf_hub_download(repo_id=model_id, filename=filename)
    return build_sam2(variant, ckpt, **kwargs)
