"""Int8 activation calibration driver.

Replicates calibrator/image_encode.py semantics (reference :1-107): load up to
`max_images` jpg/png calibration images, resize to the model resolution,
scale to [0,1], optionally ImageNet-normalize (`do_norm` — False for the e2e
graph whose normalize lives inside, reference quant_image_encoder.py:22,57),
then run the encoder with activation capture to collect per-layer input
absmax/percentile scales — standing in for the TRT entropy calibrator.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sam2_opt_tpu.quant.int8 import DEFAULT_QUANT_PATTERN


class ImageEncodeCalibratorDataset:
    """Calibration image pipeline (reference calibrator/image_encode.py:10-107)."""

    def __init__(self, images_path: str, batch_size: int = 1,
                 image_size: int = 1024, do_norm: bool = False,
                 max_images: Optional[int] = 2000):
        # max_images=None means no cap (the [:None] slice keeps everything)
        self.image_size = image_size
        self.do_norm = do_norm
        names = [
            p for p in sorted(os.listdir(images_path))
            if os.path.splitext(p)[-1].lower() in (".jpg", ".jpeg", ".png")
        ][:max_images]
        self.paths = [os.path.join(images_path, p) for p in names]
        if not self.paths:
            raise ValueError(
                f"no calibration images (.jpg/.jpeg/.png) found in "
                f"{images_path!r}: activation-quant int8 needs a directory of "
                f"images (reference calibrator/image_encode.py:84-107). For "
                f"weight-only int8 pass activation_quant=False instead."
            )
        self.batch_size = batch_size

    def __len__(self):
        return len(self.paths) // self.batch_size

    def preprocess(self, path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(path).convert("RGB").resize(
            (self.image_size, self.image_size), Image.BILINEAR
        )
        x = np.asarray(img, np.float32) / 255.0
        if self.do_norm:
            x = (x - np.asarray([0.485, 0.456, 0.406])) / np.asarray(
                [0.229, 0.224, 0.225]
            )
        return x.astype(np.float32)

    def batches(self):
        for i in range(len(self)):
            chunk = self.paths[i * self.batch_size : (i + 1) * self.batch_size]
            yield np.stack([self.preprocess(p) for p in chunk])


def collect_activation_scales(
    params: Dict,
    cfg,
    batches,
    pattern: str = DEFAULT_QUANT_PATTERN,
    percentile: float = 99.99,
) -> Dict[str, float]:
    """Run the encoder over calibration batches, recording the input-activation
    absmax for every linear that will be quantized. Returns
    {dotted weight name: per-tensor scale}."""
    from sam2_opt_tpu.ops import common as ops
    from sam2_opt_tpu.models import sam2_base as base

    rx = re.compile(pattern)
    records: Dict[str, List[float]] = {}

    # instrument ops.linear via a capture shim (eager execution)
    orig_linear = ops.linear
    name_stack: List[str] = []

    def traced_forward(p_tree, img):
        return base.forward_image(p_tree, cfg, base.image_normalize(img))

    # Build name->param-id map so the shim can identify which linear it is in
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    id_to_name = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        parts = re.findall(r"\[([^\]]+)\]", key)
        name = ".".join(p.strip("'\"") for p in parts)
        id_to_name[id(leaf)] = name

    def shim(p, x):
        w = p.get("weight")
        if w is not None and not isinstance(w, dict) and np.ndim(w) == 2:
            name = id_to_name.get(id(w))
            if name is not None and rx.search(name):
                amax = float(jnp.max(jnp.abs(x)))
                records.setdefault(name, []).append(amax)
        return orig_linear(p, x)

    ops.linear = shim
    try:
        for batch in batches:
            traced_forward(params, jnp.asarray(batch))
    finally:
        ops.linear = orig_linear

    scales = {}
    for name, vals in records.items():
        v = np.percentile(np.asarray(vals), percentile) if len(vals) > 4 else max(vals)
        scales[name] = float(max(v, 1e-6) / 127.0)
    return scales


def quantize_model(model, images_path: Optional[str] = None,
                   pattern: str = DEFAULT_QUANT_PATTERN,
                   activation_quant: bool = False, max_images: int = 32):
    """One-call int8 quantization of a SAM2Model (the quant_image_encoder.py
    equivalent). Weight-only unless images_path given and activation_quant.

    Thin wrapper over SAM2Model.quantize_int8: quantizes the COMPUTE params
    only (the fp32 master tree is untouched, so speedup("eager") still
    restores the parity path), raises if calibration yields no scales, and
    bounds calibration to `max_images` images."""
    model.quantize_int8(
        calib_dir=images_path if activation_quant else None,
        activation_quant=activation_quant,
        pattern=pattern,
        max_images=max_images,
    )
    return model
