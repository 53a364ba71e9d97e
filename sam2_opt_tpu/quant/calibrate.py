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


class _LinearCapture:
    """Context manager that instruments ops.linear (eager execution only) to
    record the input absmax of every matching linear. Also forces the plain
    (non-Pallas, non-permuted) attention paths for the duration so every
    projection goes through ops.linear with its ORIGINAL weight leaf (the
    fused-RoPE path projects through permuted weight copies the id-based
    lookup cannot attribute)."""

    def __init__(self, params: Dict, pattern: str):
        self.rx = re.compile(pattern)
        self.records: Dict[str, List[float]] = {}
        self._id_to_name = {}
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            key = jax.tree_util.keystr(path)
            parts = re.findall(r"\[([^\]]+)\]", key)
            name = ".".join(p.strip("'\"") for p in parts)
            self._id_to_name[id(leaf)] = name

    def __enter__(self):
        from sam2_opt_tpu.ops import common as ops

        self._orig_linear = ops.linear
        self._env = {
            k: os.environ.get(k)
            for k in ("SAM2_TPU_FLASH", "SAM2_TPU_FUSED_ROPE")
        }
        os.environ["SAM2_TPU_FLASH"] = "0"
        os.environ["SAM2_TPU_FUSED_ROPE"] = "0"

        def shim(p, x):
            w = p.get("weight")
            if w is not None and not isinstance(w, dict) and np.ndim(w) == 2:
                name = self._id_to_name.get(id(w))
                if name is not None and self.rx.search(name):
                    amax = float(jnp.max(jnp.abs(x)))
                    self.records.setdefault(name, []).append(amax)
            return self._orig_linear(p, x)

        ops.linear = shim
        return self

    def __exit__(self, *exc):
        from sam2_opt_tpu.ops import common as ops

        ops.linear = self._orig_linear
        for k, v in self._env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        return False

    def scales(self, percentile: float) -> Dict[str, float]:
        out = {}
        for name, vals in self.records.items():
            v = (np.percentile(np.asarray(vals), percentile)
                 if len(vals) > 4 else max(vals))
            out[name] = float(max(v, 1e-6) / 127.0)
        return out


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
    from sam2_opt_tpu.models import sam2_base as base

    with _LinearCapture(params, pattern) as cap:
        for batch in batches:
            base.forward_image(params, cfg, base.image_normalize(
                jnp.asarray(batch)))
    return cap.scales(percentile)


def collect_tracking_activation_scales(
    params: Dict,
    cfg,
    batches,
    pattern: str,
    percentile: float = 99.99,
) -> Dict[str, float]:
    """Activation scales for the TRACKING hot path (memory attention + SAM
    heads + encoder), which the reference never quantizes (its int8 stops at
    the encoder engines, quant_image_encoder.py:8-75).

    Each calibration image is driven through the real tracking graph
    eagerly: encode -> init track step (center click, memory encoded) ->
    one memory-conditioned track step against a FULL-capacity memory bank
    built from that frame's own memory (all num_maskmem slots + all pointer
    slots valid — the steady-state shape), capturing every matching linear's
    input absmax along the way."""
    from sam2_opt_tpu.models import sam2_base as base
    from sam2_opt_tpu.models import video_core as vc

    S_img = cfg.image_size
    with _LinearCapture(params, pattern) as cap:
        for batch in batches:
            img = jnp.asarray(batch)
            B = img.shape[0]
            out = base.forward_image(params, cfg, base.image_normalize(img))
            f0, f1, f2 = out["backbone_fpn"]
            coords = jnp.full((B, 1, 2), S_img / 2.0, jnp.float32)
            labels = jnp.ones((B, 1), jnp.int32)
            init = vc.track_step_init(
                params, cfg, (f0, f1, f2), coords, labels, None,
                multimask_output=True, run_mem_encoder=True,
            )
            S, P = cfg.num_maskmem, cfg.max_obj_ptrs_in_encoder
            mm = init["maskmem_features"].astype(f2.dtype)
            ptr = init["obj_ptr"]
            mem = vc.MemoryInput(
                feats=tuple(mm for _ in range(S)),
                tpos_idx=jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                                          (B, S)),
                valid=jnp.ones((B, S), bool),
                ptrs=tuple(ptr for _ in range(P)),
                ptr_pos=jnp.broadcast_to(
                    (jnp.arange(P, dtype=jnp.float32) / max(P - 1, 1))[None],
                    (B, P),
                ),
                ptr_valid=jnp.ones((B, P), bool),
            )
            vc.track_step_conditioned(
                params, cfg, (f0, f1, f2), mem,
                multimask_output=True, run_mem_encoder=True,
            )
    return cap.scales(percentile)


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
