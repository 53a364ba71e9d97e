"""Int8 quantization for the encoder hot path.

TPU-native replacement for the reference's TensorRT int8 PTQ pipeline
(quant_image_encoder.py:8-75 + ytools.tensorrt.MyEntropyCalibrator):

- weights: per-output-channel symmetric int8 (absmax), stored in the params
  tree as {"w_int8", "w_scale"[, "bias"]}; ops.linear consumes them directly.
- activations (optional, needs calibration): per-tensor symmetric int8 with
  scales collected by quant/calibrate.py — enabling true int8xint8 MXU
  matmuls; without activation scales the matmul runs bf16 x dequantized-int8
  (a weight-bandwidth optimization).

The TRT entropy calibrator is replaced by absmax/percentile calibration over
the same image pipeline (calibrator/image_encode.py semantics).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# linear weights quantized by default: the Hiera trunk (parameter- and
# FLOP-dominant); matches the reference quantizing the image encoder only.
DEFAULT_QUANT_PATTERN = r"image_encoder.*(qkv|proj|mlp\.layers\.\d+|linear\d)\.weight$"

# beyond the reference (its int8 stops at the encoder engines,
# quant_image_encoder.py:8-75): also quantize the tracking hot path —
# memory-attention q/k/v/out projections + FFN, and the SAM mask-decoder
# two-way transformer linears. Enabled via quantize_int8(scope="tracking").
TRACKING_QUANT_PATTERN = (
    r"("
    r"image_encoder.*(qkv|proj|mlp\.layers\.\d+|linear\d)\.weight"
    r"|memory_attention\.layers\.\d+\."
    r"(self_attn|cross_attn_image)\.(q_proj|k_proj|v_proj|out_proj)\.weight"
    r"|memory_attention\.layers\.\d+\.linear[12]\.weight"
    r"|sam_mask_decoder\.transformer\..*"
    r"(q_proj|k_proj|v_proj|out_proj)\.weight"
    r"|sam_mask_decoder\.transformer\..*mlp\.layers\.\d+\.weight"
    r")$"
)


def _keystr_to_name(key: str) -> str:
    parts = re.findall(r"\[([^\]]+)\]", key)
    return ".".join(p.strip("'\"") for p in parts)


def quantize_weight(w: np.ndarray):
    """[in, out] fp -> (int8 [in, out], per-out-channel fp32 scale [out])."""
    absmax = np.max(np.abs(w), axis=0)
    scale = np.maximum(absmax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_params(params: Dict, pattern: str = DEFAULT_QUANT_PATTERN,
                    act_scales: Optional[Dict[str, float]] = None) -> Dict:
    """Return a params tree with matching 2-D linear weights replaced by
    quantized form. `act_scales` maps the same dotted weight names to
    calibrated per-tensor input-activation scales."""
    rx = re.compile(pattern)

    def rebuild(tree, prefix=()):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            path = prefix + (k,)
            name = ".".join(str(p) for p in path)
            if (
                isinstance(v, dict)
                and "weight" in v
                and not isinstance(v["weight"], dict)
                and np.ndim(v["weight"]) == 2
                and rx.search(name + ".weight")
            ):
                w = np.asarray(v["weight"], np.float32)
                q, scale = quantize_weight(w)
                new_p = {"w_int8": jnp.asarray(q), "w_scale": jnp.asarray(scale)}
                if "bias" in v:
                    new_p["bias"] = v["bias"]
                if act_scales and name + ".weight" in act_scales:
                    new_p["act_scale"] = jnp.asarray(
                        act_scales[name + ".weight"], jnp.float32
                    )
                out[k] = new_p
            else:
                out[k] = rebuild(v, path) if isinstance(v, dict) else v
        return out

    return rebuild(params)


def quantized_linear(p: Dict, x):
    """Matmul against a quantized weight dict.

    With "act_scale": int8 x int8 on the MXU with fp32 accumulation.
    Without: bf16 x dequantized weight (bandwidth win only).
    """
    if "act_scale" in p:
        sa = p["act_scale"]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sa), -127, 127).astype(
            jnp.int8
        )
        acc = jax.lax.dot_general(
            xq, p["w_int8"],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (sa * p["w_scale"])
        y = y.astype(x.dtype)
    else:
        w = (p["w_int8"].astype(x.dtype)
             * p["w_scale"].astype(x.dtype))
        y = jnp.matmul(x, w)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "w_int8" in p
