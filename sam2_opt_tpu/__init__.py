"""sam2_opt_tpu — TPU-native SAM2 promptable image/video segmentation.

A from-scratch JAX/XLA/Pallas re-design of FasterProcess/sam2_opt: the full
SAM2.1 stack (Hiera encoder, prompt encoder, two-way mask decoder, memory
attention, memory encoder) behind reference-compatible SAM2ImagePredictor /
SAM2VideoPredictor APIs, where `predictor.speedup()` jit-compiles the hot path
to XLA (replacing the reference's ONNX-export + TensorRT pipeline).
"""

from sam2_opt_tpu.config import SAM2Config, model_config
from sam2_opt_tpu.build_sam import (
    build_sam2,
    build_sam2_image_predictor,
    build_sam2_video_predictor,
)

__all__ = [
    "SAM2Config",
    "model_config",
    "build_sam2",
    "build_sam2_image_predictor",
    "build_sam2_video_predictor",
]

__version__ = "0.1.0"
