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
    "SAM2ImagePredictor",
    "SAM2VideoPredictor",
    "SAM2AutomaticMaskGenerator",
]


def __getattr__(name):
    # lazy class exports (avoid importing predictors at package import)
    if name == "SAM2ImagePredictor":
        from sam2_opt_tpu.predictors.image import SAM2ImagePredictor

        return SAM2ImagePredictor
    if name == "SAM2VideoPredictor":
        from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

        return SAM2VideoPredictor
    if name == "SAM2AutomaticMaskGenerator":
        from sam2_opt_tpu.predictors.amg import SAM2AutomaticMaskGenerator

        return SAM2AutomaticMaskGenerator
    raise AttributeError(name)

__version__ = "0.1.0"
