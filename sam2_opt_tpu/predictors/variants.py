"""Video predictor variant tracks.

The reference ships three tracker tracks selected by the SAM2_VERSION_TRACK
env var (sam2/sam2/sam2_video_predictor.py:4-18, modeling/sam2_base.py:6-17):

  "official" (default) — per-object independent tracking, post-12/2024 API
  "dam4sam"            — distractor-aware memory variant
  plus the pre-12/2024 "legacy" class kept for backward compat.

Here:
- SAM2VideoPredictor (official) is the fully implemented track;
- SAM2VideoPredictorVOS subclasses it — in the reference this variant exists
  to torch.compile the submodules (sam2_video_predictor_official.py:1082-1329);
  our predictor compiles everything via speedup() already, so the subclass
  only pins the compiled backend on;
- the legacy and dam4sam tracks are API stubs documenting the delta (the shared
  memory-bank math is identical; DRM/RAM frame selection is the dam4sam
  delta) — they raise with a clear message if instantiated.
"""

from __future__ import annotations

import os

from sam2_opt_tpu.predictors.video import SAM2VideoPredictor


class SAM2VideoPredictorVOS(SAM2VideoPredictor):
    """VOS-optimized variant: everything jit-compiled up front (the reference
    torch.compile's memory encoder/attention/prompt encoder/mask decoder,
    sam2_video_predictor_official.py:1089-1117 — our compiled XLA path is the
    same thing, so this subclass just defaults speedup on)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.speedup()


class SAM2VideoPredictorLegacy:
    """Pre-12/2024 API (shared output_dict across objects,
    sam2_video_predictor_legacy.py). Not ported: the official track supersedes
    it (reference RELEASE_NOTES.md:10-13); use SAM2VideoPredictor."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "The legacy (pre-12/2024) video predictor track is not ported; "
            "use SAM2VideoPredictor (the official track) instead."
        )


class SAM2VideoPredictorDAM4SAM:
    """DAM4SAM distractor-aware track (sam2_video_predictor_dam4sam.py +
    modeling/sam2_base_dam4sam.py): adds DRM/RAM memory-frame selection on
    top of the same memory-attention math. Not yet ported."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "The dam4sam track is not yet ported; unset SAM2_VERSION_TRACK "
            "or set it to 'official'."
        )


def select_video_predictor_cls():
    """Env-var track switch (reference sam2_video_predictor.py:4-8)."""
    track = os.environ.get("SAM2_VERSION_TRACK", "official").lower()
    if track in ("official", ""):
        return SAM2VideoPredictor
    if track == "dam4sam":
        return SAM2VideoPredictorDAM4SAM
    if track == "legacy":
        return SAM2VideoPredictorLegacy
    raise ValueError(f"unknown SAM2_VERSION_TRACK={track!r}")
