"""Import the reference torch modules (read-only at /root/reference) for golden
parity tests.

The reference imports `ytools` (external executor package), `hydra`, and
`iopath`, none of which are installed; we stub just enough of them for the
*torch* numeric paths to work. Tests that use this helper are skipped when the
reference tree or torch is unavailable, so the suite stays self-contained.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference/sam2"

_initialized = False


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return os.path.isdir(REFERENCE_ROOT)


def setup_reference():
    """Install stubs and put the reference sam2 package on sys.path."""
    global _initialized
    if _initialized:
        return
    if not reference_available():
        raise RuntimeError("reference tree or torch unavailable")

    class _ModelExecutorStub:
        def Inference(self, *a, **k):
            raise RuntimeError("stub")

        def warmup(self, *a, **k):
            pass

        def Release(self):
            pass

        def GetModelInputDesc(self):
            return []

    _stub_module("ytools")
    _stub_module("ytools.executor", ModelExectuor=_ModelExecutorStub)
    _stub_module("ytools.onnxruntime", OnnxRuntimeExecutor=_ModelExecutorStub)
    _stub_module(
        "ytools.tensorrt",
        TensorRTExecutor=_ModelExecutorStub,
        save_engine=lambda *a, **k: None,
        MyEntropyCalibrator=object,
    )
    _stub_module("ytools.tensorrt.quant", CalibratorDatasetObject=object)
    _stub_module(
        "ytools.bench", test_torch_cuda_time=lambda *a, **k: (lambda f: f)
    )

    # hydra stubs (sam2/__init__.py calls initialize_config_module)
    class _GH:
        @staticmethod
        def instance():
            class _I:
                def is_initialized(self):
                    return True

            return _I()

    _stub_module("hydra", initialize_config_module=lambda *a, **k: None)
    _stub_module("hydra.core")
    _stub_module("hydra.core.global_hydra", GlobalHydra=_GH)

    # torchvision stub (automatic_mask_generator.py imports batched_nms /
    # box_area; pure-torch reimplementations are numerically sufficient)
    import torch as _torch

    def _box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def _batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return _torch.empty((0,), dtype=_torch.int64)
        # offset boxes per category so NMS never crosses categories
        offsets = idxs.to(boxes) * (boxes.max() + 1)
        b = boxes + offsets[:, None]
        order = scores.argsort(descending=True)
        keep = []
        suppressed = _torch.zeros(len(b), dtype=_torch.bool)
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            x1 = _torch.maximum(b[i, 0], b[:, 0])
            y1 = _torch.maximum(b[i, 1], b[:, 1])
            x2 = _torch.minimum(b[i, 2], b[:, 2])
            y2 = _torch.minimum(b[i, 3], b[:, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            iou = inter / (_box_area(b[i : i + 1]) + _box_area(b) - inter)
            suppressed |= iou > iou_threshold
            suppressed[i] = True
        return _torch.tensor(keep, dtype=_torch.int64)

    class _Resize(_torch.nn.Module):
        def __init__(self, size, *a, **k):
            super().__init__()
            self.size = (
                (int(size), int(size)) if isinstance(size, int)
                else (int(size[0]), int(size[1]))
            )

        def forward(self, x):
            # torchvision's Resize accepts any number of leading dims
            lead = x.shape[:-2]
            flat = x.reshape((-1, 1) + x.shape[-2:])
            y = _torch.nn.functional.interpolate(
                flat, size=self.size, mode="bilinear",
                align_corners=False, antialias=True,
            )
            return y.reshape(lead + self.size)

    class _Normalize(_torch.nn.Module):
        def __init__(self, mean, std, *a, **k):
            super().__init__()
            self.register_buffer("m", _torch.tensor(mean).view(-1, 1, 1))
            self.register_buffer("s", _torch.tensor(std).view(-1, 1, 1))

        def forward(self, x):
            return (x - self.m) / self.s

    class _ToTensor:
        def __call__(self, x):
            import numpy as _np

            arr = _np.asarray(x)
            t = _torch.from_numpy(arr.copy()).permute(2, 0, 1).float()
            if arr.dtype == _np.uint8:
                t = t / 255.0
            return t

    _stub_module("torchvision")
    _stub_module("torchvision.ops")
    _stub_module("torchvision.ops.boxes", batched_nms=_batched_nms,
                 box_area=_box_area)
    _stub_module("torchvision.transforms", Resize=_Resize,
                 Normalize=_Normalize, ToTensor=_ToTensor)

    # SAM2Transforms torch.jit.script's a Sequential of the stubs above;
    # fall back to the eager module when scripting rejects them
    _orig_script = _torch.jit.script
    if not getattr(_torch.jit, "_sam2_safe_script", False):
        def _safe_script(obj, *a, **k):
            try:
                return _orig_script(obj, *a, **k)
            except Exception:
                return obj

        _torch.jit.script = _safe_script
        _torch.jit._sam2_safe_script = True

    # iopath stub (hieradet.py imports g_pathmgr)
    class _PathMgr:
        def open(self, path, mode="r"):
            return open(path, mode)

    _stub_module("iopath")
    _stub_module("iopath.common")
    _stub_module("iopath.common.file_io", g_pathmgr=_PathMgr())

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _initialized = True


def build_torch_sam2(variant: str = "hiera_t", seed: int = 0, cls=None,
                     extra_kwargs=None):
    """Instantiate the reference SAM2Base (or a subclass via `cls`, e.g.
    SAM2VideoPredictor) with random (seeded) weights on CPU, mirroring
    configs/sam2.1/sam2.1_hiera_*.yaml without hydra."""
    setup_reference()
    import torch

    torch.manual_seed(seed)

    from sam2.modeling.backbones.hieradet import Hiera
    from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder
    from sam2.modeling.memory_attention import MemoryAttention, MemoryAttentionLayer
    from sam2.modeling.memory_encoder import (
        CXBlock,
        Fuser,
        MaskDownSampler,
        MemoryEncoder,
    )
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    from sam2.modeling.sam.transformer import RoPEAttention
    from sam2.modeling.sam2_base import SAM2Base

    hiera_kwargs = {
        "hiera_t": dict(
            embed_dim=96, num_heads=1, stages=[1, 2, 7, 2],
            global_att_blocks=[5, 7, 9],
            window_pos_embed_bkg_spatial_size=[7, 7],
        ),
        "hiera_s": dict(
            embed_dim=96, num_heads=1, stages=[1, 2, 11, 2],
            global_att_blocks=[7, 10, 13],
            window_pos_embed_bkg_spatial_size=[7, 7],
        ),
        "hiera_b+": dict(
            embed_dim=112, num_heads=2, stages=[2, 3, 16, 3],
            global_att_blocks=[12, 16, 20],
            window_pos_embed_bkg_spatial_size=[14, 14],
        ),
        "hiera_l": dict(
            embed_dim=144, num_heads=2, stages=[2, 6, 36, 4],
            global_att_blocks=[23, 33, 43],
            window_pos_embed_bkg_spatial_size=[7, 7],
            window_spec=[8, 4, 16, 8],
        ),
    }[variant]

    trunk = Hiera(**hiera_kwargs)
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=256, normalize=True, scale=None, temperature=10000
        ),
        d_model=256,
        backbone_channel_list=list(trunk.channel_list),
        fpn_top_down_levels=[2, 3],
        fpn_interp_model="nearest",
    )
    image_encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=1)

    def rope_attention(**kwargs):
        return RoPEAttention(
            rope_theta=10000.0, feat_sizes=[64, 64], embedding_dim=256,
            num_heads=1, downsample_rate=1, dropout=0.1, **kwargs
        )

    layer = MemoryAttentionLayer(
        activation="relu",
        dim_feedforward=2048,
        dropout=0.1,
        pos_enc_at_attn=False,
        self_attention=rope_attention(),
        d_model=256,
        pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        cross_attention=rope_attention(rope_k_repeat=True, kv_in_dim=64),
    )
    memory_attention = MemoryAttention(
        d_model=256, pos_enc_at_input=True, layer=layer, num_layers=4
    )

    memory_encoder = MemoryEncoder(
        out_dim=64,
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=64, normalize=True, scale=None, temperature=10000
        ),
        mask_downsampler=MaskDownSampler(kernel_size=3, stride=2, padding=1),
        fuser=Fuser(
            layer=CXBlock(
                dim=256, kernel_size=7, padding=3,
                layer_scale_init_value=1e-6, use_dwconv=True,
            ),
            num_layers=2,
        ),
    )

    model_cls = cls if cls is not None else SAM2Base
    kwargs = dict(
        image_encoder=image_encoder,
        memory_attention=memory_attention,
        memory_encoder=memory_encoder,
        num_maskmem=7,
        image_size=1024,
        sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True,
        no_obj_embed_spatial=True,
        use_high_res_features_in_sam=True,
        multimask_output_in_sam=True,
        iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True,
        add_tpos_enc_to_obj_ptrs=True,
        proj_tpos_enc_in_obj_ptrs=True,
        use_signed_tpos_enc_to_obj_ptrs=True,
        only_obj_ptrs_in_the_past_for_eval=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0,
        multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True,
        # build_sam2 overrides (reference build_sam.py:81-88)
        sam_mask_decoder_extra_args=dict(
            dynamic_multimask_via_stability=True,
            dynamic_multimask_stability_delta=0.05,
            dynamic_multimask_stability_thresh=0.98,
        ),
        compile_image_encoder=False,
    )
    # caller overrides (e.g. 2.0-style pointer flags) replace the defaults
    kwargs.update(extra_kwargs or {})
    model = model_cls(**kwargs)
    model.eval()
    return model


def build_torch_video_predictor(variant: str = "hiera_t", seed: int = 0,
                                **predictor_kwargs):
    """Reference SAM2VideoPredictor (official) on CPU with seeded weights and
    the build_sam2_video_predictor overrides (reference build_sam.py:110-131:
    binarize_mask_from_pts_for_mem_enc=True; fill_hole_area configurable)."""
    setup_reference()
    from sam2.sam2_video_predictor_official import SAM2VideoPredictor

    predictor_kwargs.setdefault("fill_hole_area", 0)
    extra = dict(predictor_kwargs)
    extra["binarize_mask_from_pts_for_mem_enc"] = True
    return build_torch_sam2(
        variant, seed=seed, cls=SAM2VideoPredictor, extra_kwargs=extra
    )


def build_torch_legacy_predictor(variant: str = "hiera_t", seed: int = 0,
                                 **predictor_kwargs):
    """Reference LEGACY SAM2VideoPredictor (sam2_video_predictor_legacy.py —
    the pre-12/2024 shared-output_dict engine) on CPU with seeded weights
    and the build_sam2_video_predictor overrides."""
    setup_reference()
    from sam2.sam2_video_predictor_legacy import (
        SAM2VideoPredictor as LegacyPredictor,
    )

    predictor_kwargs.setdefault("fill_hole_area", 0)
    extra = dict(predictor_kwargs)
    extra["binarize_mask_from_pts_for_mem_enc"] = True
    return build_torch_sam2(
        variant, seed=seed, cls=LegacyPredictor, extra_kwargs=extra
    )


def build_torch_dam4sam_predictor(variant: str = "hiera_t", seed: int = 0,
                                  **predictor_kwargs):
    """Reference DAM4SAM SAM2VideoPredictor (sam2_video_predictor_dam4sam.py)
    on CPU with seeded weights.

    The dam4sam predictor imports its base as
    `sam2_opt.sam2.sam2.modeling.sam2_base` — alias that module name to the
    dam4sam base (the same module the env-var track switch would select,
    modeling/sam2_base.py:6-12) so the import resolves without the sam2_opt
    package root on sys.path. The dam4sam memory path hard-codes `.cuda()`
    on stored tensors (written for GPU, sam2_base_dam4sam.py:700-703); the
    caller must neutralize torch.Tensor.cuda on CPU (see
    tests/test_dam4sam_parity.py).
    """
    setup_reference()
    import sam2.modeling.sam2_base_dam4sam as dam_base

    for name in (
        "sam2_opt",
        "sam2_opt.sam2",
        "sam2_opt.sam2.sam2",
        "sam2_opt.sam2.sam2.modeling",
    ):
        _stub_module(name)
    sys.modules["sam2_opt.sam2.sam2.modeling.sam2_base"] = dam_base

    from sam2.sam2_video_predictor_dam4sam import (
        SAM2VideoPredictor as DamPredictor,
    )

    predictor_kwargs.setdefault("fill_hole_area", 0)
    extra = dict(predictor_kwargs)
    extra["binarize_mask_from_pts_for_mem_enc"] = True
    return build_torch_sam2(
        variant, seed=seed, cls=DamPredictor, extra_kwargs=extra
    )


def build_torch_sam2train(variant: str = "hiera_t", seed: int = 0,
                          **train_kwargs):
    """Reference SAM2Train (training/model/sam2.py) on CPU with seeded
    weights. Stubs `tensordict` (not installed; only used for the
    BatchedVideoDatapoint @tensorclass decorator, which tests replace with a
    duck-typed batch anyway)."""
    setup_reference()

    def _tensorclass(cls):
        return cls

    _stub_module("tensordict", tensorclass=_tensorclass)
    # training.loss_fns imports CORE_LOSS_KEY from training.trainer, whose
    # transitive imports (hydra.utils, checkpoint/logging utils) aren't
    # needed for the numeric paths — stub just the constant
    _stub_module("training.trainer", CORE_LOSS_KEY="core_loss")

    from training.model.sam2 import SAM2Train

    return build_torch_sam2(
        variant, seed=seed, cls=SAM2Train, extra_kwargs=train_kwargs
    )


def state_dict_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
