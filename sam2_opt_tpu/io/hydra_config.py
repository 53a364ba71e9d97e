"""Reference Hydra yaml -> SAM2Config loader.

The reference builds every model topology from Hydra yaml trees
(`/root/reference/sam2/sam2/build_sam.py:90-97`,
`configs/sam2.1/sam2.1_hiera_{t,s,b+,l}.yaml`, and the training yaml's
`trainer.model` section in `configs/sam2.1_training/*.yaml`). This module
ingests those yamls MECHANICALLY: a user with a custom reference yaml (e.g.
a modified trunk topology) gets the equivalent `SAM2Config` without
re-deriving it by hand — `build_sam2("path/to.yaml")` just works.

Design rules:
- Absent keys fall back to the REFERENCE constructor defaults
  (sam2_base_official.py:24-98, hieradet.py:169-199, image_encoder.py:45),
  not this package's dataclass defaults — so a sparse yaml builds the same
  model it would build in the reference.
- Structural choices this TPU stack intentionally fixes (RoPE
  downsample_rate=1, depth-wise ConvNeXt fuser, sine position encodings)
  are ASSERTED: a yaml that deviates raises with the offending key path
  instead of silently building a different model.
- Every key in the yaml is either consumed, asserted, or on the explicit
  ignore list (e.g. `dropout` — inference-irrelevant; train-time attention
  dropout is not implemented here); anything else raises, so nothing is
  dropped silently.
- `dynamic_multimask_via_stability` is enabled with the reference
  `build_sam2(apply_postprocessing=True)` overrides (build_sam.py:81-88),
  matching how every released checkpoint is actually built.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Any, Dict, Optional, Tuple

from sam2_opt_tpu.config import (
    FpnNeckConfig,
    HieraConfig,
    MemoryAttentionConfig,
    MemoryEncoderConfig,
    SAM2Config,
)

# keys that are legal in reference yamls but carry no information for this
# stack (instantiation targets, torch-compile flags, train-time dropout)
_IGNORED_LEAF_KEYS = {"_target_", "dropout", "compile_image_encoder"}

# SAM2Train-specific keys in training-yaml model sections
# (training/model/sam2.py:25-106) — split out for the trainer, not SAM2Config
_TRAIN_MODEL_KEYS = {
    "prob_to_use_pt_input_for_train",
    "prob_to_use_pt_input_for_eval",
    "prob_to_use_box_input_for_train",
    "prob_to_use_box_input_for_eval",
    "prob_to_sample_from_gt_for_train",
    "num_frames_to_correct_for_train",
    "num_frames_to_correct_for_eval",
    "rand_frames_to_correct_for_train",
    "add_all_frames_to_correct_as_cond",
    "num_init_cond_frames_for_train",
    "rand_init_cond_frames_for_train",
    "num_init_cond_frames_for_eval",
    "num_correction_pt_per_frame",
    "use_act_ckpt_iterative_pt_sampling",
    "forward_backbone_per_frame_for_eval",
    "freeze_image_encoder",
}

# reference SAM2Base constructor defaults (sam2_base_official.py:24-98) for
# every top-level flag a yaml may omit; SAM2Config defaults are the 2.1
# release values and would silently "upgrade" a sparse yaml otherwise
_SAM2BASE_DEFAULTS: Dict[str, Any] = dict(
    num_maskmem=7,
    image_size=512,
    backbone_stride=16,
    sigmoid_scale_for_mem_enc=1.0,
    sigmoid_bias_for_mem_enc=0.0,
    binarize_mask_from_pts_for_mem_enc=False,
    use_mask_input_as_output_without_sam=False,
    max_cond_frames_in_attn=-1,
    directly_add_no_mem_embed=False,
    use_high_res_features_in_sam=False,
    multimask_output_in_sam=False,
    multimask_min_pt_num=1,
    multimask_max_pt_num=1,
    multimask_output_for_tracking=False,
    use_multimask_token_for_obj_ptr=False,
    iou_prediction_use_sigmoid=False,
    memory_temporal_stride_for_eval=1,
    non_overlap_masks_for_mem_enc=False,
    use_obj_ptrs_in_encoder=False,
    max_obj_ptrs_in_encoder=16,
    add_tpos_enc_to_obj_ptrs=True,
    proj_tpos_enc_in_obj_ptrs=False,
    use_signed_tpos_enc_to_obj_ptrs=False,
    only_obj_ptrs_in_the_past_for_eval=False,
    pred_obj_scores=False,
    pred_obj_scores_mlp=False,
    fixed_no_obj_ptr=False,
    soft_no_obj_ptr=False,
    use_mlp_for_obj_ptr_proj=False,
    no_obj_embed_spatial=False,
)

# reference Hiera constructor defaults (hieradet.py:169-199)
_HIERA_DEFAULTS: Dict[str, Any] = dict(
    embed_dim=96,
    num_heads=1,
    drop_path_rate=0.0,
    q_pool=3,
    q_stride=(2, 2),
    stages=(2, 3, 16, 3),
    dim_mul=2.0,
    head_mul=2.0,
    window_pos_embed_bkg_spatial_size=(14, 14),
    window_spec=(8, 4, 14, 7),
    global_att_blocks=(12, 16, 20),
)


class YamlConfigError(ValueError):
    """A reference yaml asked for something this loader cannot honor."""


def _interpolate(node, root):
    """Resolve OmegaConf-style `${a.b.c}` interpolations against the doc
    root (the training yaml's `${scratch.resolution}` etc.). Resolver-call
    forms like `${times:a,b}` are left untouched — they never appear inside
    model sections."""
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    if isinstance(node, str):
        m = re.fullmatch(r"\$\{([A-Za-z0-9_.]+)\}", node)
        if m:
            cur = root
            for part in m.group(1).split("."):
                if not isinstance(cur, dict) or part not in cur:
                    raise YamlConfigError(
                        f"cannot resolve interpolation {node!r}"
                    )
                cur = cur[part]
            return _interpolate(cur, root)
    return node


def load_yaml(path: str) -> dict:
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    if not isinstance(doc, dict):
        raise YamlConfigError(f"{path}: expected a mapping at top level")
    return _interpolate(doc, doc)


class _Node:
    """A yaml mapping with consumption tracking: every key must be taken
    (`take`/`expect`), recursed into (`child`), or ignored, else
    `finish()` raises with the unconsumed paths."""

    def __init__(self, data: dict, path: str):
        self.data = dict(data or {})
        self.path = path
        self._children = []
        for k in _IGNORED_LEAF_KEYS:
            self.data.pop(k, None)

    def take(self, key, default=_IGNORED_LEAF_KEYS):  # sentinel
        if key in self.data:
            return self.data.pop(key)
        if default is _IGNORED_LEAF_KEYS:
            raise YamlConfigError(f"{self.path}: missing required key {key!r}")
        return default

    def expect(self, key, allowed, default=None):
        """Consume a fixed-by-this-stack key; raise if the yaml deviates."""
        val = self.data.pop(key, default)
        if val is not None and val not in allowed:
            raise YamlConfigError(
                f"{self.path}.{key}={val!r} is not supported by the TPU "
                f"stack (supported: {allowed})"
            )
        return val

    def child(self, key, required=True) -> "_Node":
        sub = self.data.pop(key, None)
        if sub is None:
            if required:
                raise YamlConfigError(
                    f"{self.path}: missing required section {key!r}"
                )
            sub = {}
        node = _Node(sub, f"{self.path}.{key}")
        self._children.append(node)
        return node

    def leftovers(self):
        out = [f"{self.path}.{k}" for k in self.data]
        for c in self._children:
            out.extend(c.leftovers())
        return out

    def finish(self):
        left = self.leftovers()
        if left:
            raise YamlConfigError(
                "unrecognized yaml keys (refusing to drop them silently): "
                + ", ".join(sorted(left))
            )


def _tup(v):
    return tuple(v) if isinstance(v, (list, tuple)) else v


def _sine_pe_feats(node: _Node, expected_name="PositionEmbeddingSine") -> int:
    """Consume a position_encoding block; only sine PEs with the reference
    normalize/scale/temperature are implemented (ops/posenc.py)."""
    feats = node.take("num_pos_feats")
    node.expect("normalize", (True,), default=True)
    node.expect("scale", (), default=None)  # only null accepted
    node.expect("temperature", (10000,), default=10000)
    return int(feats)


def _trunk_from_node(t: _Node) -> HieraConfig:
    vals = dict(_HIERA_DEFAULTS)
    for key in vals:
        if key in t.data:
            vals[key] = _tup(t.take(key))
    t.expect("return_interm_layers", (True,), default=True)
    t.expect("weights_path", (), default=None)
    return HieraConfig(
        embed_dim=int(vals["embed_dim"]),
        num_heads=int(vals["num_heads"]),
        stages=_tup(vals["stages"]),
        global_att_blocks=_tup(vals["global_att_blocks"]),
        window_pos_embed_bkg_spatial_size=_tup(
            vals["window_pos_embed_bkg_spatial_size"]
        ),
        window_spec=_tup(vals["window_spec"]),
        q_pool=int(vals["q_pool"]),
        q_stride=_tup(vals["q_stride"]),
        dim_mul=float(vals["dim_mul"]),
        head_mul=float(vals["head_mul"]),
        drop_path_rate=float(vals["drop_path_rate"]),
    )


def _neck_from_node(n: _Node, trunk: HieraConfig) -> FpnNeckConfig:
    pos_feats = _sine_pe_feats(n.child("position_encoding"))
    d_model = int(n.take("d_model"))
    channels = _tup(n.take("backbone_channel_list"))
    if channels != trunk.channel_list:
        raise YamlConfigError(
            f"neck.backbone_channel_list {channels} does not match the "
            f"trunk's stage dims {trunk.channel_list}"
        )
    top_down = n.take("fpn_top_down_levels", default=None)
    if top_down is None:  # reference FpnNeck default: all levels
        top_down = tuple(range(len(channels)))
    interp = n.take("fpn_interp_model", default="bilinear")
    fuse = n.take("fuse_type", default="sum")
    n.expect("kernel_size", (1,), default=1)
    n.expect("stride", (1,), default=1)
    n.expect("padding", (0,), default=0)
    return FpnNeckConfig(
        d_model=d_model,
        backbone_channel_list=channels,
        fpn_top_down_levels=_tup(top_down),
        fpn_interp_model=str(interp),
        fuse_type=str(fuse),
        pos_num_feats=pos_feats,
    )


def _memattn_from_node(ma: _Node) -> Tuple[MemoryAttentionConfig, bool]:
    d_model = int(ma.take("d_model"))
    num_layers = int(ma.take("num_layers"))
    pos_at_input = bool(ma.take("pos_enc_at_input", default=True))
    layer = ma.child("layer")
    act = str(layer.take("activation", default="relu"))
    ffn = int(layer.take("dim_feedforward"))
    pos_at_attn = bool(layer.take("pos_enc_at_attn", default=False))
    pos_at_keys = bool(layer.take("pos_enc_at_cross_attn_keys", default=True))
    pos_at_queries = bool(
        layer.take("pos_enc_at_cross_attn_queries", default=False)
    )
    layer.expect("d_model", (d_model,), default=d_model)

    def attn(node: _Node, cross: bool):
        theta = float(node.take("rope_theta", default=10000.0))
        feat_sizes = _tup(node.take("feat_sizes", default=(64, 64)))
        heads = int(node.take("num_heads"))
        node.expect("embedding_dim", (d_model,), default=d_model)
        node.expect("downsample_rate", (1,), default=1)
        kv_in = node.take("kv_in_dim", default=None)
        if cross:
            node.expect("rope_k_repeat", (True,), default=True)
        else:
            node.expect("rope_k_repeat", (False,), default=False)
        return theta, feat_sizes, heads, kv_in

    s_theta, s_feats, s_heads, s_kv = attn(layer.child("self_attention"), False)
    c_theta, c_feats, c_heads, c_kv = attn(layer.child("cross_attention"), True)
    if (s_theta, s_feats, s_heads) != (c_theta, c_feats, c_heads):
        raise YamlConfigError(
            "self_attention and cross_attention RoPE settings differ — the "
            "TPU memory-attention kernel shares one RoPE table"
        )
    if s_kv is not None:
        raise YamlConfigError("self_attention.kv_in_dim is not supported")
    return MemoryAttentionConfig(
        d_model=d_model,
        num_layers=num_layers,
        dim_feedforward=ffn,
        num_heads=s_heads,
        rope_theta=s_theta,
        rope_feat_sizes=s_feats,
        kv_in_dim=int(c_kv if c_kv is not None else 64),
        pos_enc_at_input=pos_at_input,
        pos_enc_at_attn=pos_at_attn,
        pos_enc_at_cross_attn_keys=pos_at_keys,
        pos_enc_at_cross_attn_queries=pos_at_queries,
        activation=act,
    ), True


def _memenc_from_node(me: _Node) -> MemoryEncoderConfig:
    out_dim = int(me.take("out_dim"))
    pos_feats = _sine_pe_feats(me.child("position_encoding"))
    down = me.child("mask_downsampler")
    kernel = int(down.take("kernel_size", default=4))
    stride = int(down.take("stride", default=4))
    padding = int(down.take("padding", default=0))
    down.expect("total_stride", (16,), default=16)
    fuser = me.child("fuser")
    num_layers = int(fuser.take("num_layers"))
    cx = fuser.child("layer")
    in_dim = int(cx.take("dim", default=256))
    cx_kernel = int(cx.take("kernel_size", default=7))
    cx_padding = int(cx.take("padding", default=3))
    cx.expect("use_dwconv", (True,), default=True)
    lsi = cx.take("layer_scale_init_value", default=1e-6)
    if abs(float(lsi) - 1e-6) > 1e-12:
        raise YamlConfigError(
            f"CXBlock layer_scale_init_value={lsi} != 1e-6: the converter "
            "loads gamma from checkpoints, but random init pins 1e-6"
        )
    return MemoryEncoderConfig(
        out_dim=out_dim,
        in_dim=in_dim,
        mask_downsampler_kernel=kernel,
        mask_downsampler_stride=stride,
        mask_downsampler_padding=padding,
        fuser_num_layers=num_layers,
        cx_kernel_size=cx_kernel,
        cx_padding=cx_padding,
        pos_num_feats=pos_feats,
    )


def config_from_model_node(model: dict, path: str = "model"
                           ) -> Tuple[SAM2Config, Dict[str, Any]]:
    """Map a reference yaml `model:` mapping onto (SAM2Config, train_knobs).

    `train_knobs` holds the SAM2Train-only keys of training-yaml model
    sections (prompt-simulation probabilities etc.), keyed by their
    reference names — empty for inference yamls.
    """
    m = _Node(model, path)
    train_knobs = {
        k: m.take(k) for k in list(m.data) if k in _TRAIN_MODEL_KEYS
    }

    enc = m.child("image_encoder")
    scalp = int(enc.take("scalp", default=0))
    trunk = _trunk_from_node(enc.child("trunk"))
    neck = _neck_from_node(enc.child("neck"), trunk)
    memattn, _ = _memattn_from_node(m.child("memory_attention"))
    memenc = _memenc_from_node(m.child("memory_encoder"))

    flags = dict(_SAM2BASE_DEFAULTS)
    for key in list(flags):
        if key in m.data:
            flags[key] = m.take(key)
    m.expect("sam_mask_decoder_extra_args", (), default=None)
    m.finish()

    cfg = SAM2Config(
        trunk=trunk,
        neck=neck,
        memory_attention=memattn,
        memory_encoder=memenc,
        scalp=scalp,
        mem_dim=memenc.out_dim,
        hidden_dim=memattn.d_model,
        **{k: type(_SAM2BASE_DEFAULTS[k])(v) for k, v in flags.items()},
    )
    # keep the memory-attention RoPE table in sync with the feature grid
    # (the reference recomputes cos/sin tables per seq len at runtime;
    # config.model_config applies the same rule for its variants)
    grid = cfg.image_size // cfg.backbone_stride
    if cfg.memory_attention.rope_feat_sizes != (grid, grid):
        cfg = dataclasses.replace(
            cfg,
            memory_attention=dataclasses.replace(
                cfg.memory_attention, rope_feat_sizes=(grid, grid)
            ),
        )
    return cfg, train_knobs


def config_from_yaml(path: str) -> SAM2Config:
    """SAM2Config from a reference Hydra yaml — inference configs
    (`model:` at top level, e.g. configs/sam2.1/sam2.1_hiera_l.yaml) and
    training configs (`trainer.model:`, e.g.
    configs/sam2.1_training/sam2.1_hiera_b+_MOSE_finetune.yaml)."""
    cfg, _ = config_and_train_knobs_from_yaml(path)
    return cfg


def config_and_train_knobs_from_yaml(path: str
                                     ) -> Tuple[SAM2Config, Dict[str, Any]]:
    doc = load_yaml(path)
    if "model" in doc:
        node, node_path = doc["model"], "model"
    elif "trainer" in doc and isinstance(doc["trainer"], dict) \
            and "model" in doc["trainer"]:
        node, node_path = doc["trainer"]["model"], "trainer.model"
    else:
        raise YamlConfigError(
            f"{path}: no `model:` or `trainer.model:` section found"
        )
    tgt = str(node.get("_target_", ""))
    if tgt and not tgt.rsplit(".", 1)[-1] in ("SAM2Base", "SAM2Train",
                                              "SAM2VideoPredictor",
                                              "SAM2VideoPredictorVOS"):
        raise YamlConfigError(f"unsupported model _target_: {tgt}")
    return config_from_model_node(node, node_path)


def resolve_config(name_or_path: str, **overrides) -> SAM2Config:
    """Variant name, reference config name, or yaml file path -> SAM2Config.

    Accepts "hiera_l"-style names, reference resource names like
    "configs/sam2.1/sam2.1_hiera_l.yaml" (mapped by variant), and real
    paths to yaml files on disk (ingested field-by-field).
    """
    if name_or_path.endswith((".yaml", ".yml")) and os.path.exists(name_or_path):
        cfg = config_from_yaml(name_or_path)
        for key, value in overrides.items():
            cfg = _replace_path(cfg, key.split("."), value)
        return cfg
    from sam2_opt_tpu.config import model_config

    m = re.search(r"hiera_(t|s|b\+|l)", name_or_path)
    return model_config(
        f"hiera_{m.group(1)}" if m else name_or_path, **overrides
    )


def _replace_path(obj, parts, value):
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: value})
    return dataclasses.replace(
        obj, **{parts[0]: _replace_path(getattr(obj, parts[0]), parts[1:], value)}
    )
