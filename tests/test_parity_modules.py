"""Numerical parity of every model module against the reference torch
implementation at random (seeded) weights, fp32, CPU.

This replaces the reference's export-time behavioral assertions
(SURVEY.md §4.2) with real unit tests. Gate: max abs error ~1e-4 at fp32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.io.torch_convert import convert_state_dict
from sam2_opt_tpu.models import (
    hiera as hiera_mod,
    mask_decoder as md,
    memory_attention as ma,
    memory_encoder as me,
    prompt_encoder as pe,
    sam2_base as base,
)

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

CFG = model_config("hiera_t")


@pytest.fixture(scope="module")
def torch_model():
    from reference_helper import build_torch_sam2

    return build_torch_sam2("hiera_t", seed=0)


@pytest.fixture(scope="module")
def params(torch_model):
    from reference_helper import state_dict_numpy

    return convert_state_dict(state_dict_numpy(torch_model))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def max_err(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


def test_memory_encoder_parity(torch_model, params):
    import torch

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((1, 256, 64, 64), np.float32)
    mask = rng.standard_normal((1, 1, 1024, 1024), np.float32)
    with torch.no_grad():
        out = torch_model.memory_encoder(
            torch.from_numpy(pix), torch.from_numpy(mask), skip_mask_sigmoid=True
        )
    feats_t = out["vision_features"].detach().numpy()
    pos_t = out["vision_pos_enc"][0].detach().numpy()

    feats_j, pos_j = me.memory_encoder(
        params["memory_encoder"],
        CFG.memory_encoder,
        jnp.asarray(to_nhwc(pix)),
        jnp.asarray(to_nhwc(mask)),
    )
    assert max_err(to_nchw(feats_j), feats_t) < 2e-4
    assert max_err(to_nchw(pos_j), pos_t) < 1e-5


def test_packed_mask_downsampler_matches_canonical(params):
    """The phase-packed (s2d) downsampler is an exact re-layout of the
    canonical k3/s2 conv stack (memory_encoder.py:mask_downsampler_packed)."""
    p = params["memory_encoder"]["mask_downsampler"]
    rng = np.random.default_rng(3)
    for shape in ((1, 1024, 1024, 1), (2, 512, 768, 1)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        a = me.mask_downsampler(p, x, CFG.memory_encoder)
        b = me.mask_downsampler_packed(p, x, CFG.memory_encoder)
        assert a.shape == b.shape
        assert max_err(a, b) < 1e-4


def test_prompt_encoder_parity(torch_model, params):
    import torch

    coords = np.array([[[100.0, 200.0], [512.0, 700.0], [40.0, 41.0]]], np.float32)
    labels = np.array([[1, 0, 2]], np.int32)
    with torch.no_grad():
        sparse_t, dense_t = torch_model.sam_prompt_encoder(
            points=(torch.from_numpy(coords), torch.from_numpy(labels)),
            boxes=None,
            masks=None,
        )
    sparse_j, dense_j = pe.prompt_encoder(
        params["sam_prompt_encoder"], CFG, jnp.asarray(coords), jnp.asarray(labels)
    )
    assert sparse_j.shape == tuple(sparse_t.shape)
    assert max_err(sparse_j, sparse_t.detach().numpy()) < 1e-5
    assert max_err(to_nchw(dense_j), dense_t.detach().numpy()) < 1e-5


def test_prompt_encoder_mask_parity(torch_model, params):
    import torch

    rng = np.random.default_rng(1)
    coords = np.zeros((1, 1, 2), np.float32)
    labels = -np.ones((1, 1), np.int32)
    mask = rng.standard_normal((1, 1, 256, 256), np.float32)
    with torch.no_grad():
        _, dense_t = torch_model.sam_prompt_encoder(
            points=(torch.from_numpy(coords), torch.from_numpy(labels)),
            boxes=None,
            masks=torch.from_numpy(mask),
        )
    _, dense_j = pe.prompt_encoder(
        params["sam_prompt_encoder"],
        CFG,
        jnp.asarray(coords),
        jnp.asarray(labels),
        mask_input=jnp.asarray(to_nhwc(mask)),
    )
    assert max_err(to_nchw(dense_j), dense_t.detach().numpy()) < 2e-4


def test_dense_pe_parity(torch_model, params):
    import torch

    with torch.no_grad():
        pe_t = torch_model.sam_prompt_encoder.get_dense_pe().detach().numpy()
    pe_j = pe.get_dense_pe(params["sam_prompt_encoder"], (64, 64))
    assert max_err(to_nchw(pe_j), pe_t) < 1e-5


def test_mask_decoder_parity(torch_model, params):
    import torch

    rng = np.random.default_rng(2)
    src = rng.standard_normal((1, 256, 64, 64), np.float32)
    sparse = rng.standard_normal((1, 4, 256), np.float32) * 0.5
    dense = rng.standard_normal((1, 256, 64, 64), np.float32) * 0.1
    hrf0 = rng.standard_normal((1, 32, 256, 256), np.float32)
    hrf1 = rng.standard_normal((1, 64, 128, 128), np.float32)
    with torch.no_grad():
        pe_dense = torch_model.sam_prompt_encoder.get_dense_pe()
        for mm in (True, False):
            masks_t, iou_t, tokens_t, obj_t = torch_model.sam_mask_decoder(
                image_embeddings=torch.from_numpy(src),
                image_pe=pe_dense,
                sparse_prompt_embeddings=torch.from_numpy(sparse),
                dense_prompt_embeddings=torch.from_numpy(dense),
                multimask_output=mm,
                repeat_image=False,
                high_res_features=[torch.from_numpy(hrf0), torch.from_numpy(hrf1)],
            )
            image_pe_j = pe.get_dense_pe(params["sam_prompt_encoder"], (64, 64))
            masks_j, iou_j, tokens_j, obj_j = md.mask_decoder(
                params["sam_mask_decoder"],
                CFG,
                jnp.asarray(to_nhwc(src)),
                image_pe_j,
                jnp.asarray(sparse),
                jnp.asarray(to_nhwc(dense)),
                multimask_output=mm,
                high_res_features=(
                    jnp.asarray(to_nhwc(hrf0)),
                    jnp.asarray(to_nhwc(hrf1)),
                ),
            )
            assert masks_j.shape == tuple(masks_t.shape), (mm, masks_j.shape)
            assert max_err(masks_j, masks_t.detach().numpy()) < 5e-4, f"mm={mm}"
            assert max_err(iou_j, iou_t.detach().numpy()) < 1e-4
            assert max_err(tokens_j, tokens_t.detach().numpy()) < 2e-4
            assert max_err(obj_j, obj_t.detach().numpy()) < 1e-4


def _torch_memory_attention(torch_model, curr, memory, curr_pos, memory_pos,
                            num_obj_ptr_tokens):
    import torch

    with torch.no_grad():
        out = torch_model.memory_attention(
            curr=torch.from_numpy(curr),
            memory=torch.from_numpy(memory),
            curr_pos=torch.from_numpy(curr_pos),
            memory_pos=torch.from_numpy(memory_pos),
            num_obj_ptr_tokens=num_obj_ptr_tokens,
        )
    return out.detach().numpy()


@pytest.mark.parametrize("L,P", [(1, 0), (2, 8)])
def test_memory_attention_parity(torch_model, params, L, P):
    rng = np.random.default_rng(3 + L + P)
    S_frames = L * 4096
    curr = rng.standard_normal((4096, 1, 256), np.float32) * 0.5
    curr_pos = rng.standard_normal((4096, 1, 256), np.float32) * 0.5
    memory = rng.standard_normal((S_frames + P, 1, 64), np.float32) * 0.5
    memory_pos = rng.standard_normal((S_frames + P, 1, 64), np.float32) * 0.5

    out_t = _torch_memory_attention(
        torch_model, curr, memory, curr_pos, memory_pos, num_obj_ptr_tokens=P
    )

    # exact-size graph (no padding)
    out_j = ma.memory_attention(
        params["memory_attention"],
        CFG.memory_attention,
        jnp.asarray(curr.transpose(1, 0, 2)),
        jnp.asarray(memory.transpose(1, 0, 2)),
        jnp.asarray(curr_pos.transpose(1, 0, 2)),
        jnp.asarray(memory_pos.transpose(1, 0, 2)),
        kv_mask=None,
        num_frame_tokens=S_frames,
    )
    assert max_err(np.asarray(out_j).transpose(1, 0, 2), out_t) < 5e-4


def test_memory_attention_padding_invariance(torch_model, params):
    """The fixed-capacity masked graph must reproduce the dynamic-shape result:
    this is the TPU replacement for the reference's two TRT graphs."""
    rng = np.random.default_rng(42)
    L, P = 2, 8
    cap_frames, cap_ptrs = 4 * 4096, 64
    S = L * 4096
    curr = rng.standard_normal((1, 4096, 256), np.float32) * 0.5
    curr_pos = rng.standard_normal((1, 4096, 256), np.float32) * 0.5
    mem = rng.standard_normal((1, S + P, 64), np.float32) * 0.5
    mem_pos = rng.standard_normal((1, S + P, 64), np.float32) * 0.5

    out_exact = ma.memory_attention(
        params["memory_attention"], CFG.memory_attention,
        jnp.asarray(curr), jnp.asarray(mem), jnp.asarray(curr_pos),
        jnp.asarray(mem_pos), kv_mask=None, num_frame_tokens=S,
    )

    # padded layout: [cap_frames frame slots | cap_ptrs ptr slots]
    mem_pad = np.zeros((1, cap_frames + cap_ptrs, 64), np.float32)
    pos_pad = np.zeros_like(mem_pad)
    mask = np.zeros((1, cap_frames + cap_ptrs), bool)
    mem_pad[:, :S] = mem[:, :S]
    pos_pad[:, :S] = mem_pos[:, :S]
    mask[:, :S] = True
    mem_pad[:, cap_frames : cap_frames + P] = mem[:, S:]
    pos_pad[:, cap_frames : cap_frames + P] = mem_pos[:, S:]
    mask[:, cap_frames : cap_frames + P] = True

    out_pad = ma.memory_attention(
        params["memory_attention"], CFG.memory_attention,
        jnp.asarray(curr), jnp.asarray(mem_pad), jnp.asarray(curr_pos),
        jnp.asarray(pos_pad), kv_mask=jnp.asarray(mask),
        num_frame_tokens=cap_frames,
    )
    assert max_err(out_pad, out_exact) < 2e-5


def test_image_encoder_parity(torch_model, params):
    import torch

    rng = np.random.default_rng(5)
    img = rng.standard_normal((1, 3, 128, 128), np.float32)
    with torch.no_grad():
        out_t = torch_model.image_encoder(torch.from_numpy(img))
    out_j = hiera_mod.image_encoder(
        params["image_encoder"],
        jnp.asarray(to_nhwc(img)),
        CFG.trunk,
        CFG.neck,
        scalp=CFG.scalp,
    )
    assert len(out_j["backbone_fpn"]) == len(out_t["backbone_fpn"])
    for fj, ft in zip(out_j["backbone_fpn"], out_t["backbone_fpn"]):
        assert max_err(to_nchw(fj), ft.detach().numpy()) < 2e-3
    for pj, pt in zip(out_j["vision_pos_enc"], out_t["vision_pos_enc"]):
        assert max_err(to_nchw(pj), pt.detach().numpy()) < 5e-5


def test_forward_image_parity(torch_model, params):
    import torch

    rng = np.random.default_rng(6)
    img = rng.standard_normal((1, 3, 128, 128), np.float32)
    with torch.no_grad():
        out_t = torch_model.forward_image(torch.from_numpy(img))
    out_j = base.forward_image(params, CFG, jnp.asarray(to_nhwc(img)))
    for fj, ft in zip(out_j["backbone_fpn"], out_t["backbone_fpn"]):
        assert max_err(to_nchw(fj), ft.detach().numpy()) < 2e-3


def test_forward_sam_heads_parity(torch_model, params):
    import torch

    rng = np.random.default_rng(7)
    feats = rng.standard_normal((1, 256, 64, 64), np.float32) * 0.5
    hrf0 = rng.standard_normal((1, 32, 256, 256), np.float32) * 0.5
    hrf1 = rng.standard_normal((1, 64, 128, 128), np.float32) * 0.5
    coords = np.array([[[500.0, 600.0]]], np.float32)
    labels = np.array([[1]], np.int32)
    with torch.no_grad():
        outs_t = torch_model._forward_sam_heads(
            backbone_features=torch.from_numpy(feats),
            point_inputs={
                "point_coords": torch.from_numpy(coords),
                "point_labels": torch.from_numpy(labels),
            },
            mask_inputs=None,
            high_res_features=[torch.from_numpy(hrf0), torch.from_numpy(hrf1)],
            multimask_output=True,
        )
    outs_j = base.forward_sam_heads(
        params,
        CFG,
        jnp.asarray(to_nhwc(feats)),
        jnp.asarray(coords),
        jnp.asarray(labels),
        high_res_features=(jnp.asarray(to_nhwc(hrf0)), jnp.asarray(to_nhwc(hrf1))),
        multimask_output=True,
    )
    names = [
        "low_res_multimasks", "high_res_multimasks", "ious",
        "low_res_masks", "high_res_masks", "obj_ptr", "object_score_logits",
    ]
    tols = [5e-4, 5e-4, 1e-4, 5e-4, 5e-4, 2e-4, 1e-4]
    for name, tol, tj, tt in zip(names, tols, outs_j, outs_t):
        assert tuple(tj.shape) == tuple(tt.shape), (name, tj.shape, tt.shape)
        assert max_err(tj, tt.detach().numpy()) < tol, name


def test_encode_new_memory_parity(torch_model, params):
    import torch

    rng = np.random.default_rng(8)
    feats_hw = rng.standard_normal((4096, 1, 256), np.float32) * 0.5
    masks = rng.standard_normal((1, 1, 1024, 1024), np.float32)
    obj_score = np.array([[2.0]], np.float32)
    with torch.no_grad():
        mm_t, pos_t = torch_model._encode_new_memory(
            current_vision_feats=[torch.from_numpy(feats_hw)],
            feat_sizes=[(64, 64)],
            pred_masks_high_res=torch.from_numpy(masks),
            object_score_logits=torch.from_numpy(obj_score),
            is_mask_from_pts=False,
        )
    pix_feat = feats_hw.transpose(1, 0, 2).reshape(1, 64, 64, 256)
    mm_j, pos_j = base.encode_new_memory(
        params, CFG, jnp.asarray(pix_feat), jnp.asarray(masks),
        jnp.asarray(obj_score), is_mask_from_pts=False,
    )
    assert max_err(to_nchw(mm_j), mm_t.detach().numpy()) < 2e-4
    assert max_err(to_nchw(pos_j), pos_t[0].detach().numpy()) < 1e-5

    # occluded object: no_obj_embed_spatial must kick in
    obj_score_neg = np.array([[-3.0]], np.float32)
    with torch.no_grad():
        mm_t2, _ = torch_model._encode_new_memory(
            current_vision_feats=[torch.from_numpy(feats_hw)],
            feat_sizes=[(64, 64)],
            pred_masks_high_res=torch.from_numpy(masks),
            object_score_logits=torch.from_numpy(obj_score_neg),
            is_mask_from_pts=False,
        )
    mm_j2, _ = base.encode_new_memory(
        params, CFG, jnp.asarray(pix_feat), jnp.asarray(masks),
        jnp.asarray(obj_score_neg), is_mask_from_pts=False,
    )
    assert max_err(to_nchw(mm_j2), mm_t2.detach().numpy()) < 2e-4
