"""End-to-end parity of the video tracking step: reference SAM2Base.track_step
vs our memory-gather + compiled track_step_conditioned, on synthetic state.

This exercises the full video math in one shot: memory selection (frame-index
arithmetic), temporal pos embeddings, obj-ptr token split, masked memory
attention, SAM heads, and the memory encoder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.io.torch_convert import convert_state_dict
from sam2_opt_tpu.models import video_core as vc
from sam2_opt_tpu.predictors.video import SAM2VideoPredictor
from sam2_opt_tpu.models.model import SAM2Model

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)


@pytest.fixture(scope="module")
def setup():
    from reference_helper import build_torch_sam2, state_dict_numpy

    torch_model = build_torch_sam2("hiera_t", seed=0)
    cfg = model_config("hiera_t")
    params = convert_state_dict(state_dict_numpy(torch_model))
    model = SAM2Model(params, cfg)
    predictor = SAM2VideoPredictor(model, fill_hole_area=0)
    return torch_model, predictor


def _make_frame_out(rng, torch_mod):
    import torch

    # round to bf16 like both sides' memory storage (reference :885-888)
    mm = torch.from_numpy(
        rng.standard_normal((1, 64, 64, 64)).astype(np.float32) * 0.5
    ).to(torch.bfloat16).float()
    return {
        "maskmem_features": mm,
        "maskmem_pos_enc": None,  # filled below
        "obj_ptr": torch.from_numpy(
            rng.standard_normal((1, 256)).astype(np.float32) * 0.5
        ),
        "object_score_logits": torch.from_numpy(np.array([[3.0]], np.float32)),
        "pred_masks": torch.from_numpy(
            rng.standard_normal((1, 1, 256, 256)).astype(np.float32)
        ),
    }


def test_track_step_conditioned_parity(setup):
    import torch

    torch_model, predictor = setup
    cfg = predictor.cfg
    rng = np.random.default_rng(21)

    # synthetic per-frame state: cond frame 0, non-cond frames 1..4; track frame 5
    with torch.no_grad():
        pos = torch_model.memory_encoder.position_encoding(
            torch.zeros(1, 64, 64, 64)
        ).float()
    output_dict_t = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
    for t in range(5):
        out = _make_frame_out(rng, torch_model)
        out["maskmem_pos_enc"] = [pos]
        key = "cond_frame_outputs" if t == 0 else "non_cond_frame_outputs"
        output_dict_t[key][t] = out

    feats_hw = rng.standard_normal((4096, 1, 256)).astype(np.float32) * 0.5
    pos_hw = rng.standard_normal((4096, 1, 256)).astype(np.float32) * 0.1
    hrf0 = rng.standard_normal((1, 32, 256, 256)).astype(np.float32) * 0.5
    hrf1 = rng.standard_normal((1, 64, 128, 128)).astype(np.float32) * 0.5

    # --- reference: _prepare_memory_conditioned_features + heads -------------
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    pe256 = PositionEmbeddingSine(
        num_pos_feats=256, normalize=True, scale=None, temperature=10000
    )
    def flat(x):
        # [1,C,H,W] -> [HW,1,C]
        t = torch.from_numpy(x)
        return t.flatten(2).permute(2, 0, 1)

    with torch.no_grad():
        curr_pos_t = (
            pe256(torch.zeros(1, 256, 64, 64)).flatten(2).permute(2, 0, 1).float()
        )
        current_out_t = torch_model.track_step(
            frame_idx=5,
            is_init_cond_frame=False,
            current_vision_feats=[flat(hrf0), flat(hrf1), torch.from_numpy(feats_hw)],
            current_vision_pos_embeds=[curr_pos_t, curr_pos_t, curr_pos_t],
            feat_sizes=[(256, 256), (128, 128), (64, 64)],
            point_inputs=None,
            mask_inputs=None,
            output_dict=output_dict_t,
            num_frames=10,
            track_in_reverse=False,
            run_mem_encoder=True,
        )

    # --- ours ---------------------------------------------------------------
    def to_jax_out(out_t):
        return {
            "maskmem_features": jnp.asarray(
                out_t["maskmem_features"].numpy().transpose(0, 2, 3, 1)
            ).astype(jnp.bfloat16),
            "obj_ptr": jnp.asarray(out_t["obj_ptr"].numpy()),
            "object_score_logits": jnp.asarray(
                out_t["object_score_logits"].numpy()
            ),
            "pred_masks": jnp.asarray(out_t["pred_masks"].numpy()),
        }

    output_dict_j = {
        "cond_frame_outputs": {
            t: to_jax_out(o) for t, o in output_dict_t["cond_frame_outputs"].items()
        },
        "non_cond_frame_outputs": {
            t: to_jax_out(o)
            for t, o in output_dict_t["non_cond_frame_outputs"].items()
        },
    }
    mem = predictor._gather_memory(
        {"num_frames": 10}, output_dict_j, frame_idx=5, reverse=False
    )
    feats_j = (
        jnp.asarray(hrf0.transpose(0, 2, 3, 1)),
        jnp.asarray(hrf1.transpose(0, 2, 3, 1)),
        jnp.asarray(feats_hw.transpose(1, 0, 2).reshape(1, 64, 64, 256)),
    )
    out_j = vc.track_step_conditioned(
        predictor.model._p, cfg, feats_j, mem,
        multimask_output=True, run_mem_encoder=True, fill_hole_area=0,
    )

    # bf16 memory features on both sides -> compare loosely
    mm_t = (
        current_out_t["maskmem_features"].float().numpy().transpose(0, 2, 3, 1)
    )
    pm_err = np.abs(
        np.asarray(out_j["pred_masks"]) - current_out_t["pred_masks"].numpy()
    ).max()
    ptr_err = np.abs(
        np.asarray(out_j["obj_ptr"]) - current_out_t["obj_ptr"].numpy()
    ).max()
    mm_err = np.abs(
        np.asarray(out_j["maskmem_features"], np.float32) - mm_t
    ).max()
    score_err = np.abs(
        np.asarray(out_j["object_score_logits"])
        - current_out_t["object_score_logits"].numpy()
    ).max()
    assert pm_err < 2e-2, f"pred_masks err {pm_err}"
    assert ptr_err < 5e-3, f"obj_ptr err {ptr_err}"
    assert score_err < 5e-3, f"obj_score err {score_err}"
    assert mm_err < 1e-1, f"maskmem err {mm_err} (bf16 storage on our side)"
