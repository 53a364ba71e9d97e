"""Training-rollout parity vs reference SAM2Train (VERDICT r2 #5).

Runs the reference `SAM2Train.forward` (training/model/sam2.py:269-529) on CPU
torch with converted weights over a 4-frame synthetic video in the
deterministic mask-input configuration (prob_to_use_pt_input=0 → GT mask
prompt on the init frame, no correction clicks, no RNG anywhere), and compares
per-frame multimask logits, IoU heads, object scores AND the per-frame
multistep loss against our `forward_tracking` / `video_train_loss`.

This is the oracle for the in-graph training memory assembly
(`_training_memory`): distance-based maskmem_tpos rows, persistent init-cond
memories, and obj-ptr temporal positions normalized by min(T, max_ptrs)-1 —
the arithmetic VERDICT r2 flagged as having no external check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

T = 4
S = 1024
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _FakeBatch:
    """Duck-typed BatchedVideoDatapoint (training/utils/data_utils.py:36-90)
    for B=1 video, O=1 object — only the attributes SAM2Train.forward touches."""

    def __init__(self, img_batch, masks):
        import torch

        self.img_batch = img_batch  # [T, 1, 3, S, S]
        self.masks = masks          # [T, 1, S, S]
        self._torch = torch

    @property
    def num_frames(self):
        return self.img_batch.shape[0]

    @property
    def flat_img_batch(self):
        return self.img_batch.transpose(0, 1).flatten(0, 1)

    @property
    def flat_obj_to_img_idx(self):
        return self._torch.arange(self.num_frames)[:, None]


def _video():
    rng = np.random.default_rng(17)
    bg = (rng.random((S // 8, S // 8, 3)) * 0.4 + 0.3).astype(np.float32)
    frames01 = np.empty((T, S, S, 3), np.float32)
    masks = np.zeros((T, S, S), bool)
    big = np.kron(bg, np.ones((8, 8, 1), np.float32))
    for t in range(T):
        f = big.copy()
        x0, y0 = 200 + 60 * t, 380
        f[y0 : y0 + 260, x0 : x0 + 260] = (0.9, 0.8, 0.25)
        frames01[t] = f
        masks[t, y0 : y0 + 260, x0 : x0 + 260] = True
    return frames01, masks


@pytest.fixture(scope="module")
def setup():
    from reference_helper import build_torch_sam2train, state_dict_numpy

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict

    torch_model = build_torch_sam2train(
        "hiera_t", seed=0,
        prob_to_use_pt_input_for_train=0.0,
        rand_init_cond_frames_for_train=False,
        num_init_cond_frames_for_train=1,
        num_frames_to_correct_for_train=1,
        num_correction_pt_per_frame=0,
    )
    import torch

    # training-mode memory semantics, but deterministic: zero every dropout
    torch_model.train()
    for m in torch_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    cfg = model_config("hiera_t")
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_state_dict(state_dict_numpy(torch_model))
    )
    return torch_model, cfg, params


def test_training_rollout_parity(setup):
    import torch

    torch_model, cfg, params = setup
    frames01, masks = _video()

    # ---------------- reference rollout ----------------
    norm = (frames01 - IMAGENET_MEAN) / IMAGENET_STD
    img_t = torch.from_numpy(norm).permute(0, 3, 1, 2)[:, None]  # [T,1,3,S,S]
    batch = _FakeBatch(img_t.float(), torch.from_numpy(masks)[:, None].bool())
    with torch.no_grad():
        outs_t = torch_model(batch)
    assert len(outs_t) == T

    # ---------------- our rollout ----------------
    from sam2_opt_tpu.training import sam2_train

    import functools

    fwd = jax.jit(functools.partial(
        sam2_train.forward_tracking, params, cfg,
        num_init_cond_frames=1, use_mask_input=True,
        num_correction_clicks=0, use_remat=False,
    ))
    outs_masks, outs_ious, outs_scores, targets = fwd(
        jnp.asarray(frames01), jnp.asarray(masks)[:, None],
        jax.random.PRNGKey(0),
    )

    # ---------------- per-frame, per-step output parity ----------------
    for t in range(T):
        mm_t = outs_t[t]["multistep_pred_multimasks_high_res"]
        assert len(mm_t) == len(outs_masks[t]) == 1
        a = mm_t[0].numpy()
        b = np.asarray(outs_masks[t][0], np.float32)
        assert a.shape == b.shape, (t, a.shape, b.shape)
        err = np.abs(a - b).max()
        # the init frame is the pure mask-as-output path (tight); tracked
        # frames accumulate fp noise through memory attention
        tol = 2e-3 if t == 0 else 5e-2
        assert err <= tol, f"frame {t}: multimask logit err {err:.4f}"

        iou_err = np.abs(
            outs_t[t]["multistep_pred_ious"][0].numpy()
            - np.asarray(outs_ious[t][0], np.float32)
        ).max()
        assert iou_err <= 5e-3, f"frame {t}: iou err {iou_err:.5f}"

        score_err = np.abs(
            outs_t[t]["multistep_object_score_logits"][0].numpy()
            - np.asarray(outs_scores[t][0], np.float32)
        ).max()
        assert score_err <= 5e-2, f"frame {t}: obj-score err {score_err:.4f}"

    # ---------------- loss parity ----------------
    from training.loss_fns import MultiStepMultiMasksAndIous

    from sam2_opt_tpu.training import losses as L

    weights = {"loss_mask": 20.0, "loss_dice": 1.0, "loss_iou": 1.0,
               "loss_class": 1.0}
    ref_loss_fn = MultiStepMultiMasksAndIous(
        weights, supervise_all_iou=False, iou_use_l1_loss=True,
        pred_obj_scores=True,
    )
    with torch.no_grad():
        for t in range(T):
            ld_t = ref_loss_fn._forward(
                outs_t[t], torch.from_numpy(masks[t : t + 1]).bool(), 1.0
            )
            ld_j = L.multistep_multimasks_and_ious(
                [jnp.asarray(np.asarray(m), jnp.float32) for m in outs_masks[t]],
                [jnp.asarray(np.asarray(i), jnp.float32) for i in outs_ious[t]],
                [jnp.asarray(np.asarray(s), jnp.float32) for s in outs_scores[t]],
                jnp.asarray(masks[t][None, None], jnp.float32),
                1.0, pred_obj_scores=True,
            )
            for key in ("loss_mask", "loss_dice", "loss_iou", "loss_class"):
                a = float(ld_t[key])
                b = float(ld_j[key])
                assert abs(a - b) <= max(5e-3, 0.02 * abs(a)), (
                    f"frame {t} {key}: torch {a:.5f} vs ours {b:.5f}"
                )
            a = float(ld_t["core_loss"])
            b = float(ld_j["core_loss"])
            assert abs(a - b) <= max(2e-2, 0.02 * abs(a)), (
                f"frame {t} core: torch {a:.5f} vs ours {b:.5f}"
            )
