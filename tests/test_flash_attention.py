"""Flash-attention kernel vs unfused SDPA (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.kernels.flash_attention import flash_attention
from sam2_opt_tpu.ops.common import scaled_dot_product_attention


@pytest.mark.parametrize(
    "B,H,Sq,Skv,D,masked",
    [
        (1, 2, 256, 256, 64, False),
        (1, 1, 256, 640, 72, True),     # unaligned head dim + kv mask
        (2, 1, 128, 384, 256, True),
    ],
)
def test_flash_matches_sdpa(B, H, Sq, Skv, D, masked):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    mask = None
    mask_b = None
    if masked:
        m = rng.random((B, Skv)) > 0.3
        m[:, :4] = True  # no fully-masked rows
        mask = jnp.asarray(m)
        mask_b = mask[:, None, None, :]
    ref = scaled_dot_product_attention(q, k, v, mask=mask_b)
    out = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128,
                          interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-5, err


def test_window_kernel_matches_sdpa():
    """kernels/window_attention.py (opt-in via SAM2_TPU_WINDOW_KERNEL=1)
    must match SDPA on windowed shapes; run in Pallas interpret mode on CPU."""
    from sam2_opt_tpu.kernels.window_attention import window_attention
    from sam2_opt_tpu.ops.common import scaled_dot_product_attention

    rng = np.random.default_rng(11)
    N, S, D = 8, 64, 96
    q = jnp.asarray(rng.standard_normal((N, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, S, D)), jnp.float32)
    out = window_attention(q, k, v, interpret=True)
    ref = scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_window_kernel_matches_sdpa():
    """The packed block-diagonal window kernel must equal per-window SDPA:
    the off-diagonal logits it spends on MXU shaping are masked to -inf and
    cannot leak across windows."""
    from sam2_opt_tpu.kernels.window_attention import packed_window_attention

    rng = np.random.default_rng(51)
    N, S, H, D = 24, 16, 4, 72
    q = jnp.asarray(rng.standard_normal((N, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, S, H, D)), jnp.float32)
    out = packed_window_attention(q, k, v)
    ref = scaled_dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_window_kernel_gradients():
    """packed_window_attention's custom VJP (plain-XLA softmax recompute,
    per-window einsums) must match autodiff through SDPA."""
    from sam2_opt_tpu.kernels.window_attention import packed_window_attention

    rng = np.random.default_rng(52)
    N, S, H, D = 6, 16, 2, 32
    q = jnp.asarray(rng.standard_normal((N, S, H, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, S, H, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, S, H, D)) * 0.3, jnp.float32)

    def loss_packed(q, k, v):
        return jnp.sum(packed_window_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        o = scaled_dot_product_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
        ).transpose(0, 2, 1, 3)
        return jnp.sum(o * o)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, "qkv"):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, f"d{name} err {err}"


def test_window_flash_3d_gradients():
    """window_flash_3d's custom VJP (shared softmax-recompute backward)
    must match autodiff through SDPA — routing windows through the kernel
    via SAM2_TPU_FLASH_WINDOW_MIN during training must not crash or drift."""
    from sam2_opt_tpu.kernels.window_attention import window_flash_3d

    rng = np.random.default_rng(53)
    N, S, H, D = 4, 16, 2, 32
    q = jnp.asarray(rng.standard_normal((N, S, H, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, S, H, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, S, H, D)) * 0.3, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(window_flash_3d(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        o = scaled_dot_product_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
        ).transpose(0, 2, 1, 3)
        return jnp.sum(o * o)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, f"d{name} err {err}"


def test_flash_or_sdpa_window_flag(monkeypatch):
    """The SAM2_TPU_WINDOW_KERNEL=1 dispatch path is wired and numerically
    consistent with the default path."""
    import sam2_opt_tpu.kernels.window_attention as wk
    from sam2_opt_tpu.ops import common as ops

    rng = np.random.default_rng(12)
    B, H, S, D = 2, 2, 64, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    base = ops.flash_or_sdpa(q, k, v)

    orig = wk.window_attention
    monkeypatch.setattr(
        wk, "window_attention",
        lambda *a, **kw: orig(*a, interpret=True, **kw),
    )
    monkeypatch.setenv("SAM2_TPU_WINDOW_KERNEL", "1")
    monkeypatch.setenv("SAM2_TPU_FLASH", "1")
    out = ops.flash_or_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_sdpa():
    """The flash kernel's custom VJP (softmax-recompute backward) must match
    SDPA gradients — without it, training on TPU (where flash is the default
    attention) fails to differentiate at all."""
    from sam2_opt_tpu.kernels.flash_attention import flash_attention
    from sam2_opt_tpu.ops.common import scaled_dot_product_attention

    rng = np.random.default_rng(13)
    B, H, Sq, Skv, D = 1, 2, 128, 192, 64
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)) * 0.3, jnp.float32)
    m = np.ones((B, Skv), bool)
    m[:, 150:] = False
    mask = jnp.asarray(m)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128,
                            interpret=True)
        return jnp.sum(o * o)

    def loss_sdpa(q, k, v):
        o = scaled_dot_product_attention(q, k, v, mask=mask[:, None, None, :])
        return jnp.sum(o * o)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_sdpa, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gs, "qkv"):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, f"d{name} err {err}"


def _interleaved_rope_reference(q, k, v, mask, cos, sin, num_frame_tokens, reps):
    """Reference math: interleaved-layout RoPE on q and the spatial-K region
    (obj-ptr keys unrotated), then unfused SDPA."""
    from sam2_opt_tpu.ops import posenc

    q = posenc.apply_rotary(q, cos, sin)
    k_fr = posenc.apply_rotary(
        k[:, :, :num_frame_tokens], jnp.tile(cos, (reps, 1)),
        jnp.tile(sin, (reps, 1))
    )
    k = jnp.concatenate([k_fr, k[:, :, num_frame_tokens:]], axis=2)
    mb = None if mask is None else mask[:, None, None, :]
    return scaled_dot_product_attention(q, k, v, mask=mb)


def test_flash_rope_fused_matches_interleaved_reference():
    """The rope-fused kernel (split layout, K rotated in-kernel, identity
    rows for obj-ptr keys) must match interleaved RoPE + SDPA exactly: the
    split layout is a channel permutation applied to BOTH q and k, which
    leaves q·kᵀ — and the attention output — unchanged."""
    from sam2_opt_tpu.ops import posenc

    rng = np.random.default_rng(21)
    B, H, D = 1, 1, 64
    ex = ey = 16
    Sq = ex * ey          # 256
    reps = 2
    nft = reps * Sq       # 512 spatial-memory tokens
    n_ptr = 24
    Skv = nft + n_ptr
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    m = rng.random((B, Skv)) > 0.2
    m[:, :4] = True
    mask = jnp.asarray(m)

    cos, sin = posenc.axial_rope_cos_sin(D, ex, ey)
    ref = _interleaved_rope_reference(
        q, k, v, mask, jnp.asarray(cos), jnp.asarray(sin), nft, reps
    )

    # split layout: permute q/k channels, rotate q outside, K in-kernel
    perm = posenc.split_perm(D, H)
    qp = q[..., perm]
    kp = k[..., perm]
    c_half, s_half = posenc.rope_half_tables(D, ex, ey)
    qp = posenc.apply_rotary_split(
        qp, jnp.asarray(c_half), jnp.asarray(s_half)
    )
    ck = np.concatenate([np.tile(c_half, (reps, 1)),
                         np.ones((n_ptr, D // 2), np.float32)])
    sk = np.concatenate([np.tile(s_half, (reps, 1)),
                         np.zeros((n_ptr, D // 2), np.float32)])
    out = flash_attention(
        qp, kp, v, kv_mask=mask,
        rope_cos_k=jnp.asarray(ck), rope_sin_k=jnp.asarray(sk),
        block_q=128, block_k=128, interpret=True,
    )
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-5, err


def test_flash_rope_fused_gradients():
    """The rope-fused kernel's VJP (inverse-rotation on dK) must match
    autodiff through the unfused interleaved reference."""
    from sam2_opt_tpu.ops import posenc

    rng = np.random.default_rng(22)
    B, H, D = 1, 1, 64
    ex = ey = 16
    Sq = ex * ey
    nft = Sq
    n_ptr = 16
    Skv = nft + n_ptr
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)) * 0.3, jnp.float32)
    cos, sin = posenc.axial_rope_cos_sin(D, ex, ey)
    perm = posenc.split_perm(D, H)
    inv_perm = np.argsort(perm)
    c_half, s_half = posenc.rope_half_tables(D, ex, ey)
    ck = jnp.asarray(np.concatenate(
        [c_half, np.ones((n_ptr, D // 2), np.float32)]))
    sk = jnp.asarray(np.concatenate(
        [s_half, np.zeros((n_ptr, D // 2), np.float32)]))

    def loss_ref(q, k, v):
        o = _interleaved_rope_reference(
            q, k, v, None, jnp.asarray(cos), jnp.asarray(sin), nft, 1
        )
        return jnp.sum(o * o)

    def loss_fused(q, k, v):
        qp = posenc.apply_rotary_split(q[..., perm], jnp.asarray(c_half),
                                       jnp.asarray(s_half))
        o = flash_attention(qp, k[..., perm], v, rope_cos_k=ck, rope_sin_k=sk,
                            block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * o)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, f"d{name} err {err}"


def test_flash_fast_exp_bf16_close_to_fp32():
    """The in-kernel bf16-probability path (fast_exp, the Pallas analogue of
    SAM2_TPU_FAST_SOFTMAX) must stay close to the fp32-softmax kernel on bf16
    inputs; fp32 inputs never take it (parity path untouched)."""
    rng = np.random.default_rng(41)
    B, H, Sq, Skv, D = 1, 1, 256, 512, 64
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.bfloat16)
    exact = flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True, fast_exp=False)
    fast = flash_attention(q, k, v, block_q=128, block_k=128,
                           interpret=True, fast_exp=True)
    err = np.abs(np.asarray(fast, np.float32) - np.asarray(exact, np.float32)).max()
    assert err < 0.05, err


def test_flash_kv_proj_fused_matches_reference():
    """The kv-projection-fused kernel (K/V projected from mem_dim + bias +
    partial RoPE in-kernel) must match project-then-rotate-then-SDPA, and its
    VJP must match autodiff through that reference chain."""
    from sam2_opt_tpu.kernels.flash_attention import flash_attention_kv_proj
    from sam2_opt_tpu.ops import posenc

    rng = np.random.default_rng(31)
    B, D, Dm = 1, 64, 32
    ex = ey = 16
    Sq = ex * ey
    nft = Sq
    n_ptr = 16
    Skv = nft + n_ptr
    q_in = jnp.asarray(rng.standard_normal((B, 1, Sq, D)) * 0.3, jnp.float32)
    mem_k = jnp.asarray(rng.standard_normal((B, Skv, Dm)) * 0.3, jnp.float32)
    mem_v = jnp.asarray(rng.standard_normal((B, Skv, Dm)) * 0.3, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((Dm, D)) * 0.2, jnp.float32)
    bk = jnp.asarray(rng.standard_normal(D) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((Dm, D)) * 0.2, jnp.float32)
    bv = jnp.asarray(rng.standard_normal(D) * 0.05, jnp.float32)
    m = rng.random((B, Skv)) > 0.25
    m[:, :4] = True
    mask = jnp.asarray(m)

    c_half, s_half = posenc.rope_half_tables(D, ex, ey)
    ck = jnp.asarray(np.concatenate(
        [c_half, np.ones((n_ptr, D // 2), np.float32)]))
    sk = jnp.asarray(np.concatenate(
        [s_half, np.zeros((n_ptr, D // 2), np.float32)]))
    cq = jnp.asarray(c_half)
    sq_ = jnp.asarray(s_half)

    def reference(q_in, mem_k, mem_v, wk, bk, wv, bv):
        # q assumed already in the split layout; rotate outside
        q = posenc.apply_rotary_split(q_in, cq, sq_)
        k = (mem_k @ wk + bk)[:, None]
        k = posenc.apply_rotary_split(k, ck, sk)
        v = (mem_v @ wv + bv)[:, None]
        return scaled_dot_product_attention(q, k, v,
                                            mask=mask[:, None, None, :])

    def fused(q_in, mem_k, mem_v, wk, bk, wv, bv):
        q = posenc.apply_rotary_split(q_in, cq, sq_)
        return flash_attention_kv_proj(
            q, mem_k, mem_v, wk, bk, wv, bv, kv_mask=mask,
            rope_cos_k=ck, rope_sin_k=sk,
            block_q=128, block_k=128, interpret=True,
        )

    ref = reference(q_in, mem_k, mem_v, wk, bk, wv, bv)
    out = fused(q_in, mem_k, mem_v, wk, bk, wv, bv)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-5, err

    loss_r = lambda *a: jnp.sum(reference(*a) ** 2)
    loss_f = lambda *a: jnp.sum(fused(*a) ** 2)
    args = (q_in, mem_k, mem_v, wk, bk, wv, bv)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    gf = jax.grad(loss_f, argnums=tuple(range(7)))(*args)
    names = ["q", "mem_k", "mem_v", "wk", "bk", "wv", "bv"]
    for a, b, name in zip(gf, gr, names):
        gerr = float(jnp.max(jnp.abs(a - b)))
        assert gerr < 2e-4, f"d{name} err {gerr}"


def test_rope_cross_attention_fused_matches_unfused(monkeypatch):
    """models/memory_attention.py's fused-RoPE branch (permuted projections +
    in-kernel K rotation) must reproduce the unfused interleaved path on the
    real module, including the kv validity mask."""
    import sam2_opt_tpu.kernels.flash_attention as fa
    from sam2_opt_tpu.config import MemoryAttentionConfig
    from sam2_opt_tpu.models import memory_attention as ma

    cfg = MemoryAttentionConfig(rope_feat_sizes=(32, 32))
    rng = np.random.default_rng(23)
    B = 1
    seq = 32 * 32            # 1024 query tokens
    reps = 2
    nft = reps * seq
    n_ptr = 32
    Skv = nft + n_ptr
    dm, dkv = cfg.d_model, cfg.kv_in_dim

    def lin(i, o):
        return {
            "weight": jnp.asarray(rng.standard_normal((i, o)) * 0.05, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(o) * 0.01, jnp.float32),
        }

    p = {"q_proj": lin(dm, dm), "k_proj": lin(dkv, dm),
         "v_proj": lin(dkv, dm), "out_proj": lin(dm, dm)}
    q_in = jnp.asarray(rng.standard_normal((B, seq, dm)), jnp.float32)
    k_in = jnp.asarray(rng.standard_normal((B, Skv, dkv)), jnp.float32)
    v_in = jnp.asarray(rng.standard_normal((B, Skv, dkv)), jnp.float32)
    m = rng.random((B, Skv)) > 0.3
    m[:, :8] = True
    mask = jnp.asarray(m)

    monkeypatch.setenv("SAM2_TPU_FLASH", "0")
    ref = ma.rope_cross_attention(p, cfg, q_in, k_in, v_in, mask, nft)

    orig = fa.flash_attention
    orig_kv = fa.flash_attention_kv_proj
    monkeypatch.setattr(
        fa, "flash_attention",
        lambda *a, **kw: orig(*a, block_q=256, block_k=256, interpret=True,
                              **kw),
    )
    monkeypatch.setattr(
        fa, "flash_attention_kv_proj",
        lambda *a, **kw: orig_kv(*a, block_q=256, block_k=256, interpret=True,
                                 **kw),
    )
    monkeypatch.setenv("SAM2_TPU_FLASH", "1")
    monkeypatch.setenv("SAM2_TPU_FUSED_ROPE", "1")
    # deepest path: kv-projection fused (default on, single-head)
    out = ma.rope_cross_attention(p, cfg, q_in, k_in, v_in, mask, nft)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # intermediate path: rope-fused kernel with XLA-side projections
    monkeypatch.setenv("SAM2_TPU_FUSED_KV_PROJ", "0")
    out2 = ma.rope_cross_attention(p, cfg, q_in, k_in, v_in, mask, nft)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fast_softmax_bf16_close_to_fp32(monkeypatch):
    """bf16-logit SDPA (the default bf16 compute path) must stay close to the
    fp32-logit result, and fp32 inputs must be byte-identical regardless of
    the flag (the parity path is untouched)."""
    from sam2_opt_tpu.ops import common as ops

    rng = np.random.default_rng(14)
    q32 = jnp.asarray(rng.standard_normal((2, 4, 64, 32)), jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((2, 4, 64, 32)), jnp.float32)
    v32 = jnp.asarray(rng.standard_normal((2, 4, 64, 32)), jnp.float32)

    monkeypatch.setenv("SAM2_TPU_FAST_SOFTMAX", "1")
    ref32 = ops.scaled_dot_product_attention(q32, k32, v32)
    monkeypatch.setenv("SAM2_TPU_FAST_SOFTMAX", "0")
    assert np.array_equal(
        np.asarray(ref32),
        np.asarray(ops.scaled_dot_product_attention(q32, k32, v32)),
    )

    monkeypatch.setenv("SAM2_TPU_FAST_SOFTMAX", "1")
    out_fast = ops.scaled_dot_product_attention(
        q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        v32.astype(jnp.bfloat16),
    )
    err = np.abs(np.asarray(out_fast, np.float32) - np.asarray(ref32)).max()
    assert err < 0.1, err  # bf16 rounding through logits+softmax, not junk


def test_flash_fully_masked_rows_output_zero():
    """A batch row whose kv_mask is entirely False must produce ZEROS (and
    zero gradients), not the mean of V: with every logit at NEG_INF the
    online softmax's p = exp(s - m) is 1 at the masked positions, so the
    l==0 guard alone never fires (regression: the finish gate is on m)."""
    rng = np.random.default_rng(11)
    B, H, Sq, Skv, D = 2, 1, 128, 384, 64
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    m = np.ones((B, Skv), bool)
    m[1, :] = False  # row 1: no valid memory at all
    mask = jnp.asarray(m)

    out = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128,
                          interpret=True)
    ref = scaled_dot_product_attention(q[:1], k[:1], v[:1])
    assert float(jnp.max(jnp.abs(out[:1] - ref))) < 2e-5
    assert float(jnp.max(jnp.abs(out[1]))) == 0.0

    # gradients through the masked row must be zero as well
    def loss(q, k, v):
        o = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128,
                            interpret=True)
        return jnp.sum(o[1] ** 2) + jnp.sum(o[0] ** 2) * 0.0
    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (dq, dk, dv):
        assert float(jnp.max(jnp.abs(g))) == 0.0


def test_flash_rope_fully_masked_rows_output_zero():
    from sam2_opt_tpu.ops import posenc

    rng = np.random.default_rng(12)
    B, H, Sq, Skv, D = 2, 1, 128, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    cos = jnp.asarray(rng.standard_normal((Skv, D // 2)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((Skv, D // 2)), jnp.float32)
    m = np.ones((B, Skv), bool)
    m[0, :] = False
    mask = jnp.asarray(m)
    out = flash_attention(q, k, v, kv_mask=mask, rope_cos_k=cos,
                          rope_sin_k=sin, block_q=128, block_k=128,
                          interpret=True)
    assert float(jnp.max(jnp.abs(out[0]))) == 0.0
    assert float(jnp.max(jnp.abs(out[1]))) > 0.0


def test_wide_block_gate_sees_vmap(monkeypatch):
    """The opt-in (2048, 1024) rope-block fast path must not engage under
    jax.vmap even when SAM2_TPU_WIDE_Q_BLOCK=1: the traced shape reads B=H=1
    but the physical pallas operands carry the vmap batch, recreating the
    B=8 scoped-VMEM overflow the gate exists to prevent. _default_blocks
    runs outside the jit wrapper precisely so it can see the BatchTracer.
    Without the env opt-in the default is (1024, 1024) everywhere (wide
    blocks only fit when XLA happens not to stage operands in scoped VMEM
    around the kernel — not a property a default may rely on)."""
    from sam2_opt_tpu.kernels.flash_attention import (
        _default_blocks,
        _is_batch_traced,
    )

    q = jnp.zeros((1, 1, 4096, 256), jnp.bfloat16)
    k = jnp.zeros((1, 1, 8192, 256), jnp.bfloat16)

    # default (no opt-in): safe narrow blocks even on the cross shape
    bq_d, bk_d = _default_blocks(q, k, True, None, None)
    assert (bq_d, bk_d) == (1024, 1024)

    monkeypatch.setenv("SAM2_TPU_WIDE_Q_BLOCK", "1")

    # concrete (non-vmapped) single-sequence cross shape: wide blocks
    bq, bk = _default_blocks(q, k, True, None, None)
    assert (bq, bk) == (2048, 1024)

    seen = {}

    def f(qi, ki):
        seen["batched"] = _is_batch_traced(qi)
        seen["blocks"] = _default_blocks(qi, ki, True, None, None)
        return qi

    jax.vmap(f)(q[None], k[None])  # element shape == the wide-path shape
    assert seen["batched"] is True
    assert seen["blocks"] == (1024, 1024)

    # plain jit tracing (no vmap) must still allow the wide path
    def g(qi, ki):
        seen["jit_batched"] = _is_batch_traced(qi)
        seen["jit_blocks"] = _default_blocks(qi, ki, True, None, None)
        return qi

    jax.jit(g)(q, k)
    assert seen["jit_batched"] is False
    assert seen["jit_blocks"] == (2048, 1024)

    # leading batch on the concrete shape: conservative blocks
    bq8, _ = _default_blocks(jnp.zeros((8, 1, 4096, 256), jnp.bfloat16), k,
                             True, None, None)
    assert bq8 == 1024


def test_chunked_backward_matches_sdpa(monkeypatch):
    """The q-chunked softmax-recompute backward (SAM2_TPU_BWD_LOGIT_MB — the
    bound that fits the hiera-b+ @1024² T=8 train step on a 16 GB v5e) must
    produce the same gradients as SDPA autodiff. A 1 MB budget forces maximum
    chunking (128-row chunks) on both the plain-mask and rope-fused paths."""
    from sam2_opt_tpu.kernels.flash_attention import (
        _bwd_chunk_rows,
        flash_attention,
    )
    from sam2_opt_tpu.ops.common import scaled_dot_product_attention
    from sam2_opt_tpu.ops import posenc

    monkeypatch.setenv("SAM2_TPU_BWD_LOGIT_MB", "1")
    assert _bwd_chunk_rows(4, 512, 512) == 128  # chunking actually active

    rng = np.random.default_rng(21)
    B, H, S, D = 2, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    m = np.ones((B, S), bool)
    m[:, 490:] = False
    mask = jnp.asarray(m)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128,
                            interpret=True)
        return jnp.sum(o * o)

    def loss_sdpa(q, k, v):
        o = scaled_dot_product_attention(q, k, v, mask=mask[:, None, None, :])
        return jnp.sum(o * o)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_sdpa, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gs, "qkv"):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, f"d{name} err {err} (chunked plain backward)"

    # rope-fused path (split channel layout, identity rows for the last keys)
    half = D // 2
    pos = np.arange(S, dtype=np.float32)
    inv = 1.0 / (10000.0 ** (np.arange(half, dtype=np.float32) / half))
    ang = pos[:, None] * inv[None, :]
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    cos_id = jnp.concatenate([cos[:-32], jnp.ones((32, half))], axis=0)
    sin_id = jnp.concatenate([sin[:-32], jnp.zeros((32, half))], axis=0)

    def loss_rope(q, k, v):
        qr = posenc.apply_rotary_split(q, cos, sin)
        o = flash_attention(qr, k, v, kv_mask=mask, rope_cos_k=cos_id,
                            rope_sin_k=sin_id, block_q=128, block_k=128,
                            interpret=True)
        return jnp.sum(o * o)

    def loss_rope_ref(q, k, v):
        qr = posenc.apply_rotary_split(q, cos, sin)
        kr = posenc.apply_rotary_split(k, cos_id[None, None], sin_id[None, None])
        o = scaled_dot_product_attention(qr, kr, v,
                                         mask=mask[:, None, None, :])
        return jnp.sum(o * o)

    gr = jax.grad(loss_rope, argnums=(0, 1, 2))(q, k, v)
    gr_ref = jax.grad(loss_rope_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gr_ref, "qkv"):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, f"d{name} err {err} (chunked rope backward)"


def test_chunked_backward_bf16_inputs():
    """bf16 inputs keep bf16 MXU-rate matmuls in the backward (fp32
    accumulation; p/ds rounded to bf16 only as matmul inputs). Gradients must
    stay within bf16 rounding distance of the fp32 SDPA reference."""
    from sam2_opt_tpu.kernels.flash_attention import flash_attention
    from sam2_opt_tpu.ops.common import scaled_dot_product_attention

    rng = np.random.default_rng(23)
    B, H, S, D = 1, 2, 256, 64
    qn = rng.standard_normal((B, H, S, D)) * 0.3
    kn = rng.standard_normal((B, H, S, D)) * 0.3
    vn = rng.standard_normal((B, H, S, D)) * 0.3
    qb, kb, vb = (jnp.asarray(a, jnp.bfloat16) for a in (qn, kn, vn))
    q32, k32, v32 = (jnp.asarray(a, jnp.float32) for a in (qn, kn, vn))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_sdpa(q, k, v):
        o = scaled_dot_product_attention(q, k, v)
        return jnp.sum(o ** 2)

    gb = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    gs = jax.grad(loss_sdpa, argnums=(0, 1, 2))(q32, k32, v32)
    for a, b, name in zip(gb, gs, "qkv"):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b)
        assert a.dtype == jnp.bfloat16
        denom = max(float(np.abs(b32).max()), 1e-3)
        rel = float(np.abs(a32 - b32).max()) / denom
        assert rel < 0.06, f"d{name} rel err {rel} (bf16 chunked backward)"
