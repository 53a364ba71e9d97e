"""Production-shape compile-only checks under the 8-device virtual mesh.

Tiny-shape mesh tests (test_multichip.py) validate numerics; these validate
that the PRODUCTION shapes actually lower + compile under the mesh — so
sharding-rule regressions surface in the suite, not on hardware (the
round-3 scoped-VMEM incident, commit 72d384f, is the motivating bug class;
VMEM limits themselves are TPU-only, but every GSPMD partitioning error is
caught here).

Everything is abstract (jax.eval_shape / ShapeDtypeStruct): no hiera-L/b+
parameters are ever allocated and nothing executes — only
jit(...).lower(...).compile() runs.
"""

import jax
import jax.numpy as jnp
import pytest

from sam2_opt_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices("cpu")[:8]
    assert len(devices) == 8, "conftest must provide 8 virtual CPU devices"
    return mesh_lib.make_mesh(dp=4, tp=2, devices=devices)


def _abstract_params(cfg, mesh, dtype=None):
    """Sharded abstract params pytree (no allocation)."""
    from sam2_opt_tpu.models.init import init_params

    shapes = jax.eval_shape(lambda k: init_params(cfg, k),
                            jax.random.PRNGKey(0))
    if dtype is not None:
        shapes = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape,
                dtype if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype,
            ),
            shapes,
        )
    shardings = mesh_lib.param_shardings(mesh, shapes)
    return jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings,
    )


def test_track_step_1024_7slot_64ptr_compiles_under_mesh(mesh8):
    """hiera-L production track step: 1024² features, 7 memory slots, 16
    object pointers (= 64 pointer tokens), 8 objects batched object-DP over
    the mesh — the exact graph _track_jit("cond") dispatches during batched
    propagation (predictors/video.py make_cond_track_fn)."""
    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.models import video_core as vc
    from sam2_opt_tpu.predictors.video import make_cond_track_fn

    cfg = model_config("hiera_l")
    pabs = _abstract_params(cfg, mesh8, dtype=jnp.bfloat16)

    B, g = 8, cfg.image_embedding_size
    bf = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.bfloat16)
    f32 = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    feats = (bf(1, 4 * g, 4 * g, 32), bf(1, 2 * g, 2 * g, 64),
             bf(1, g, g, 256))
    S, P = cfg.num_maskmem, cfg.max_obj_ptrs_in_encoder
    assert (S, P) == (7, 16)
    mem = vc.MemoryInput(
        feats=tuple(bf(B, g, g, cfg.mem_dim) for _ in range(S)),
        tpos_idx=jax.ShapeDtypeStruct((B, S), jnp.int32),
        valid=jax.ShapeDtypeStruct((B, S), bool),
        ptrs=tuple(f32(B, cfg.hidden_dim) for _ in range(P)),
        ptr_pos=f32(B, P),
        ptr_valid=jax.ShapeDtypeStruct((B, P), bool),
    )
    fn = make_cond_track_fn(
        cfg, mesh8,
        dict(multimask=False, run_mem_encoder=True, fill_hole_area=8),
    )
    compiled = jax.jit(fn).lower(
        pabs, feats, mem, None, None, None, None
    ).compile()
    assert compiled is not None


def _compile_bplus_train_step(mesh8, num_frames: int, clicks: int):
    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.training.optimizer import build_optimizer
    from sam2_opt_tpu.training.trainer import TrainConfig, build_train_step

    cfg = model_config("hiera_b+")
    assert cfg.image_size == 1024
    pabs = _abstract_params(cfg, mesh8)
    tcfg = TrainConfig(
        num_frames=num_frames, batch_size=4, remat="blocks",
        num_correction_clicks=clicks, prob_to_use_pt_input=1.0,
        prob_to_use_box_input=0.0,
    )
    optimizer = build_optimizer(pabs, trunk_depth=cfg.trunk.depth)
    oabs = jax.eval_shape(optimizer.init, pabs)

    B, T, S = 4, tcfg.num_frames, cfg.image_size
    step = build_train_step(cfg, tcfg, optimizer, mesh=mesh8, n_init=1)
    compiled = step.lower(
        pabs, oabs,
        jax.ShapeDtypeStruct((B, T, S, S, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, T, 1, S, S), bool),
        jax.ShapeDtypeStruct((B, 1), bool),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((), jnp.float32),
    ).compile()
    assert compiled is not None


def test_bplus_train_step_1024_compiles_under_mesh(mesh8):
    """hiera-b+ @1024² production-image-size train step with per-block remat,
    fwd+bwd+optimizer, batch 4 DP-sharded over the 4×2 mesh — compile-only.

    T=2 keeps CPU-XLA compile ~5 min; the per-frame graph (and thus the
    GSPMD partitioning surface) is identical at T=8, which the env-gated
    test below covers (measured ~21 min CPU compile)."""
    _compile_bplus_train_step(mesh8, num_frames=2, clicks=1)


@pytest.mark.slow
def test_bplus_train_step_1024_T8_full_recipe_compiles_under_mesh(mesh8):
    """The FULL MOSE-recipe shape (reference sam2/training/README.md:68):
    hiera-b+ @1024², 8-frame rollout, 2 correction clicks.

    Deselected by default via the `slow` marker (pyproject addopts); run
    explicitly with `pytest -m slow tests/test_multichip_compile.py`.
    Recorded green run: round 5, 1-CPU box, 491 s wall (the round-4 ~21 min
    estimate predated the un-nested remat layout, which shrank the graph)."""
    _compile_bplus_train_step(mesh8, num_frames=8, clicks=2)
