"""Structural check: random init must produce exactly the converted-torch tree
(build order step 1 gate, SURVEY.md §7: "tree shapes match torch state_dict")."""

import numpy as np
import pytest

import jax

from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.io.torch_convert import convert_state_dict
from sam2_opt_tpu.models.init import init_params

from reference_helper import reference_available


def flat_shapes(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        jax.tree_util.keystr(path): tuple(np.shape(leaf)) for path, leaf in leaves
    }


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
def test_init_matches_torch_tree():
    from reference_helper import build_torch_sam2, state_dict_numpy

    torch_tree = convert_state_dict(state_dict_numpy(build_torch_sam2("hiera_t")))
    jax_tree = init_params(model_config("hiera_t"), jax.random.PRNGKey(0))
    ts, js = flat_shapes(torch_tree), flat_shapes(jax_tree)
    missing = sorted(set(ts) - set(js))
    extra = sorted(set(js) - set(ts))
    assert not missing, f"missing params: {missing[:10]}"
    assert not extra, f"extra params: {extra[:10]}"
    bad = {k: (ts[k], js[k]) for k in ts if ts[k] != js[k]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:10])}"


def test_init_large_builds():
    cfg = model_config("hiera_l")
    params = init_params(cfg, jax.random.PRNGKey(0))
    n = sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(params))
    assert n > 2e8, f"hiera-L should have >200M params, got {n/1e6:.1f}M"


def test_jit_cache_lru_eviction():
    """model._jit_fns is bounded (VERDICT r1: unbounded per-shape jit caches
    leak compiled executables in long-lived servers)."""
    from sam2_opt_tpu.core.executor import LRUCache

    c = LRUCache(maxsize=3)
    for i in range(3):
        c[f"k{i}"] = i
    assert c.get("k0") == 0  # touch k0 -> k1 becomes LRU
    c["k3"] = 3
    assert "k1" not in c and "k0" in c and len(c) == 3
    c.clear()
    assert len(c) == 0


def test_export_all_four_seams(tmp_path, tiny128_cfg, tiny128_params):
    """export_all produces all four serialized seams (the reference's ONNX
    export set), including the conditioned track step whose MemoryInput must
    use the production batched [1,S]/[1,P] index layout."""
    import os

    import jax.numpy as jnp

    from sam2_opt_tpu.export.export_stablehlo import export_all
    from sam2_opt_tpu.models.model import SAM2Model

    m = SAM2Model(tiny128_params, tiny128_cfg)
    out = export_all(m, str(tmp_path), dtype=jnp.float32)
    assert sorted(out) == [
        "memory_encoder", "predict_masks", "set_image_e2e", "track_step",
    ]
    for path in out.values():
        assert os.path.getsize(path) > 1000
