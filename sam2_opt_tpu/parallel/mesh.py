"""Device mesh + sharding helpers (TPU-native replacement for the reference's
torch.distributed/NCCL layer, training/utils/distributed.py — SURVEY.md §5).

The reference is DP-only (DDP over NCCL). Here DP is a mesh axis ("data") and
we additionally support tensor-parallel sharding of the large linear weights
over a "model" axis — XLA GSPMD inserts the all-reduces over ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """Create a ("data", "model") mesh. Defaults: all devices on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over "data", replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _tp_spec_for_param(path: str, value, tp: int) -> P:
    """Tensor-parallel partition rule: shard the output dim of the big MLP /
    qkv linear weights over "model"; everything else replicated. A dim is
    sharded only when divisible by the ACTUAL model-axis size `tp` —
    an uneven NamedSharding would raise at device_put.

    This covers the Hiera trunk (the parameter-dominant part); attention
    outputs are re-reduced by GSPMD automatically.
    """
    if value.ndim == 2 and value.shape[-1] >= 1024 and value.shape[-1] % tp == 0:
        if any(k in path for k in ("mlp", "qkv", "linear1")):
            return P(None, "model")
    if value.ndim == 1 and value.shape[0] >= 1024 and value.shape[0] % tp == 0:
        if any(k in path for k in ("mlp", "qkv", "linear1")):
            return P("model")
    return P()


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding tree for a params pytree under the TP rule."""

    tp = mesh.shape["model"]
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    specs = []
    for path, leaf in flat[0]:
        key = jax.tree_util.keystr(path)
        specs.append(NamedSharding(mesh, _tp_spec_for_param(key, leaf, tp)))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(mesh: Mesh, params):
    """Place a params pytree onto the mesh with TP shardings."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
