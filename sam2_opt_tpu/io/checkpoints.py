"""Model checkpoint IO: native (orbax) format + torch-.pt conversion CLI.

The parity-critical converter (torch `sd["model"]` -> params pytree) lives in
io/torch_convert.py; this module adds a native save/load format so converted
or trained params round-trip without torch, plus the CLI:

    python -m sam2_opt_tpu.io.checkpoints convert sam2.1_hiera_large.pt out_dir
    python -m sam2_opt_tpu.io.checkpoints inspect out_dir
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional

import numpy as np


def save_params(path: str, params: Dict) -> None:
    """Save a params pytree with orbax (atomic via tmp+rename)."""
    import jax
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    tmp = path + ".tmp"
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckpt.save(tmp, jax.tree_util.tree_map(np.asarray, params))
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def intify_keys(tree):
    """Orbax restores dict keys as strings; convert digit keys back to int so
    the tree matches the converter/init layout."""
    if isinstance(tree, dict):
        return {
            (int(k) if isinstance(k, str) and k.isdigit() else k): intify_keys(v)
            for k, v in tree.items()
        }
    return tree


def load_params(path: str) -> Dict:
    import orbax.checkpoint as ocp

    return intify_keys(ocp.PyTreeCheckpointer().restore(path))


def convert_pt_to_native(pt_path: str, out_path: str) -> Dict:
    """torch .pt -> native orbax params (requires torch once, offline)."""
    from sam2_opt_tpu.io.torch_convert import load_torch_checkpoint

    params = load_torch_checkpoint(pt_path)
    save_params(out_path, params)
    return params


def build_from_any(variant: str, checkpoint: Optional[str]):
    """Build a SAM2Model from a .pt file, a native orbax dir, or random init."""
    from sam2_opt_tpu.models.model import SAM2Model, build_sam2

    if checkpoint and os.path.isdir(checkpoint):
        from sam2_opt_tpu.config import model_config

        return SAM2Model(load_params(checkpoint), model_config(variant))
    return build_sam2(variant, checkpoint_path=checkpoint)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if (
        not argv
        or argv[0] not in ("convert", "inspect")
        or (argv[0] == "convert" and len(argv) < 3)
        or (argv[0] == "inspect" and len(argv) < 2)
    ):
        print(__doc__)
        return 1
    if argv[0] == "convert":
        pt_path, out_path = argv[1], argv[2]
        params = convert_pt_to_native(pt_path, out_path)
        n = sum(int(np.prod(np.shape(x))) for x in _leaves(params))
        print(f"converted {pt_path} -> {out_path} ({n/1e6:.1f}M params)")
    elif argv[0] == "inspect":
        params = load_params(argv[1])
        flat = _flatten(params)
        for name, arr in list(flat.items())[:20]:
            print(f"{name}: {np.shape(arr)} {np.asarray(arr).dtype}")
        n = sum(int(np.prod(np.shape(x))) for x in flat.values())
        print(f"... {len(flat)} tensors, {n/1e6:.1f}M params")
    return 0


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def _flatten(tree):
    import jax

    from sam2_opt_tpu.utils.misc import keystr_to_dotted

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[keystr_to_dotted(jax.tree_util.keystr(path))] = leaf
    return out


if __name__ == "__main__":
    raise SystemExit(main())
