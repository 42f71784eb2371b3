"""Checkpointing: dependency-light, layout-stable pytree persistence.

Replaces the reference's ``torch.save({'model': ..., 'optimizer': ...,
'model_args': ..., 'iter_num': ...})`` (src/utils.py:143-165).  Parameters
and optimizer state are saved as a flat ``.npz`` (keys are pytree paths,
sequence indices encoded as ``#i``) plus a JSON sidecar for scalars/config.
Restoring rebuilds a template pytree (fresh init) and refills its leaves,
so structure changes are caught loudly rather than silently.

Torch-checkpoint *conversion* (the reference ``.pt``/``.ckpt`` formats,
including ``_orig_mod.`` prefix stripping and weight-norm folding) lives in
``llmvox_tpu/tools/convert.py``.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(f"#{p.idx}")
        else:
            parts.append(str(p))
    return "/".join(parts)


def flatten_pytree(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_path_str(path)] = np.asarray(leaf)
    return flat


def save_params_npz(path: str, params, meta: Dict[str, Any] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = flatten_pytree(params)
    np.savez(path, **flat)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_params_npz(path: str):
    """Load a flat npz back into a nested dict/list pytree."""
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for i, part in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            node = node.setdefault(part, {})
        node[parts[-1]] = data[key]
    return _listify(tree)


def _listify(node):
    """Convert {'#0': ..., '#1': ...} dicts back into lists."""
    if isinstance(node, dict):
        conv = {k: _listify(v) for k, v in node.items()}
        if conv and all(k.startswith("#") for k in conv):
            return [conv[f"#{i}"] for i in range(len(conv))]
        return conv
    return node


def load_meta(path: str) -> Dict[str, Any]:
    with open(path + ".json") as f:
        return json.load(f)


def fill_like(template, path: str):
    """Restore into an existing pytree structure (e.g. optimizer state):
    leaves are refilled in flattened order from the npz."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    saved = [data[f"leaf_{i}"] for i in range(len(leaves))]
    assert len(saved) == len(leaves)
    cast = [np.asarray(s, dtype=np.asarray(l).dtype).reshape(np.shape(l))
            for s, l in zip(saved, leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)


def save_opaque(path: str, tree) -> None:
    """Save any pytree (incl. optax states) positionally."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def average_checkpoints(paths):
    """Element-wise mean of N saved parameter sets (the reference's
    ``from_pretrained0911`` averages its 3 best val-loss checkpoints,
    WavTokenizer/decoder/pretrained.py:117-156)."""
    assert paths, "need at least one checkpoint"
    trees = [load_params_npz(p) for p in paths]
    flat = [jax.tree_util.tree_leaves(t) for t in trees]
    n = len(flat)
    avg = [np.mean(np.stack([f[i] for f in flat]), axis=0)
           for i in range(len(flat[0]))]
    treedef = jax.tree_util.tree_structure(trees[0])
    return jax.tree_util.tree_unflatten(treedef, avg)


def load_partial(template, path: str, keep=None):
    """Partial resume: refill only the top-level groups named in ``keep``
    from a saved parameter set, leaving the rest at the template's values
    (the reference's selective state-dict resume loads encoder/decoder/
    quantizer/backbone/head subsets, experiment.py:390-445)."""
    saved = load_params_npz(path)
    out = dict(template)
    for key in (keep if keep is not None else saved.keys()):
        if key in saved and key in out:
            out[key] = jax.tree.map(
                lambda t, s: np.asarray(s, dtype=np.asarray(t).dtype),
                out[key], saved[key])
    return out


def save_orbax(path: str, tree) -> None:
    """Orbax backend (optional): async-capable, sharding-aware checkpoint
    directory — the production choice for multi-host pods where a single
    npz on one host doesn't scale."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_orbax(path: str, template=None):
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), item=template)
        return ckptr.restore(os.path.abspath(path))
