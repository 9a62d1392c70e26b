"""Checkpoint / resume of the full training pytree.

The reference delegates checkpointing to external learning frameworks
(`--checkpoint` to AC-Gym TD3, NEAT config flags — SURVEY.md §5); here the
whole (learner params, optimizer state, env batch state, RNG key) pytree is
one checkpoint, so a killed training job resumes exactly: env states are
plain arrays and resume mid-episode.

Uses orbax when available, with a numpy .npz fallback (same API) so
checkpointing works in minimal environments.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, tree) -> None:
    """Save a pytree of arrays to `path` (directory for orbax, .npz file
    for the fallback)."""
    tree = jax.tree.map(np.asarray, tree)
    if path.endswith('.npz'):
        leaves = jax.tree.leaves(tree)
        np.savez(path, **{f'leaf_{i}': leaf for i, leaf in enumerate(leaves)})
        return
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)


def restore(path: str, template):
    """Restore a pytree saved by `save`; `template` supplies the structure
    (and dtypes for the fallback)."""
    if path.endswith('.npz'):
        data = np.load(path)
        leaves = [data[f'leaf_{i}'] for i in range(len(data.files))]
        treedef = jax.tree.structure(template)
        return jax.tree.unflatten(treedef, leaves)
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    # restore against the template so structure (NamedTuples etc.) and leaf
    # order are preserved
    restored = ckptr.restore(os.path.abspath(path),
                             item=jax.tree.map(np.asarray, template))
    return restored
