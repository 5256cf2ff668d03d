"""State checkpoint/restore.

The reference keeps run history only in in-memory dict-of-lists and resumes by
passing the dict back in (base.py:301-306).  Here the full simulation state is
an immutable pytree, so checkpointing is exact: save the leaves, restore into a
template of the same structure, and feed the state back into the compiled march
— bitwise resume.  npz-based (no format churn); orbax can be layered on top for
async multi-host checkpointing when needed.
"""
from __future__ import annotations

import numpy as np
import jax


def save_pytree(path, tree):
    """Save any pytree of arrays (ColumnState, SWState, ...) to ``path``.npz."""
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, n_leaves=len(leaves),
             **{f'leaf_{i}': np.asarray(l) for i, l in enumerate(leaves)})


def load_pytree(path, template):
    """Restore a pytree saved by save_pytree into the structure (and dtypes)
    of ``template``."""
    path = str(path)
    if not path.endswith('.npz'):
        path += '.npz'
    data = np.load(path)
    n = int(data['n_leaves'])
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != n:
        raise ValueError(f'template has {len(t_leaves)} leaves, file has {n}')
    leaves = [np.asarray(data[f'leaf_{i}'], dtype=np.asarray(t).dtype)
              for i, t in enumerate(t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
