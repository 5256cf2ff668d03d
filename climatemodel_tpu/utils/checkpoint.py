"""State checkpoint/restore.

The reference keeps run history only in in-memory dict-of-lists and resumes by
passing the dict back in (base.py:301-306).  Here the full simulation state is
an immutable pytree, so checkpointing is exact: save the leaves, restore into a
template of the same structure, and feed the state back into the compiled march
— bitwise resume.

Two backends:

* **npz** (default, zero extra deps): one flat file of leaves, synchronous.
* **orbax** (``backend='orbax'``): directory-based OCDBT checkpoints via
  ``orbax.checkpoint``, the production JAX checkpointing stack — supports
  sharded arrays (each host writes its shards; restore honours the template's
  sharding) and asynchronous saves that overlap the next march chunk.  Falls
  back to npz with a warning if orbax is unavailable.
"""
from __future__ import annotations

import warnings

import numpy as np
import jax


def save_pytree(path, tree, backend='npz', async_save=False):
    """Save any pytree of arrays (ColumnState, SWState, ...) to ``path``.

    :param backend: 'npz' (single file, synchronous) or 'orbax' (checkpoint
        directory; supports sharded arrays and ``async_save``).
    :param async_save: orbax only — return immediately while the write
        completes in the background (call :func:`wait_for_saves` or save/load
        again before reading the files externally).
    """
    if backend == 'orbax':
        if _orbax() is not None:
            return _orbax_save(path, tree, async_save=async_save)
        warnings.warn('orbax-checkpoint unavailable; falling back to npz')
    # one batched device->host pull (each separate sync is a ~25 ms tunnel
    # round trip on axon)
    leaves = jax.device_get(jax.tree_util.tree_leaves(tree))
    np.savez(path, n_leaves=len(leaves),
             **{f'leaf_{i}': np.asarray(l) for i, l in enumerate(leaves)})


def load_pytree(path, template, backend='npz'):
    """Restore a pytree saved by save_pytree into the structure (and dtypes)
    of ``template``."""
    if backend == 'orbax':
        if _orbax() is not None:
            return _orbax_load(path, template)
        warnings.warn('orbax-checkpoint unavailable; falling back to npz')
    path = str(path)
    if not path.endswith('.npz'):
        path += '.npz'
    data = np.load(path)
    n = int(data['n_leaves'])
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != n:
        raise ValueError(f'template has {len(t_leaves)} leaves, file has {n}')
    # read the dtype without gathering device-resident template leaves
    # (np.asarray(t) would device_get every leaf — a full transfer + tunnel
    # sync each on axon; r04 review finding)
    dt = lambda t: t.dtype if hasattr(t, 'dtype') else np.asarray(t).dtype
    leaves = [np.asarray(data[f'leaf_{i}'], dtype=dt(t))
              for i, t in enumerate(t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# orbax backend
# ---------------------------------------------------------------------------

_ORBAX = None
_PENDING = []


def _orbax():
    global _ORBAX
    if _ORBAX is None:
        try:
            import orbax.checkpoint as ocp
            _ORBAX = ocp
        except Exception:            # pragma: no cover - env without orbax
            _ORBAX = False
    return _ORBAX or None


def _abspath(path):
    import os
    return os.path.abspath(str(path))


def _orbax_save(path, tree, async_save=False):
    ocp = _orbax()
    # leaves only: treedef may contain non-serialisable static metadata, and
    # restore always goes through a template anyway (mirrors the npz format)
    leaves = jax.tree_util.tree_leaves(tree)
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        ckptr.save(_abspath(path), leaves, force=True)
        _PENDING.append(ckptr)
    else:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(_abspath(path), leaves, force=True)


def wait_for_saves():
    """Block until every pending async orbax save has committed."""
    while _PENDING:
        _PENDING.pop().wait_until_finished()


def _orbax_load(path, template):
    ocp = _orbax()
    wait_for_saves()
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    ckptr = ocp.PyTreeCheckpointer()
    # restore_args carry the template's dtype and (when present) sharding so
    # restored leaves land distributed exactly like the running state
    restore_args = []
    for t in t_leaves:
        t = jax.numpy.asarray(t) if not hasattr(t, 'dtype') else t
        sharding = getattr(t, 'sharding', None)
        if sharding is not None and hasattr(t, 'is_fully_addressable'):
            restore_args.append(ocp.ArrayRestoreArgs(
                dtype=t.dtype, sharding=sharding))
        else:                          # pragma: no cover - host-only leaves
            restore_args.append(ocp.RestoreArgs())
    restored = ckptr.restore(
        _abspath(path), restore_args=restore_args)
    if len(restored) != len(t_leaves):
        raise ValueError(f'template has {len(t_leaves)} leaves, checkpoint '
                         f'has {len(restored)}')
    # Device leaves: keep the restored jax.Array as-is — restore_args already
    # gave it the template's dtype and sharding, and round-tripping through
    # np.asarray would gather to host (and raise outright for non-fully-
    # addressable multi-host arrays).  Host leaves only go through numpy.
    leaves = []
    for r, t in zip(restored, t_leaves):
        if isinstance(t, jax.Array) and isinstance(r, jax.Array):
            if r.dtype != t.dtype or r.sharding != t.sharding:
                r = jax.device_put(r.astype(t.dtype), t.sharding)
            leaves.append(r)
        else:
            leaves.append(np.asarray(r).astype(np.asarray(t).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
