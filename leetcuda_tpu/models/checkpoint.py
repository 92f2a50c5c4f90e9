"""Checkpoint / resume — orbax-backed train & serve state persistence.

The reference has no model state at all (SURVEY.md §5: "Checkpoint / resume:
absent"); a training/serving framework needs it. Orbax handles sharded arrays
natively: under a mesh, restore places each shard directly on its device when
given a sharding-annotated template (zero host gather on save, zero broadcast
on restore).
"""

from __future__ import annotations

import pathlib

import jax


def save_checkpoint(path, params, opt_state=None, step: int = 0):
    """Write {params, opt_state, step} atomically to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"params": params,
                          "opt_state": opt_state,
                          "step": step},
                   force=True)


def restore_checkpoint(path, like=None):
    """Restore (params, opt_state, step).

    ``like``: a (params, opt_state) pytree with the target STRUCTURE (e.g. a
    fresh init) — orbax serializes namedtuples (optax states) as plain dicts,
    so the original container types are rebuilt by unflattening the restored
    leaves into ``like``'s treedef. When ``like`` carries shardings
    (device_put arrays under a mesh), restored leaves adopt them."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    params, opt_state = tree["params"], tree["opt_state"]
    if like is not None:
        like_params, like_opt = like

        def rebuild(raw, template):
            leaves = jax.tree_util.tree_leaves(raw)
            treedef = jax.tree_util.tree_structure(template)
            out = jax.tree_util.tree_unflatten(treedef, leaves)
            return jax.tree_util.tree_map(
                lambda t, x: (jax.device_put(x, t.sharding)
                              if hasattr(t, "sharding") else x),
                template, out)

        params = rebuild(params, like_params)
        if like_opt is not None and opt_state is not None:
            opt_state = rebuild(opt_state, like_opt)
    return params, opt_state, tree["step"]
