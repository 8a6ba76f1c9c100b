"""Checkpoint / resume for the sampler device state.

The reference cannot restart from a trace (SURVEY.md §5: no checkpointing —
only flush/inspect/pause).  Here the whole sampler state is one pytree, so
checkpointing is a flatten + savez: positions, transforms, adaptation
estimators, step-size state, and PRNG keys all round-trip exactly, making a
resumed run bit-identical to an uninterrupted one.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_key(x) -> bool:
    return isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key)


def save_state(path: str, state: Any, next_draw: int) -> None:
    leaves = jax.tree.leaves(state)
    arrays = {}
    key_flags = []
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(leaf))
            key_flags.append(i)
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    arrays["__key_leaves__"] = np.asarray(key_flags, np.int64)
    arrays["__next_draw__"] = np.asarray(next_draw, np.int64)
    arrays["__num_leaves__"] = np.asarray(len(leaves), np.int64)
    np.savez(path, **arrays)


def load_state(path: str, like: Any) -> Tuple[Any, int]:
    """Restore a state pytree saved by :func:`save_state`.

    ``like`` provides the tree structure (and PRNG key impl); typically the
    freshly initialized state of a Sampler built with the same settings.
    """
    with np.load(path) as data:
        n = int(data["__num_leaves__"])
        key_leaves = set(int(i) for i in data["__key_leaves__"])
        raw = [data[f"leaf_{i}"] for i in range(n)]
        next_draw = int(data["__next_draw__"])

    like_leaves, treedef = jax.tree.flatten(like)
    if len(like_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves, expected {len(like_leaves)} — "
            "was it written with different settings?")
    leaves = []
    for i, (arr, ref) in enumerate(zip(raw, like_leaves)):
        if i in key_leaves:
            leaf = jax.random.wrap_key_data(jnp.asarray(arr))
        else:
            leaf = jnp.asarray(arr, getattr(ref, "dtype", None))
        if jnp.shape(leaf) != jnp.shape(ref):
            raise ValueError(
                f"checkpoint leaf {i} has shape {jnp.shape(leaf)}, expected "
                f"{jnp.shape(ref)} — different model/chain configuration?")
        leaves.append(leaf)
    return jax.tree.unflatten(treedef, leaves), next_draw
