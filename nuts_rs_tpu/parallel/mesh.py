"""Mesh construction and chain-axis sharding helpers.

Chains are the embarrassingly-parallel axis (the reference's rayon threads,
``src/sampler.rs:1286-1326``); on TPU they shard over a 1-D ``Mesh`` axis
named ``"chains"`` with ``shard_map``, so each chip runs a vmapped block of
chains and adaptation pooling (see ``collectives.py``) rides ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def chain_specs(tree: Any) -> Any:
    """PartitionSpecs for a chain-state pytree: leading-axis sharding for
    per-chain leaves, replicated for scalars."""

    def spec(x):
        if jnp.ndim(x) >= 1:
            return P(CHAIN_AXIS)
        return P()

    return jax.tree.map(spec, tree)


def shard_chain_state(state: Any, mesh: Mesh) -> Any:
    """Place a chain-state pytree on the mesh, chains axis sharded."""

    def put(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(put, state, chain_specs(state))


def replicated_specs(tree: Any) -> Any:
    return jax.tree.map(lambda _: P(), tree)
