"""Backend-agnostic trace storage interfaces.

Mirrors nuts-rs ``src/storage/core.rs``: a ``StorageConfig`` creates a
``TraceStorage`` which accepts progressive writes and is finalized into a
backend-specific result.  The TPU sampler produces draws in *chunks* (one
device->host transfer per scan chunk, all chains at once) rather than one draw
at a time, so the write granularity here is a chunk: ``record_chunk`` receives
``{name: array[chains, draws_in_chunk, ...]}``.

Sparse event streams (divergence details, transformation updates; see
nuts-storable ``src/lib.rs:101-118``) are compacted host-side by the backends
from the dense per-draw arrays.
"""

from __future__ import annotations

import abc
from typing import Any, Mapping

import numpy as np


class TraceStorage(abc.ABC):
    """Progressive multi-chain trace writer."""

    @abc.abstractmethod
    def record_chunk(
        self,
        start_draw: int,
        stats: Mapping[str, np.ndarray],
        expanded: Mapping[str, np.ndarray],
        tuning: np.ndarray,
    ) -> None:
        """Append a chunk of draws.

        ``stats[name]`` has shape ``[chains, k, ...]``; ``tuning`` is a bool
        array of length ``k`` marking warmup draws.
        """

    @abc.abstractmethod
    def finalize(self) -> Any:
        """Close the trace and return the backend-specific result."""

    def flush(self) -> None:
        """Force buffered data out (nuts-rs ``ChainStorage::flush``)."""

    def inspect(self) -> Any:
        """Readable snapshot of the live trace (nuts-rs ``inspect``)."""
        return None


class StorageConfig(abc.ABC):
    @abc.abstractmethod
    def new_trace(self, settings, model, num_chains: int) -> TraceStorage:
        ...
