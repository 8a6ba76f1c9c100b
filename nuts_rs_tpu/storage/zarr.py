"""ArviZ-compatible Zarr trace storage.

Mirrors the reference's Zarr layout exactly (nuts-rs
``src/storage/zarr/sync_impl.rs:61-699`` + ``common.rs:37-340``) — it is the
compatibility surface:

* root attrs carry the serialized settings + sampler metadata
  (``sync_impl.rs:487-508``)
* groups ``posterior/``, ``sample_stats/``, ``warmup_posterior/``,
  ``warmup_sample_stats/`` with dims ``["chain", "draw", ...]``
* arrays chunked ``(1 chain, draw_chunk)`` with 100 draws per chunk by
  default (``sync_impl.rs:410``), streamed progressively
* sparse event arrays (divergences, transformation updates) resized to the
  maximum per-chain event count at finalize (``sync_impl.rs:662-685``)
* coordinate arrays stored as 1-D arrays (``store_coords``, common.rs:26-58)

Chunks are zstd-compressed Zarr v2 (see ``zarr_format.py``); the Blosc-Zstd
codec of the reference is not available here without native deps — the layout
and metadata are otherwise identical.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Mapping, Optional

import numpy as np

from .core import StorageConfig, TraceStorage
from .zarr_format import ZarrGroup, default_codec, is_url_path
from .zarr_format import _join as zarr_join

_POSTERIOR_KEYS = ("position",)


class _GroupBuffer:
    """Per-group draw buffer flushed as aligned (1, chunk_draws, ...) chunks."""

    def __init__(self, group: ZarrGroup, num_chains: int, total_draws: int,
                 chunk_draws: int, writer=None, codec=None, shuffle=False):
        self.group = group
        self.writer = writer
        self.codec = codec or default_codec()
        self.shuffle = shuffle
        self.num_chains = num_chains
        self.total = total_draws
        self.chunk_draws = chunk_draws
        self.arrays: Dict[str, Any] = {}
        self.pending: Dict[str, List[np.ndarray]] = {}
        self.written = 0   # draws fully written to chunk files
        self.buffered = 0  # draws in the pending buffers

    def declare(self, name, dtype, tail_shape, dims_tail):
        """Create the array upfront from reflected metadata (reference
        creates all arrays at trace init, sync_impl.rs:487-521)."""
        if name in self.arrays:
            return
        dtype = np.dtype(dtype)
        if dtype == np.int32:
            dtype = np.dtype(np.int64)
        tail_shape = tuple(tail_shape)
        self.arrays[name] = self.group.array(
            name,
            shape=(self.num_chains, self.total) + tail_shape,
            chunks=(1, self.chunk_draws) + tail_shape,
            dtype=dtype,
            dims=["chain", "draw"] + list(dims_tail),
            writer=self.writer,
            codec=self.codec,
            shuffle=self.shuffle,
        )
        self.pending[name] = []

    def _ensure_array(self, name, sample: np.ndarray, dims_tail):
        # Fallback for names outside the declared schema (e.g. a host
        # expansion the reflection probe could not call).
        self.declare(name, sample.dtype, sample.shape[2:], dims_tail)

    def append(self, name, data: np.ndarray, dims_tail=()):
        """data: [chains, k, ...]"""
        self._ensure_array(name, data, dims_tail)
        self.pending[name].append(np.asarray(data))

    def end_batch(self, k: int):
        self.buffered += k
        # Flush only chunk-aligned blocks (or the final partial chunk once the
        # stream is complete) — chunk files are written exactly once.
        while self._pending_rows() >= self.chunk_draws or (
                self._pending_rows() > 0
                and self.written + self._pending_rows() >= self.total):
            self._flush_one_chunk()

    def _pending_rows(self):
        # max over names: a declared array the runner never feeds (schema
        # reflected from a pre-fallback engine) must not wedge the flush.
        return max((sum(a.shape[1] for a in lists)
                    for lists in self.pending.values()), default=0)

    def _flush_one_chunk(self):
        chunk_idx = self.written // self.chunk_draws
        # Cap at the rows actually pending: an early-stopped run's final
        # partial chunk must not advance `written` past the real data (the
        # chunk file itself is NaN-padded to full size by write_chunk).
        take = min(self.chunk_draws - self.written % self.chunk_draws,
                   self.total - self.written,
                   self._pending_rows())
        for name, lists in self.pending.items():
            if not lists:  # declared upfront, never written: stays fill-value
                continue
            cat = np.concatenate(lists, axis=1) if len(lists) > 1 else lists[0]
            block, rest = cat[:, :take], cat[:, take:]
            for c in range(self.num_chains):
                self.arrays[name].write_chunk(
                    (c, chunk_idx) + (0,) * (block.ndim - 2), block[c:c + 1])
            self.pending[name] = [rest] if rest.shape[1] else []
        self.written += take
        self.buffered -= take

    def flush_remainder(self):
        while self._pending_rows() > 0:
            self._flush_one_chunk()

    def truncate_to_written(self):
        """Shrink the draw axis to the rows actually written — finalizing a
        run stopped before its draw budget (ConvergenceStop / pause+finalize)
        must not leave a fill-value tail behind the data."""
        if self.written >= self.total:
            return
        for arr in self.arrays.values():
            arr.resize((arr.shape[0], self.written) + tuple(arr.shape[2:]))
        self.total = self.written


class ZarrStorage(TraceStorage):
    def __init__(self, path: str, settings, model, num_chains: int,
                 chunk_draws: int = 100, async_writes: bool = True,
                 max_queued_writes: int = 64, writer_threads: int = 2,
                 codec: Optional[str] = None, shuffle: bool = False,
                 store_warmup: bool = True):
        self.path = path
        self._writer = None
        if async_writes and not is_url_path(path):
            # Native async writer (C++ worker pool with bounded queue); falls
            # back silently to synchronous Python writes if g++ is missing.
            # Object-store URLs (fsspec: memory://, s3://, ...) write
            # synchronously through fsspec — the C++ writer works on local
            # file descriptors.
            from ..native import AsyncTraceWriter, native_available

            if native_available():
                self._writer = AsyncTraceWriter(max_queued_writes,
                                                writer_threads)
        self.settings = settings
        self.model = model
        num_tune = getattr(settings, "num_tune", 0)
        num_draws = getattr(settings, "num_draws", 0)
        self.num_tune = num_tune
        self.num_draws = num_draws
        self.num_chains = num_chains

        attrs = {
            "sampler": getattr(settings, "sampler_name", "nuts"),
            "adaptation": getattr(settings, "adaptation_name", "diag"),
            "settings": _settings_json(settings),
            "model": getattr(model, "name", "model"),
            "framework": "nuts_rs_tpu",
        }
        self.root = ZarrGroup(path, attrs)
        mk = lambda name, total: _GroupBuffer(
            self.root.group(name), num_chains, total, chunk_draws,
            writer=self._writer, codec=codec, shuffle=shuffle)
        self.store_warmup = store_warmup
        self.groups = {
            ("posterior", False): mk("posterior", num_draws),
            ("sample_stats", False): mk("sample_stats", num_draws),
        }
        if store_warmup:
            # store_warmup=False: no warmup groups exist at all (reference
            # async_impl.rs:660-668 — "only post-warmup samples are stored")
            self.groups[("posterior", True)] = mk("warmup_posterior",
                                                  num_tune)
            self.groups[("sample_stats", True)] = mk("warmup_sample_stats",
                                                     num_tune)
        self._write_coords()
        # Sparse event accumulation (compacted at finalize).
        self._events: Dict[str, List[dict]] = {"divergence": [],
                                               "transformation_update": []}
        self._last_transform_id = np.full(num_chains, -(10 ** 9), np.int64)

    def _write_coords(self):
        coords = dict(getattr(self.model, "coords", None) or {})
        for name, values in coords.items():
            arr = np.asarray(values)
            if arr.dtype.kind == "O":
                # String coords (nuts-rs src/storage/zarr/common.rs:26-58)
                # as fixed-length unicode arrays.
                arr = arr.astype(str)
            keys = (("posterior", "warmup_posterior") if self.store_warmup
                    else ("posterior",))
            for key in keys:
                ZarrGroup(zarr_join(self.path, key)).write_full_array(
                    name, arr, dims=[name])

    wants_schema = True  # ask the sampler for upfront reflection

    def declare_schema(self, schema):
        """Create the COMPLETE array hierarchy before the first draw
        (reference: schema reflection src/sampler.rs:73-162 + upfront array
        creation src/storage/zarr/sync_impl.rs:487-521).  A reader attaching
        mid-run (``inspect``) sees every array from draw 0; stats that never
        fire still declare themselves; sparse event arrays start at event
        count 0 and are resized at finalize (sync_impl.rs:662-685)."""
        group_of = {
            "posterior": self.groups[("posterior", False)],
            "sample_stats": self.groups[("sample_stats", False)],
        }
        if self.store_warmup:
            group_of["warmup_posterior"] = self.groups[("posterior", True)]
            group_of["warmup_sample_stats"] = self.groups[
                ("sample_stats", True)]
        for gname, buf in group_of.items():
            for name, e in (schema.get(gname) or {}).items():
                buf.declare(name, e["dtype"], e["shape"],
                            e.get("dims") or [])
        stats_group = ZarrGroup(zarr_join(self.path, "sample_stats"))
        for ev_name, fields in (schema.get("events") or {}).items():
            for key, e in fields.items():
                dt = np.dtype(e["dtype"])
                if dt == np.int32:
                    dt = np.dtype(np.int64)
                # Event-count 0 placeholder; finalize resizes/rewrites with
                # the real events (or leaves it empty when none fired).
                stats_group.array(
                    f"{ev_name}_{key}",
                    shape=(self.num_chains, 0) + tuple(e["shape"]),
                    chunks=(1, 1) + tuple(e["shape"]),
                    dtype=dt,
                    dims=["chain", ev_name] + (e.get("dims") or []),
                    compress=False)

    def _dims_for(self, name, sample):
        from .core import dims_for_tail

        return dims_for_tail(self.model, name, sample.shape[2:])

    def record_chunk(self, start_draw, stats, expanded, tuning):
        tuning = np.asarray(tuning)
        k = len(tuning)
        segments = []
        # split the chunk at the warmup/posterior boundary
        if tuning.any() and (~tuning).any():
            split = int(tuning.sum())
            segments = [(slice(0, split), True), (slice(split, k), False)]
        else:
            segments = [(slice(0, k), bool(tuning[0]) if k else False)]

        ids = stats.get("transformation_index")
        if ids is not None:
            ids = np.asarray(ids)
        for sl, is_warm in segments:
            n = sl.stop - sl.start
            if n == 0 or (is_warm and not self.store_warmup):
                continue
            post = self.groups[("posterior", is_warm)]
            ss = self.groups[("sample_stats", is_warm)]
            for name, data in stats.items():
                data = np.asarray(data)[:, sl]
                if name in _POSTERIOR_KEYS:
                    post.append(name, data, self._dims_for(name, data))
                else:
                    ss.append(name, data, self._dims_for(name, data))
            for name, data in expanded.items():
                post.append(name, np.asarray(data)[:, sl],
                            self._dims_for(name, np.asarray(data)))
            post.end_batch(n)
            ss.end_batch(n)

        # events
        div = np.asarray(stats["diverging"])
        for c in range(self.num_chains):
            for j in np.nonzero(div[c])[0]:
                ev = {"chain": c, "draw": start_draw + int(j)}
                for key in ("divergence_start", "divergence_end",
                            "divergence_start_gradient",
                            "divergence_start_momentum",
                            "divergence_momentum",
                            "divergence_energy_error",
                            "divergence_reason"):
                    if key in stats:
                        ev[key] = np.asarray(stats[key])[c, j]
                self._events["divergence"].append(ev)
            if ids is not None:
                prev = self._last_transform_id[c]
                row = ids[c]
                for j in range(len(row)):
                    if row[j] != prev:
                        ev = {"chain": c, "draw": start_draw + int(j),
                              "transformation_update_id": int(row[j])}
                        if "mass_matrix_inv" in stats:
                            ev["mass_matrix_inv"] = np.asarray(
                                stats["mass_matrix_inv"])[c, j]
                            ev["transformation_mu"] = np.asarray(
                                stats["transformation_mu"])[c, j]
                        if "mass_matrix_eigvals" in stats:
                            ev["mass_matrix_eigvals"] = np.asarray(
                                stats["mass_matrix_eigvals"])[c, j]
                            ev["num_eigenvalues"] = np.asarray(
                                stats["num_eigenvalues"])[c, j]
                        self._events["transformation_update"].append(ev)
                    prev = row[j]
                self._last_transform_id[c] = prev

    def _write_events(self):
        for ev_name, events in self._events.items():
            if not events:
                continue
            group = ZarrGroup(zarr_join(self.path, "sample_stats"))
            # ragged -> (chain, event) arrays padded to the max event count
            per_chain: List[List[dict]] = [[] for _ in range(self.num_chains)]
            for ev in events:
                per_chain[ev["chain"]].append(ev)
            max_n = max(len(l) for l in per_chain)
            keys = [k for k in events[0] if k != "chain"]
            for key in keys:
                sample = np.asarray(events[0][key])
                shape = (self.num_chains, max_n) + sample.shape
                dtype = sample.dtype if sample.dtype.kind == "f" else np.int64
                out = np.full(shape, np.nan if np.dtype(dtype).kind == "f"
                              else -1, dtype=dtype)
                for c, evs in enumerate(per_chain):
                    for i, ev in enumerate(evs):
                        out[c, i] = ev[key]
                dims = ["chain", ev_name] + (
                    ["unconstrained_parameter"] if sample.ndim else [])
                group.write_full_array(f"{ev_name}_{key}", out, dims=dims)

    def finalize(self):
        for buf in self.groups.values():
            buf.flush_remainder()
            buf.truncate_to_written()
        self._write_events()
        if self._writer is not None:
            self._writer.close()
            self._writer = None
        return self.path

    def flush(self):
        # Only full chunks can be forced out mid-run (each chunk file is
        # written once); partial tails stay buffered until finalize.
        for buf in self.groups.values():
            buf.end_batch(0)
        if self._writer is not None:
            self._writer.flush()

    def inspect(self):
        """Readable snapshot of the live trace (nuts-rs ``ChainStorage::
        inspect``, src/storage/core.rs:28-33): flushes full chunks, drains the
        async writer, and reads back every array written so far, trimmed to
        the draws actually on disk.  Returns ``{group: {name: array}}``."""
        from .zarr_format import read_array

        self.flush()
        snapshot: Dict[str, Dict[str, np.ndarray]] = {}
        for (kind, is_warm), buf in self.groups.items():
            gname = ("warmup_" if is_warm else "") + kind
            out: Dict[str, np.ndarray] = {}
            for name in buf.arrays:
                arr = read_array(zarr_join(self.path, gname, name))
                out[name] = arr[:, :buf.written]
            snapshot[gname] = out
        return snapshot


def _settings_json(settings) -> str:
    def enc(obj):
        if dataclasses.is_dataclass(obj):
            return {f.name: enc(getattr(obj, f.name))
                    for f in dataclasses.fields(obj)}
        if isinstance(obj, (list, tuple)):
            return [enc(x) for x in obj]
        if hasattr(obj, "value"):
            return obj.value
        if callable(obj):
            return repr(obj)
        return obj

    try:
        return json.dumps(enc(settings), default=str)
    except TypeError:
        return repr(settings)


@dataclasses.dataclass
class ZarrConfig(StorageConfig):
    """nuts-rs ``ZarrConfig`` equivalent: write the trace to ``path``.

    ``async_writes`` routes chunk compression + I/O through the native C++
    worker pool with ``max_queued_writes`` backpressure (the reference's
    async zarr backend, ``src/storage/zarr/async_impl.rs``)."""

    path: str
    chunk_draws: int = 100
    async_writes: bool = True
    max_queued_writes: int = 64
    writer_threads: int = 2
    # Chunk codec: "zstd" / "zlib" / None (default: zstd when the optional
    # ``zstandard`` package is importable, else zlib — the reference ships
    # Blosc-Zstd, src/storage/zarr/common.rs:310-331; plain numcodecs-"zstd"
    # here is ~2x faster compression than zlib at similar ratio, but it must
    # not be a hard dependency: the read path decompresses in Python).
    codec: Optional[str] = None
    # Blosc-style byte shuffle before compression (the reference's Blosc
    # wrapper always shuffles, src/storage/zarr/common.rs:310-331): groups
    # the slowly-varying exponent/sign bytes of float draws, improving the
    # ratio on smooth chains.  Declared as the standard numcodecs "shuffle"
    # filter, so zarr-python/ArviZ read it transparently.  Off by default:
    # the Python-side byte transpose costs ~1 GB/s of host CPU per writer.
    shuffle: bool = False
    # Skip the warmup groups entirely — only post-warmup samples are stored
    # (reference ``ZarrAsyncConfig::store_warmup``, src/storage/zarr/
    # async_impl.rs:660-668).  The sampler-level ``Sampler(store_warmup=
    # False)`` knob additionally drops the warmup payload at the DEVICE
    # boundary (no D2H transfer at all); this storage-level flag matches
    # the reference API and works with any sampler configuration.
    store_warmup: bool = True

    def new_trace(self, settings, model, num_chains):
        return ZarrStorage(self.path, settings, model, num_chains,
                           self.chunk_draws, async_writes=self.async_writes,
                           max_queued_writes=self.max_queued_writes,
                           writer_threads=self.writer_threads,
                           codec=self.codec, shuffle=self.shuffle,
                           store_warmup=self.store_warmup)
