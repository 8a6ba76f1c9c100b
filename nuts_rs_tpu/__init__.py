"""nuts_rs_tpu — a TPU-native NUTS/HMC inference engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
pymc-devs/nuts-rs (reference mounted at /root/reference): NUTS with diagonal /
low-rank / normalizing-flow mass-matrix adaptation, MCLMC, dual-averaging and
Adam step-size adaptation, multi-chain sampling vmapped within a chip and
sharded over device meshes, and progressive ArviZ-compatible trace storage.
"""

from .adapt.schedule import AdaptScheduleOptions
from .adapt.step_size import (
    AdamOptions,
    DualAverageOptions,
    StepSizeMethod,
    StepSizeSettings,
)
from .dynamics.hamiltonian import KineticKind
from .kernels.nuts import NutsOptions
from .models.model import Model
from .adapt.flow import FlowAdaptSettings
from .adapt.low_rank import LowRankSettings
from .sampler import (
    ChainFailedError,
    ChainProgress,
    ConvergenceStop,
    DiagMclmcSettings,
    DiagNutsSettings,
    FlowMclmcSettings,
    FlowNutsSettings,
    LowRankMclmcSettings,
    LowRankNutsSettings,
    MclmcSettings,
    MclmcTrajectoryKind,
    NutsSettings,
    Sampler,
    sample,
    sample_sequentially,
    schema,
)
from .diagnostics import ess_bulk, ess_tail, split_rhat, summary
from .storage.arrow import ArrowConfig
from .storage.csv import CsvConfig
from .storage.memory import MemoryConfig, Trace
from .storage.zarr import ZarrConfig
from .parallel.mesh import make_mesh

__version__ = "0.1.0"

__all__ = [
    "AdamOptions",
    "ArrowConfig",
    "CsvConfig",
    "ZarrConfig",
    "make_mesh",
    "AdaptScheduleOptions",
    "ChainFailedError",
    "ChainProgress",
    "DiagMclmcSettings",
    "DiagNutsSettings",
    "DualAverageOptions",
    "FlowAdaptSettings",
    "FlowMclmcSettings",
    "FlowNutsSettings",
    "KineticKind",
    "LowRankMclmcSettings",
    "LowRankNutsSettings",
    "LowRankSettings",
    "MclmcSettings",
    "MclmcTrajectoryKind",
    "MemoryConfig",
    "Model",
    "ConvergenceStop",
    "NutsOptions",
    "NutsSettings",
    "Sampler",
    "StepSizeMethod",
    "StepSizeSettings",
    "Trace",
    "ess_bulk",
    "ess_tail",
    "split_rhat",
    "summary",
    "sample",
    "sample_sequentially",
]
