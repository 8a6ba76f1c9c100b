"""Math backend surface (reference ``Math`` trait, nuts-rs src/math/math.rs).

The reference isolates ~40 BLAS-1/SIMD operations behind a trait so the
sampler is hardware-agnostic; on TPU those operations are fused jnp
expressions inside the kernels.  This module re-exports the functions that
embody that layer so the mapping to SURVEY.md §2.3 is explicit:

* leapfrog half-kicks / drifts / geodesic rotation / ESH update:
  ``dynamics.hamiltonian`` (``leapfrog``, ``_esh_momentum_update``)
* the fused U-turn reductions (reference ``scalar_prods2/3``):
  ``dynamics.hamiltonian.is_turning`` and the matvec-form checks inside
  ``kernels.nuts._tree_body`` / ``kernels.nuts_pallas``
* low-rank transform matmuls (``apply_lowrank_transform``):
  ``transform.affine._lowrank_apply``
* running-variance updates (``array_update_variance`` family):
  ``adapt.mass_matrix``
"""

from ..adapt.mass_matrix import add_sample, new_running_variance
from ..dynamics.hamiltonian import (
    _esh_momentum_update as esh_momentum_update,
    is_turning,
    leapfrog,
    partial_momentum_refresh,
    sample_momentum,
)
from ..transform.affine import _lowrank_apply as apply_lowrank_transform

__all__ = [
    "add_sample",
    "apply_lowrank_transform",
    "esh_momentum_update",
    "is_turning",
    "leapfrog",
    "new_running_variance",
    "partial_momentum_refresh",
    "sample_momentum",
]
