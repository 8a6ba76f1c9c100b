from .hamiltonian import (
    KineticKind,
    initialize_trajectory,
    is_turning,
    leapfrog,
    partial_momentum_refresh,
    sample_momentum,
)
from .point import Point, point_where
