from .coupling import CouplingFlowConfig, coupling_flow, diag_affine_flow
