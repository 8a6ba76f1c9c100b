from .affine import (
    AffineTransform,
    grad_to_transformed,
    identity_transform,
    init_diag_from_grad,
    set_diag,
    to_transformed,
    to_untransformed,
)
