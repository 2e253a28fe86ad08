from .transforms import (
    quat_to_rot,
    rot_to_quat,
    quat_mul,
    quat_normalize,
    quat_slerp,
    make_transform,
    inverse_transform,
    compose_transforms,
    apply_transform,
    apply_rotation,
    lerp,
)
from .common import (
    normalized_logistic_density,
    geometric_mean,
    safe_normalize,
    depth_fill_in_fast,
)
