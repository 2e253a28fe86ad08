from .segment import (
    exclusive_cumprod,
    alpha_to_vw,
    tau_to_alpha,
    masked_sum,
    masked_mean,
    sort_samples,
    merge_sorted_samples,
    merge_sorted_buffers,
    sample_pdf,
)
from .ray import ray_aabb_intersect, ray_sphere_intersect
