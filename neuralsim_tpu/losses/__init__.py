"""Training losses (TPU-native re-design of app/loss/, SURVEY.md §2.4)."""
from .recon import (get_recon_fn, reduce, safe_binary_cross_entropy,
                    safe_mse_loss)
from .core import (clearance_loss, color_lipschitz_loss, eikonal_loss,
                   lidar_loss, line_of_sight_loss, mask_entropy_loss,
                   mask_occupancy_loss, photometric_loss, ray_vw_entropy_loss,
                   sdf_curvature_loss, sparsity_loss, weight_reg_loss)
from .mono import erode_mask, mono_depth_loss, mono_normals_loss, solve_scale_shift
from .perceptual import perceptual_loss, s3im_loss
from .manhattan import cross_cr_dv_entropy_loss, manhattan_loss, road_normal_loss
from .conditional import deformation_loss
