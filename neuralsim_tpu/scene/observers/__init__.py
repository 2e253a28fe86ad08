"""Observers: cameras + lidars (TPU re-design of app/resources/observers/)."""
from .cameras import (camera_filter_drawables, camera_get_all_rays,
                      camera_get_selected_rays)
from .lidars import (RisleyPrismLidarGenerator, SolidStateLidarGenerator,
                     SurroundLidarGenerator, lidar_rays_to_world,
                     make_lidar_generator)
