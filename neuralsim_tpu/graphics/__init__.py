"""Graphics utilities: isosurface extraction, mesh/pointcloud IO."""
from .marching import extract_mesh, export_mesh_ply, export_pcl_ply, marching_tets
