"""neuralsim_tpu — a TPU-native neural rendering / sensor simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PJLab-ADG/neuralsim (reference layout documented in /root/repo/SURVEY.md):
implicit-surface reconstruction (NeuS-family SDF fields, NeRF-family density
fields) for object-centric scenes, street scenes (StreetSurf) and multi-object
dynamic autonomous-driving scenes, with camera + LiDAR simulation, scene
editing and mesh extraction.

Design pillars (TPU-first, see SURVEY.md §7):
  * fixed-depth masked dense sample buffers instead of ragged CUDA "packs"
  * occupancy-grid culling expressed as masking over static shapes
  * hash-grid / permutohedral encodings as Pallas kernels with XLA fallbacks
  * one pjit program over a `jax.sharding.Mesh` instead of DDP/NCCL
"""

__version__ = "0.1.0"
