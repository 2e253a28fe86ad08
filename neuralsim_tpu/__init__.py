"""neuralsim_tpu — a TPU-native neural rendering / sensor simulation framework.

A from-scratch JAX/XLA re-design of the capabilities of
PJLab-ADG/neuralsim (reference layout documented in /root/repo/SURVEY.md):
implicit-surface reconstruction (NeuS-family SDF fields, NeRF-family density
fields) for object-centric scenes, street scenes (StreetSurf) and multi-object
dynamic autonomous-driving scenes, with camera + LiDAR simulation, scene
editing and mesh extraction.

Design pillars (TPU-first, see SURVEY.md §7 + PERF.md measurements):
  * fixed-depth masked dense sample buffers instead of ragged CUDA "packs"
  * occupancy-grid march expressed as a fixed-step CDF sampler over static shapes
  * mixed dense/CP/hash grid encodings: CP levels are gather-free MXU tent
    matmuls; analytic interpolation jacobians replace FD taps for normals
  * one pjit program over a `jax.sharding.Mesh` instead of DDP/NCCL
"""

__version__ = "0.1.0"
