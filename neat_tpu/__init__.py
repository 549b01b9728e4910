"""neat_tpu — a TPU-native neural-attraction-field wireframe framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of cherubicXN/neat
("NEAT: Distilling 3D Wireframes from Neural Attraction Fields", CVPR 2024):
per-scene joint optimization of a VolSDF implicit surface, a neural attraction
field mapping surface points to 3D line segments, and a global junction set,
followed by distillation into an explicit 3D wireframe graph.

Design principles (TPU-first, not a port):
  * the whole training step — ray generation, error-bounded sampling, field
    evaluation, volume rendering, losses, assignment, and the optimizer
    update — is a single jitted pure function with static shapes;
  * the ray batch shards over a `jax.sharding.Mesh` data axis; parameters are
    replicated and gradients are `psum`-reduced by GSPMD;
  * the reference's mid-step CPU algorithms (scipy Hungarian, sklearn DBSCAN)
    are replaced by jax-native auction assignment and grid clustering, with a
    `pure_callback` parity mode;
  * offline preprocessing (the attraction-field rasterizer that replaces the
    reference's CUDA `_C.encodels`) is native C++ with a numpy oracle.

Subpackages:
  core       pure shape-polymorphic math: cameras, embedding, density, rendering
  fields     weight-normalized coordinate MLPs (SDF / radiance / attraction / junctions)
  sampling   uniform + error-bounded ray samplers (static-shape)
  model      the NEAT forward pass and losses
  assignment jax-native Hungarian/auction matching and clustering
  data       scene loaders, wireframe graphs, the attraction rasterizer
  train      config system, experiment runner, jitted train step, checkpoints
  parallel   mesh/sharding utilities
  wireframe  finalization: distilling the field into an explicit wireframe
  evaluation ABC / DTU / BMVS metric protocols
  viz        headless plotting and mesh export
"""

__version__ = "0.1.0"
