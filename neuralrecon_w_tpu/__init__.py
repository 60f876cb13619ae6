"""neuralrecon_w_tpu — a TPU-native neural surface reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zju3dv/NeuralRecon-W ("Neural 3D Reconstruction in the Wild", SIGGRAPH 2022):
NeuS-style SDF volume rendering with NeRF-W appearance embeddings, accelerated
by a sparse SFM-derived voxel octree, trained on unconstrained phototourism
collections, with mesh extraction and geometry evaluation toolchains.

Design stance (not a port):
  * pure-functional models over parameter pytrees, jit/pjit everywhere,
  * fixed-shape ray/sample batches (XLA-friendly; masking instead of dropping),
  * sharding via jax.sharding.Mesh + shard_map/pjit with XLA collectives,
  * sparse voxel structure as morton-sorted sets + packed occupancy bitfields
    with a lax/Pallas DDA traversal (replaces kaolin SPC CUDA kernels),
  * host-side toolchains (marching tetrahedra, KD-tree eval, PLY I/O) in
    numpy/C++ instead of CUDA libraries.
"""

__version__ = "0.1.0"
