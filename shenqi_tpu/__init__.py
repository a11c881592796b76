"""shenqi_tpu — a TPU-native cosmological TreePM + SPH simulation framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of
MP-Gadget/shenqi (the reference C++/CUDA/MPI code): long-range particle-mesh
gravity via sharded FFTs, short-range Barnes-Hut tree gravity via vectorized
octree traversal, SPH hydrodynamics, galaxy-formation subgrid physics,
friends-of-friends halo finding, Zel'dovich initial conditions, and
bigfile-compatible snapshot I/O.

Design principles (TPU-first, not a port):
  * structure-of-arrays jnp state instead of AoS particle structs
  * fixed-shape, masked, Morton-sorted buffers instead of pointer octrees
  * jax.sharding over a device Mesh instead of MPI domain decomposition
  * XLA collectives (psum/all_to_all/ppermute) instead of MPI_Alltoallv
  * host-side float64 numpy/scipy for setup tables; on-device float32
"""

__version__ = "0.1.0"
