"""Multi-chip execution: device meshes, ring brute force, sharded trees.

The reference suite is single-process shared-memory only (no MPI/NCCL/Gloo —
SURVEY.md §2.4); this package *introduces* the distributed tier, TPU-native:
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI.
"""
