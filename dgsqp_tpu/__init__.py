"""dgsqp_tpu: a TPU-native dynamic-game SQP framework.

Solves open-loop generalized Nash equilibria of N-player dynamic games (multi-vehicle racing)
with jit-compiled XLA solver loops, jax autodiff in place of CasADi symbolics, a batched
primal-dual interior-point QP kernel in place of OSQP, and vmap/pjit sharding of thousands of
concurrent game solves across TPU meshes.  Capability parity target: zhu-edward/DGSQP.
"""
__version__ = '0.1.0'
