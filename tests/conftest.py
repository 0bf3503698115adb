"""Test configuration: run jax on a virtual 8-device CPU mesh with float64 enabled.

Multi-chip sharding is validated on the host mesh (no TPU needed); numerical oracles
(finite differences, analytic KKT solutions) use float64 for tight tolerances.

NOTE: the axon TPU plugin ignores ``JAX_PLATFORMS`` — ``JAX_PLATFORM_NAME`` and
``jax.config.update('jax_platforms', ...)`` must be used instead.
"""
import os

os.environ.setdefault('XLA_FLAGS',
                      os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORM_NAME'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
