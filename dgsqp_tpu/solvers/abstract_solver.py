"""Abstract solver contract (reference ``/root/reference/DGSQP/solvers/abstract_solver.py:9-67``).

Every controller/solver exposes ``initialize / solve / step / get_prediction``.  The
reference's ``install()`` hook copied generated ``.so`` files to ``~/.mpclab_controllers``;
the TPU-native equivalent of that artifact cache is jax's persistent compilation cache
(``jax_compilation_cache_dir``), so ``install()`` is a no-op kept for API parity.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List

from dgsqp_tpu.types import VehiclePrediction, VehicleState


class AbstractSolver(ABC):
    @abstractmethod
    def initialize(self, **kwargs):
        ...

    @abstractmethod
    def solve(self, *args, **kwargs):
        ...

    @abstractmethod
    def step(self, *args, **kwargs):
        ...

    def get_prediction(self) -> List[VehiclePrediction]:
        raise NotImplementedError

    def install(self):
        """No-op (XLA compilation cache replaces installed shared objects)."""
        return None


# Register the concrete solvers as virtual subclasses (they implement the contract without
# inheriting, mirroring how the framework keeps solver cores as standalone jittable classes).
def _register():
    from dgsqp_tpu.solvers.algames import ALGAMES
    from dgsqp_tpu.solvers.ca_ltv_mpc import CA_LTV_MPC
    from dgsqp_tpu.solvers.dgsqp import DGSQP
    from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
    from dgsqp_tpu.solvers.ibr import IBR
    from dgsqp_tpu.solvers.mcp import PATHMCP
    for cls in (ALGAMES, CA_LTV_MPC, DGSQP, DGSQPV2, IBR, PATHMCP):
        AbstractSolver.register(cls)


_register()
