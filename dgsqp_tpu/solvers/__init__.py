from dgsqp_tpu.solvers.abstract_solver import AbstractSolver
from dgsqp_tpu.solvers.algames import ALGAMES
from dgsqp_tpu.solvers.ca_ltv_mpc import CA_LTV_MPC
from dgsqp_tpu.solvers.dgsqp import DGSQP
from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox
from dgsqp_tpu.solvers.game_problem import GameProblem
from dgsqp_tpu.solvers.ibr import IBR
from dgsqp_tpu.solvers.mcp import PATHMCP, PATHMCPFrenetApprox
from dgsqp_tpu.solvers.pid import PID, PIDLaneFollower
from dgsqp_tpu.solvers.qp import solve_qp, solve_qp_batch, solve_eq_qp, solve_elastic_qp
from dgsqp_tpu.solvers.solver_types import (ALGAMESParams, CALTVMPCParams, DGSQPParams,
                                            DGSQPV2Params, IBRParams, PATHMCPParams,
                                            PIDParams)
