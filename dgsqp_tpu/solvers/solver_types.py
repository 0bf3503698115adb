"""Solver parameter dataclasses.

Mirrors the reference config surface (``/root/reference/DGSQP/solvers/solver_types.py:7-256``)
field-for-field where meaningful; CasADi/codegen-specific knobs (``qp_interface``,
``code_gen``, ``jit``, ``opt_flag``, ``solver_dir`` ...) are retained as accepted-but-inert
fields so reference scripts port unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from dgsqp_tpu.types import PythonMsg


@dataclass
class ControllerConfig(PythonMsg):
    dt: float = 0.1


@dataclass
class PIDParams(ControllerConfig):
    Kp: float = 2.0
    Ki: float = 0.0
    Kd: float = 0.0
    int_e_max: float = 100.0
    int_e_min: float = -100.0
    u_max: Optional[float] = None
    u_min: Optional[float] = None
    du_max: Optional[float] = None
    du_min: Optional[float] = None
    u_ref: float = 0.0
    x_ref: float = 0.0
    noise: bool = False
    noise_max: float = 0.1
    noise_min: float = -0.1
    periodic_disturbance: bool = False
    disturbance_amplitude: float = 0.1
    disturbance_period: float = 1.0

    def default_speed_params(self):
        self.Kp, self.Ki, self.Kd = 1.0, 0.0, 0.0
        self.u_min, self.u_max = -2.0, 2.0
        self.du_min, self.du_max = -10 * self.dt, 10 * self.dt
        self.noise = False

    def default_steer_params(self):
        self.Kp, self.Ki, self.Kd = 1.0, 0.0005 / self.dt, 0.0
        self.u_min, self.u_max = -0.35, 0.35
        self.du_min, self.du_max = -4 * self.dt, 4 * self.dt
        self.noise = False


@dataclass
class DGSQPParams(ControllerConfig):
    N: int = 10

    beta: float = 0.25           # Armijo slope fraction
    tau: float = 0.5             # backtracking factor

    p_tol: float = 1e-3
    d_tol: float = 1e-3

    reg: float = 1e-3
    line_search_iters: int = 50
    nonmono_ls: bool = False
    sqp_iters: int = 50
    merit_function: str = 'stat_l1'

    verbose: bool = False
    save_iter_data: bool = True

    solver_name: str = 'DGSQP'
    time_limit: Optional[float] = None
    qp_interface: str = 'jax'            # inert (single TPU-native QP backend)
    qp_solver: str = 'ipm'               # inert
    conv_approx: bool = True
    hessian_approximation: str = 'none'

    code_gen: bool = False               # inert
    jit: bool = False                    # inert
    opt_flag: str = 'O0'                 # inert
    enable_jacobians: bool = True        # inert
    solver_dir: Optional[str] = None     # inert
    so_name: Optional[str] = None        # inert
    debug_plot: bool = False
    pause_on_plot: bool = False
    local_pos: bool = False

    # TPU-native extensions
    qp_tol: float = 1e-8
    qp_max_iters: int = 50
    # Deterministic analog of the reference's wall-clock ``time_limit`` escape
    # (``DGSQP.py:470-474``): a game whose cumulative QP-solve count exceeds this budget
    # stops with status 'time_limit' (not converged).  None = unlimited.  In batched
    # lockstep execution this bounds how long pathological stragglers can hold the batch.
    qp_solves_limit: Optional[int] = None
    # stagnation escape: terminate a game as 'stalled' after this many consecutive
    # iterations without a 1% stationarity improvement (None = off).  Deterministic
    # analog of the reference's wall-clock time_limit for plateaued instances.
    stall_its: Optional[int] = None
    # IPM warm start across SQP rounds (flat execution only): seed each round's QP
    # with the previous round's duals/slacks, shifted to the central path.  SQP
    # subproblems change slowly, so this typically saves ~half the IPM iterations.
    qp_warm_start: bool = False
    # game-Hessian assembly: 'ad' = forward-over-reverse AD sweep; 'dp' = stagewise
    # per-stage Jacobians/Hessians + sensitivity-stack GEMMs (the reference's DP
    # recursion structure, DGSQP.py:679-727/829-877, recast as batched matmuls).
    hessian_mode: str = 'ad'
    # PDAS polish iterations in the QP kernel (each is a QR-factored KKT solve)
    qp_polish_iters: int = 4
    # Gondzio centrality correctors per IPM iteration (0 = plain Mehrotra): each
    # reuses the iteration's factorization (one back-substitution + matvecs) to
    # lengthen the step, cutting total IPM iterations — i.e. whole normal-matrix
    # GEMMs + Cholesky factorizations.  Solution-identical at convergence.
    qp_correctors: int = 0
    # exploit the input-box rows of G inside the QP kernel: single-nonzero rows
    # contribute a diagonal update to the IPM normal matrix instead of GEMM rows
    # (~40% of the chicane QP's rows are input bounds), cutting the dominant
    # per-iteration (G' D G) FLOPs by the box-row fraction.  Decision-identical.
    qp_box_split: bool = False
    # Hessian PSD projection: 'eigh' = exact eigenvalue clipping (reference semantics);
    # 'ns' = Newton-Schulz matmul-only approximation (MXU-friendly, ~1e-3 accuracy).
    conv_method: str = 'eigh'
    # 'ns' accuracy knobs: sign-iteration count, the relative diagonal safety
    # shift, and symmetric Jacobi pre-equilibration.  Problems with mixed cost
    # scales (the MPCC game) need the tighter (20, 1e-4, equilibrated) setting —
    # see nearest_pd_ns
    conv_ns_iters: int = 14
    conv_ns_safety: float = 1e-3
    conv_ns_equil: bool = False
    # Lockstep execution model: 'auto' uses the flattened SQP+watchdog round machine
    # (one evaluate + QP + line search per round, per-game mode state) whenever the
    # watchdog is on and Hessians are exact; 'nested'/'flat' force a model.
    execution: str = 'auto'


@dataclass
class DGSQPV2Params(DGSQPParams):
    """Journal-algorithm (v2) parameters
    (reference ``solver_types.py:130-174`` DGSQPV2Params; defaults match)."""
    p_tol: float = 1e-4
    d_tol: float = 1e-4
    reg: float = 1e2
    reg_decay: float = 0.95
    nms: bool = True
    nms_frequency: int = 5
    nms_memory_size: int = 3
    sqp_iters: int = 500
    merit_parameter: Optional[float] = None   # None => adaptive
    merit_decrease: float = 0.01              # sigma
    merit_decrease_condition: str = 'armijo'  # or 'max'
    approximation_eval: str = 'always'        # 'once' (frenet-approx variant)
    delta_decay: float = 0.95                 # gamma: d-step trust shrink factor
    # delta init = factor * ||first (du, dl)|| (reference hardcodes 20,
    # DGSQP_v2.py:212,471).  factor <= 0 disables the unconditional first d-step so
    # EVERY iteration is merit-checked — the safe setting for small-reg schedules
    # (large reg is the reference's only protection against accepting a garbage
    # first step; see docs/approx_convergence.md)
    nms_initial_step_size_factor: float = 20.0
    # relative KKT tolerance: scale the stationarity/complementarity tests by
    # max(1, ||q||_inf) at the current iterate (the standard eps_rel semantics of the
    # reference's own QP backend, OSQP).  Off by default (reference tests absolute
    # residuals, DGSQP_v2.py:393-398); the f32 TPU bench of the approximate (MPCC)
    # game needs it because that game's gradient scale is O(q_l)=O(1e3), putting an
    # ABSOLUTE 1e-3 stationarity below the f32 noise floor while the iterate is
    # already ~1e-5 converged in relative terms (docs/approx_convergence.md)
    conv_scaled_stat: bool = False
    save_qp_data: bool = False


@dataclass
class ALGAMESParams(ControllerConfig):
    N: int = 10

    rho: float = 1.0
    gamma: float = 10.0
    rho_max: float = 1e7
    lam_max: float = 1e7

    beta: float = 0.25
    tau: float = 0.5

    q_reg: float = 1e-2
    u_reg: float = 1e-2
    line_search_tol: float = 1e-6
    newton_step_tol: float = 1e-6
    ineq_tol: float = 1e-3
    eq_tol: float = 1e-3
    opt_tol: float = 1e-3

    dynamics_hessians: bool = False

    outer_iters: int = 50
    line_search_iters: int = 50
    newton_iters: int = 50

    verbose: bool = False
    solver_name: str = 'ALGAMES'

    debug: bool = False
    debug_plot: bool = False
    pause_on_plot: bool = False
    local_pos: bool = False


@dataclass
class IBRParams(ControllerConfig):
    N: int = 10
    ibr_iters: int = 1
    use_ps: bool = False
    p_tol: float = 1e-3
    d_tol: float = 1e-3
    line_search_iters: int = 50
    verbose: bool = False
    solver_name: str = 'IBR'
    debug_plot: bool = False
    pause_on_plot: bool = False
    # inner best-response SQP controls
    br_sqp_iters: int = 50
    br_reg: float = 1e-3


@dataclass
class PATHMCPParams(ControllerConfig):
    """Parameters for the semismooth-Newton MCP baseline (stands in for Julia PATH;
    reference ``solver_types.py`` PATHMCPParams)."""
    N: int = 10
    max_iters: int = 200
    tol: float = 1e-8
    verbose: bool = False
    solver_name: str = 'MCP'
    line_search_iters: int = 24
    beta: float = 1e-4
    tau: float = 0.5
    reg: float = 1e-6              # initial Levenberg shift (adapted in-loop)
    # --- PATH-strength globalization (see solvers/mcp.py module docstring)
    # A/B-tuned on the chicane N=15 suite (scripts/mcp_tune.py): lam 0.8 + window 16
    # converge 27/32 vs 22/32 for (0.95, 8); restarts are the largest single lever
    # (7/32 without them)
    fb_lambda: float = 0.8         # penalized-FB weight (1.0 = plain FB)
    nonmono_memory: int = 16       # nonmonotone Armijo reference window
    stall_its: int = 6             # iterations without material progress -> restart
    max_restarts: int = 4          # proximal-perturbation restart budget
    pert0: float = 1e-2            # first restart's proximal perturbation
    pert_decay: float = 0.5        # per-iteration perturbation decay
    # --- smoothing continuation: start the FB function at eps0 (the smoothed root set
    # is the central path l*(-C)=eps^2/2) and shrink toward machine-eps as the sharp
    # residual falls — the interior-point homotopy that carries far-from-solution
    # iterates past the FB merit's local minima (N=25 stalled at res~5 without it)
    eps0: float = 1e-1
    eps_decay: float = 0.7         # per-accepted-step multiplicative shrink
    eps_frac: float = 0.05         # eps also capped at eps_frac * sharp residual
    # --- method selection: 'fbnewton' (default) = smoothed FB semismooth Newton —
    # one linear solve per iteration, fast to compile, strong at small/medium horizons
    # (27/32 on chicane N=15); 'josephy' solves the linearized MCP (an indefinite
    # QP / affine VI — PATH's subproblem model) exactly per iteration via the IPM
    # kernel; 'hybrid' = josephy phase + fbnewton polish, the PATH-strength config
    # used by the oracle MC runs (scripts/monte_carlo_main.py) — fbnewton alone
    # creeps at N=25 (0/32, res ~ 5) where josephy reaches res ~ 0.08 median; the
    # hybrid's compile cost (two while-loops, one embedding the QP kernel) is why it
    # is not the dataclass default.
    method: str = 'fbnewton'
    qp_tol: Optional[float] = None         # None -> dtype default (1e-8 / 3e-7)
    qp_max_iters: int = 50
    jos_gamma: float = 2.0         # residual-watchdog growth tolerance (josephy)


@dataclass
class CALTVMPCParams(ControllerConfig):
    N: int = 10
    qp_iters: int = 2
    damping: float = 0.75

    state_scaling: Optional[list] = None
    input_scaling: Optional[list] = None

    soft_state_bound_idxs: Optional[list] = None
    soft_state_bound_quad: Optional[list] = None
    soft_state_bound_lin: Optional[list] = None

    soft_constraint_idxs: Optional[list] = None
    soft_constraint_quad: Optional[list] = None
    soft_constraint_lin: Optional[list] = None

    wrapped_state_idxs: Optional[list] = None
    wrapped_state_periods: Optional[list] = None

    delay: Optional[list] = None
    time_varying: bool = False

    verbose: bool = False
    solver_name: str = 'CA_LTV_MPC'
    qp_interface: str = 'jax'  # inert
    # 'dense' = Schur/IPM eq-QP on the full decision vector; 'riccati' = the
    # stage-structured OCP-QP kernel (solvers/ocp_qp.py — the HPIPM-role backend,
    # O(N n^3) per IPM iteration, and the numerically sturdier one in float32;
    # soft constraints become slack stage-inputs).  'auto' = riccati.
    qp_backend: str = 'auto'
    debug_plot: bool = False
    pause_on_plot: bool = False
