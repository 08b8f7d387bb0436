"""pnode_tpu — TPU-native neural ODE / DAE training framework.

A from-scratch JAX/XLA rebuild of the capabilities of caidao22/pnode
(PNODE/SINODE): neural ODE, DAE and IMEX training with discrete-adjoint
gradients and trajectory checkpointing, engineered for TPU
(lax.scan-compiled steppers, matrix-free Newton-Krylov on jvp/vjp operators,
sharding-ready batch parallelism) instead of PETSc TS/TSAdjoint + torch.

Quick start::

    import pnode_tpu
    pnode_tpu.init(sys.argv)          # consume -ts_* style runtime flags

    ode = pnode_tpu.ODESolver()
    ode.setupTS(u_template, func, step_size=0.01, method="dopri5")
    sol = ode.odeint_adjoint(y0, t)   # differentiable via jax.grad
"""

from .options import Options, clear_options, init, options_left, set_option
from .modules import DynamicsModule, FlaxFunc, Func, as_dynamics
from .solver import ODESolver, ODEPnode
from .adjoint import TrajectoryConfig
from .disk_host import HostDiskTrajectory
from .linsolve import gmres
from .tableaus import get_ark_tableau, get_rk_tableau

__version__ = "0.1.0"

__all__ = [
    "init",
    "set_option",
    "clear_options",
    "options_left",
    "Options",
    "ODESolver",
    "ODEPnode",
    "DynamicsModule",
    "Func",
    "FlaxFunc",
    "as_dynamics",
    "TrajectoryConfig",
    "HostDiskTrajectory",
    "gmres",
    "get_rk_tableau",
    "get_ark_tableau",
]
