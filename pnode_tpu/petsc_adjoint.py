"""Drop-in import-path parity with the reference: ``pnode.petsc_adjoint``.

Reference drivers do ``from pnode import petsc_adjoint`` and instantiate
``petsc_adjoint.ODEPetsc()`` (/root/reference/tests/test_pnode.py:33,135).
Porting a driver to this framework only requires switching the package name::

    from pnode_tpu import petsc_adjoint
    ode = petsc_adjoint.ODEPetsc()
    ode.setupTS(u_template, func, ...)
    sol = ode.odeint_adjoint(y0, t)

There is no PETSc underneath — the name is kept purely as a migration aid.
"""

from .solver import ODESolver

ODEPetsc = ODESolver

__all__ = ["ODEPetsc", "ODESolver"]
