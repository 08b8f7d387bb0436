"""Dynamics-function wrappers: the nn.Module-with-forward(t, y) equivalent.

The reference passes torch ``nn.Module``s whose ``forward(t, y)`` evaluates
f(t, u) and whose ``.parameters()`` feed the flat adjoint vector
(/root/reference/pnode/petsc_adjoint.py:599-621). In JAX, parameters are
explicit pytrees; these wrappers give the solver a uniform interface::

    func(t, y, params) -> dy          # pure apply
    func.params                       # current parameter pytree

Three ways to build one:

- ``Func(fn, params)``: wrap any pure function ``fn(t, y, params)``.
- ``FlaxFunc(module, variables)``: wrap a ``flax.linen`` module whose
  ``__call__(t, y)`` is the dynamics (the model-zoo path).
- Subclass ``DynamicsModule`` and implement ``__call__``.

An NFE counter is *not* mutated per call (side effects don't survive jit);
the solver reports NFE from the static step/stage count plus Newton
iteration telemetry, preserving the reference's NFE-F/NFE-B reporting
(e.g. /root/reference/examples-pnode/ROBER.py:428-435).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

Pytree = Any


class DynamicsModule:
    """Base class: dynamics with an explicit parameter pytree."""

    params: Pytree = None

    def __call__(self, t, y, params=None):
        raise NotImplementedError

    def bind(self):
        """Return (apply_fn, params) with apply_fn(t, y, params)."""
        return (lambda t, y, p: self(t, y, p)), self.params


class Func(DynamicsModule):
    """Wrap a pure function fn(t, y, params)."""

    def __init__(self, fn: Callable, params: Pytree = None):
        self.fn = fn
        self.params = params

    def __call__(self, t, y, params=None):
        return self.fn(t, y, self.params if params is None else params)


class FlaxFunc(DynamicsModule):
    """Wrap a flax.linen module: module.apply(variables, t, y).

    ``variables`` is the full variable dict ({'params': ...}); gradients flow
    through whatever subtree you pass to the solver as ``params``.
    """

    def __init__(self, module, variables: Pytree):
        self.module = module
        self.params = variables

    def __call__(self, t, y, params=None):
        v = self.params if params is None else params
        return self.module.apply(v, t, y)


def as_dynamics(func, params: Optional[Pytree] = None):
    """Coerce user input into (apply_fn, params).

    Accepts a DynamicsModule, a (fn, params) tuple, or a bare callable
    f(t, y) (parameterless dynamics, e.g. the fixed implicit operators in
    the SINODE examples — /root/reference/examples-sinode/Burgers/Burgers.py:170
    ODEFuncIM has a fixed Laplacian).
    """
    if isinstance(func, DynamicsModule):
        fn, p = func.bind()
        return fn, (params if params is not None else p)
    if isinstance(func, tuple) and len(func) == 2:
        fn, p = func
        return (lambda t, y, pp: fn(t, y, pp)), (params if params is not None else p)
    if callable(func):
        # bare f(t, y); tolerate an optional ignored params argument
        return (lambda t, y, pp: func(t, y)), (params if params is not None else {})
    raise TypeError(
        "func must be a DynamicsModule, (fn, params) tuple, or callable f(t, y)"
    )
