"""The CNF layer: continuous normalizing flow through the pnode_tpu solver.

Rebuild of /root/reference/ffjord-pnode/lib/layers/cnf.py: the flow state
(z, delta_logp, reg accumulators) is flattened into ONE array integrated
over [0, T] (FlattenFunc, cnf.py:145-152), the Hutchinson probe is fixed per
solve (odefunc.before_odeint), training uses the discrete adjoint while
evaluation integrates without trajectory storage (cnf.py:73-92), and the
reverse (sampling) direction runs the time-flipped dynamics (FlipFunc).

Convention (matching the reference driver): the layer returns
``(z, delta_logp, regs)`` with ``log p_x(x) = log p_z(z) - delta_logp``
(train_tabular.py compute_loss).

The learnable end time ``sqrt_end_time`` of the reference receives no
gradient through its adjoint (OdeintAdjointMethod.backward returns None for
t — petsc_adjoint.py:947), so T is honestly a static hyperparameter here.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..solver import ODESolver
from .odefunc import divergence_bf_fn, sample_probe
from .regularization import REGULARIZATION_FNS


class CNF:
    """One CNF block. Functional API:

        cnf = CNF(odenet, input_dim=D, T=0.5, regularization_fns=["l2int"])
        params = cnf.init(key, x_sample)
        (z, delta_logp, regs), stats = cnf.apply(params, x, key)
        x_back = cnf.apply(params, z, key, reverse=True)[0][0]
    """

    def __init__(
        self,
        odenet,
        input_dim: int = None,
        T: float = 0.5,
        solver: str = "dopri5",
        step_size: float = 0.05,
        divergence: str = "approx",
        rademacher: bool = True,
        regularization_fns: Sequence[str] = (),
        solver_options: Optional[dict] = None,
        event_shape: Optional[Tuple[int, ...]] = None,
        autoencode: bool = False,
    ):
        """event_shape: non-batch shape of x for image CNFs (e.g. (H, W, C));
        the solver state is the flattened (B, prod(event_shape)+1+R) array
        while the dynamics net sees the unflattened view — the reference's
        FlattenFunc wrapper (cnf.py:145-152) works the same way."""
        self.net = odenet
        if event_shape is not None:
            self.event_shape = tuple(event_shape)
            input_dim = 1
            for d in self.event_shape:
                input_dim *= d
        else:
            if input_dim is None:
                raise ValueError("provide input_dim or event_shape")
            self.event_shape = (int(input_dim),)
        self.D = int(input_dim)
        self.T = float(T)
        self.solver = solver
        self.step_size = float(step_size)
        self.divergence = divergence
        self.rademacher = rademacher
        self.reg_names: List[str] = list(regularization_fns)
        for r in self.reg_names:
            if r not in REGULARIZATION_FNS:
                raise ValueError(f"unknown regularization {r!r}")
        self.R = len(self.reg_names)
        self.solver_options = solver_options or {}
        self._solvers: Dict = {}
        # Autoencoder divergence through the bottleneck (reference
        # AutoencoderODEfunc, odefunc.py:388-445): approximate-only, no
        # regularization state — same restrictions as the reference.
        self.autoencode = bool(autoencode)
        if self.autoencode:
            if self.R:
                raise ValueError(
                    "autoencode does not support regularization functionals "
                    "(reference AutoencoderODEfunc takes only (y, logp))"
                )
            if divergence == "brute_force":
                raise ValueError(
                    "autoencode supports only the approximate divergence "
                    "(reference odefunc.py:395-397)"
                )

    # -- parameters ------------------------------------------------------

    def init(self, key, x):
        net_params = self.net.init(key, 0.0, x.reshape((x.shape[0],) + self.event_shape))
        return net_params

    # -- dynamics --------------------------------------------------------

    def _dynamics(self, reverse: bool, exact_div: bool):
        D, R = self.D, self.R

        ev = self.event_shape

        def dyn(t, flat, p):
            z = flat[..., :D]
            t_eff = (self.T - t) if reverse else t
            sign = -1.0 if reverse else 1.0

            def f_closed(zz):
                zz_ev = zz.reshape((zz.shape[0],) + ev)
                out = self.net.apply(p["net"], t_eff, zz_ev)
                return out.reshape(zz.shape[0], -1)

            if self.autoencode:
                from .odefunc import autoencoder_divergence_fn

                def enc_closed(zz):
                    zz_ev = zz.reshape((zz.shape[0],) + ev)
                    return self.net.apply(p["net"], t_eff, zz_ev, method="encode")

                def dec_closed(hh):
                    out = self.net.apply(p["net"], t_eff, hh, method="decode")
                    return out.reshape(hh.shape[0], -1)

                e = jax.lax.stop_gradient(p["probe"])
                dz, div = autoencoder_divergence_fn(enc_closed, dec_closed, z, e)
                Je = jnp.zeros_like(z)
            elif exact_div:
                dz, div = divergence_bf_fn(f_closed, z)
                e = jnp.zeros_like(z)
                Je = jnp.zeros_like(z)
            else:
                e = jax.lax.stop_gradient(p["probe"])
                dz, Je = jax.jvp(f_closed, (z,), (e,))
                div = jnp.sum(e * Je, axis=-1)

            parts = [sign * dz, (-sign * div)[..., None]]
            for name in self.reg_names:
                r = REGULARIZATION_FNS[name](z, dz, div, e, Je)
                parts.append(r[..., None])  # reg densities accumulate forward
            return jnp.concatenate(parts, axis=-1)

        return dyn

    def _get_solver(self, shape, dtype, training, reverse, exact_div):
        key = (shape, str(dtype), training, reverse, exact_div)
        ode = self._solvers.get(key)
        if ode is None:
            ode = ODESolver()
            ode.setupTS(
                jnp.zeros(shape, dtype),
                (self._dynamics(reverse, exact_div), {}),
                step_size=self.step_size,
                method=self.solver,
                enable_adjoint=training,
                **self.solver_options,
            )
            self._solvers[key] = ode
        return ode

    # -- forward ---------------------------------------------------------

    def apply(
        self,
        params,
        x,
        key=None,
        logpx=None,
        training: bool = True,
        reverse: bool = False,
        exact_div: bool = False,
    ):
        """Returns ((z, delta_logp, regs), stats).

        delta_logp accumulates -∫div f; log p_x(x) = log p_z(z) - delta_logp.
        In reverse mode x is a base sample and z is the data-space point;
        delta_logp then carries the opposite sign contribution.
        """
        B = x.shape[0]
        dtype = x.dtype
        x_flat = x.reshape(B, -1)
        if exact_div:
            if self.autoencode:
                raise ValueError("autoencode has no brute-force divergence")
            probe = jnp.zeros_like(x_flat)
        else:
            if key is None:
                raise ValueError("key required for the Hutchinson estimator")
            probe_shape = (
                (B, self.net.bottleneck_dim) if self.autoencode else x_flat.shape
            )
            probe = sample_probe(
                key, probe_shape, dtype,
                "rademacher" if self.rademacher else "gaussian",
            )
        if logpx is None:
            logpx = jnp.zeros((B, 1), dtype)

        flat0 = jnp.concatenate(
            [x_flat, logpx, jnp.zeros((B, self.R), dtype)], axis=-1
        )
        ode = self._get_solver(flat0.shape, dtype, training, reverse, exact_div)
        p = {"net": params, "probe": probe}
        import numpy as _np

        t_out = _np.array([0.0, self.T])  # host array: stays concrete under jit
        sol, stats = ode.solve(
            flat0, t_out, params=p, with_adjoint=training
        )
        out = sol[-1]
        z = out[..., : self.D].reshape((B,) + self.event_shape)
        delta_logp = out[..., self.D: self.D + 1]
        regs = out[..., self.D + 1:]
        return (z, delta_logp, regs), stats
