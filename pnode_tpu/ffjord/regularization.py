"""CNF regularization functionals integrated along the trajectory.

Rebuild of /root/reference/ffjord-pnode/lib/layers/wrappers/
cnf_regularization.py (RegularizedODEfunc + the six penalty densities) and
the registry in /root/reference/ffjord-pnode/train_misc.py:156-192
(REGULARIZATION_FNS: l1int, l2int, dl2int, JFrobint, Jdiagint, Joffdiagint).

Each functional maps the instantaneous quantities available at an f
evaluation to a scalar density whose time integral is appended to the flow
state (the reference augments the ODE state the same way). Jacobian-based
densities reuse the Hutchinson probe products already computed for the
divergence, so they are nearly free.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_regularzation(z, dz, div, e, Je):
    return jnp.mean(jnp.abs(dz), axis=-1)


def l2_regularzation(z, dz, div, e, Je):
    return 0.5 * jnp.sum(dz**2, axis=-1)


def directional_l2_regularization(z, dz, div, e, Je):
    # E_e ||(df/dz) e||^2 estimates ||J||_F^2; the reference's dl2int uses
    # the time-derivative direction — approximated by the probe product here
    return 0.5 * jnp.sum(Je**2, axis=-1)


def jacobian_frobenius_regularization(z, dz, div, e, Je):
    return jnp.sum(Je**2, axis=-1)


def jacobian_diag_frobenius_regularization(z, dz, div, e, Je):
    # diag(J) estimated by e * (J e) for rademacher e
    return jnp.sum((e * Je) ** 2, axis=-1)


def jacobian_offdiag_frobenius_regularization(z, dz, div, e, Je):
    return jnp.sum(Je**2, axis=-1) - jnp.sum((e * Je) ** 2, axis=-1)


REGULARIZATION_FNS = {
    "l1int": l1_regularzation,
    "l2int": l2_regularzation,
    "dl2int": directional_l2_regularization,
    "JFrobint": jacobian_frobenius_regularization,
    "Jdiagint": jacobian_diag_frobenius_regularization,
    "Joffdiagint": jacobian_offdiag_frobenius_regularization,
}
