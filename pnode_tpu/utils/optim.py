"""Bandwidth-lean flat Adam for parameter-bound training steps.

Motivation (tools/profile_sinode.py, Burgers-512 on the chip): the SINODE
scan-path training step is parameter-HBM-bound, and the optax
``flatten(adam)`` update alone costs ~51 us/step — ~44 MB of optimizer
traffic (read g/p/m/v, write p/m/v, all fp32) against the ~820 GB/s HBM
roofline. Storing the moments in bf16 removes ~12.6 MB of that per step.

Numerics: the update math runs in fp32 (moments are upcast, the new
moments are rounded back to bf16 on store). bf16 carries fp32's exponent
range with an 8-bit mantissa, so the stored moments see ~0.4% relative
rounding — a step-size/direction perturbation well below minibatch noise
(the same argument, with less margin, that 8-bit Adam rests on). Params
stay fp32 exactly. ``moment_dtype=float32`` reproduces ``optax.adam`` to
float32 roundoff — ulp-level op-ordering residuals only (asserted in
tests/test_optim.py).

Use it TREE-MODE (do not wrap in ``optax.flatten``) when the update runs
inside a compiled scan: there is no per-leaf dispatch there, and the
flatten wrapper's concat/split forces full materialization of the flat
g/m/v vectors — measured 55.2 vs 20.0 us/step for the update alone and
138.6 vs 95.6 us/step for the whole Burgers-512 training step on the
chip (tools/profile_sinode.py). The ~100-per-leaf-ops dispatch-latency
concern only applies to EAGER per-step drivers, where ``optax.flatten``
remains the right wrapper.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdamState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    mu: optax.Updates
    nu: optax.Updates


def adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8, moment_dtype: Optional[str] = None):
    """Adam whose first/second moments are STORED in ``moment_dtype``.

    ``moment_dtype=None``/"f32" is exactly ``optax.adam`` (same update
    expression, fp32 state); "bf16" halves the optimizer-state HBM
    traffic for bandwidth-bound steps. ``learning_rate`` may be a float
    or an optax schedule (callable of the step count).
    """
    if moment_dtype in (None, "f32", "float32"):
        mdt = jnp.float32
    elif moment_dtype in ("bf16", "bfloat16"):
        mdt = jnp.bfloat16
    else:
        raise ValueError(f"moment_dtype {moment_dtype!r}: use f32|bf16")

    def init(params):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mdt), params)
        return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros,
                         nu=jax.tree_util.tree_map(jnp.copy, zeros))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        # fp32 math; bf16 (or fp32) storage. Bias corrections use the
        # integer count exactly like optax.scale_by_adam's.
        b1c = 1.0 - jnp.asarray(b1, jnp.float32) ** count
        b2c = 1.0 - jnp.asarray(b2, jnp.float32) ** count

        def m32(g, m):
            return b1 * m.astype(jnp.float32) + (1.0 - b1) * g

        def v32(g, v):
            return b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g)

        # three maps over the same inputs; XLA CSEs the shared
        # subexpressions inside one jit, so this costs nothing extra
        steps = jax.tree_util.tree_map(
            lambda g, m, v: -lr * (m32(g, m) / b1c)
            / (jnp.sqrt(v32(g, v) / b2c) + eps),
            grads, state.mu, state.nu)
        mu = jax.tree_util.tree_map(
            lambda g, m: m32(g, m).astype(mdt), grads, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: v32(g, v).astype(mdt), grads, state.nu)
        return steps, AdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
