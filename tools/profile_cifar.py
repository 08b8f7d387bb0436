"""Decompose the CIFAR-10 ODE-net training step into component costs.

bench.py --workload cifar measures 31.6 it/s (bf16) with XLA cost
analysis reporting mfu=0.033, hbm_frac=1.11 — the step is nowhere near
compute-bound. This probe localizes where the 31.6 ms goes:

  fwd          model.apply forward only
  grad         jax.value_and_grad (the bench step minus SGD)
  stage probes one ODEDynamics eval at each stage's (shape, channels),
               timed standalone — and the SAME spatial shape with
               channels padded to 128. TPU vector registers are
               (8, 128)-tiled: a C=16 tensor occupies 128 lanes in
               VMEM/HBM tiles regardless, so if the padded variant
               (8x the logical FLOPs/bytes at stage 1) costs about the
               same wall time, the step is bound by LANE-PADDED
               bandwidth, not logical bytes — a model-architecture
               ceiling (SqNxt-23's small channel counts), not a
               framework one.

Measured on the chip (bf16, 2026-08-18):

  fwd(eval) 10.7 ms | grad 32.6 ms (backward 22.0 = 2.06x fwd) | sgd 0.7
  dyn eval: c=32@32x32 96-116 us, c=64@16x16 73-76, c=128@8x8 67-73,
            c=256@4x4 61-69, c=128@32x32 261-263
  mm  eval: c=32@32x32 516 us, c=64@16x16 242, c=128@8x8 88, c=256@4x4 75

Readings:
- The forward is fully accounted for by dynamics evals (17 ODE blocks
  x 8 evals, stage-weighted ~= 11 ms); backward is the usual ~2x.
- Eval cost is SCALE-INVARIANT below c=128@8x8 (~1-2 MB tensors):
  ~60-75 us for a ~13-op conv/norm/relu chain = ~5 us per op — a
  per-op scheduling/launch floor, NOT bandwidth (the same chip runs
  big-MLP matmul chains at ~1.5 us/op) and NOT lane padding per se.
- NEGATIVE: lowering the 1x1 convs to (B*H*W, C) matmuls (and the
  (1,3)/(3,1) convs to shifted-concat + one matmul) is 5x SLOWER at
  stage-1 shapes (515 vs 96 us) — XLA's TPU convolution handles the
  C<128 tiling better than an explicit reshape, whose (BHW, 16)
  relayout dominates. Keep nn.Conv.
- Consequence: CIFAR epoch time is bounded by op-count x per-op floor;
  shrinking it further needs fusing the 5-conv dynamics chain into one
  Pallas kernel, whose cross-BATCH BatchStatsNorm coupling forces a
  two-pass-per-layer structure (~2x best case, hand-written backward
  required). Parked: measured, understood, not currently worth it.

Usage: python tools/profile_cifar.py [--dtype bf16] [--inner 50]
       [--skip_full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x).astype(jnp.float32))


def _time_ms(step, n_disp, windows):
    rates = []
    for _ in range(windows):
        t0 = time.time()
        out = None
        for _ in range(n_disp):
            out = step()
        _sync(out)
        rates.append(n_disp / (time.time() - t0))
    rates.sort()
    return 1e3 / rates[len(rates) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--inner", type=int, default=50,
                    help="dynamics-eval scan length for the stage probes")
    ap.add_argument("--dispatches", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--skip_full", action="store_true",
                    help="skip the full-model fwd/grad/train probes")
    args, unknown = ap.parse_known_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    import pnode_tpu
    from pnode_tpu.models.sqnxt import ODEDynamics, SqueezeNextODE

    pnode_tpu.init([sys.argv[0]] + unknown)

    batch = 128
    model = SqueezeNextODE(num_classes=10, method="rk4", Nt=2,
                           dtype=args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 32, 32, 3)).astype("float32"))
    y = jnp.asarray(rng.integers(0, 10, size=(batch,)))
    params = model.init(jax.random.PRNGKey(0), x)

    # warm the fetch channel
    _ = float(jnp.zeros((), jnp.float32) + 1.0)
    t0 = time.time()
    _ = float(jnp.zeros((), jnp.float32) + 2.0)
    print(f"steady-state fetch: {time.time() - t0:.3f}s", file=sys.stderr)

    results = {}

    # ---- full training-step decomposition (one iteration per dispatch,
    # like bench_cifar: marginal dispatch ~0.25 ms on this tunnel) -------
    def loss_fn(p, xb, yb):
        logits = model.apply(p, xb, training=True)
        onehot = jax.nn.one_hot(yb, 10)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), -1))

    def fwd_eval(p, xb, yb):
        # eval-mode forward: no adjoint bookkeeping
        logits = model.apply(p, xb, training=False)
        return jnp.sum(logits)

    if not args.skip_full:
        cf = jax.jit(fwd_eval).lower(params, x, y).compile()
        _sync(cf(params, x, y))
        results["fwd(eval)"] = _time_ms(lambda: cf(params, x, y),
                                        args.dispatches, args.windows)

        cg = jax.jit(jax.value_and_grad(loss_fn)).lower(
            params, x, y).compile()

        def stepg():
            loss, _ = cg(params, x, y)
            return loss

        _sync(stepg())
        results["grad"] = _time_ms(stepg, args.dispatches, args.windows)

        opt = optax.sgd(0.1, momentum=0.9)
        opt_state = opt.init(params)

        def train(p, s, xb, yb):
            loss, g = jax.value_and_grad(loss_fn)(p, xb, yb)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s, loss

        ct = jax.jit(train).lower(params, opt_state, x, y).compile()
        st = {"v": (params, opt_state)}

        def stept():
            p, s, loss = ct(st["v"][0], st["v"][1], x, y)
            st["v"] = (p, s)
            return loss

        _sync(stept())
        results["train(=bench)"] = _time_ms(
            stept, args.dispatches, args.windows)

    # ---- matmul-lowered dynamics variant --------------------------------
    # hypothesis: the ~5 us/op floor is XLA convolution overhead at tiny
    # spatial shapes (a same-size MLP matmul chain costs ~1.5 us/op on
    # this chip). Lower the 1x1 convs to (B*H*W, C) @ (C, C') matmuls and
    # the (1,3)/(3,1) convs to a concat of W/H-shifted copies followed by
    # ONE (B*H*W, 3C) @ (3C, C') matmul — mathematically identical to
    # SAME zero-padded convs.
    import flax.linen as fnn
    from pnode_tpu.models.sqnxt import BatchStatsNorm

    class MMDyn(fnn.Module):
        dim: int
        dtype: object = None

        @fnn.compact
        def __call__(self, t, x):
            c1 = int(self.dim * 0.5)
            c2 = int(self.dim * 0.25)
            dt_ = self.dtype

            def mm(h, cout):
                B, H, W, C = h.shape
                y = fnn.Dense(cout, dtype=dt_)(h.reshape(B * H * W, C))
                return y.reshape(B, H, W, cout)

            def mm_w3(h, cout):  # (1,3) SAME conv along W
                left = jnp.pad(h[:, :, 1:, :], ((0, 0), (0, 0), (0, 1),
                                                (0, 0)))
                right = jnp.pad(h[:, :, :-1, :], ((0, 0), (0, 0), (1, 0),
                                                  (0, 0)))
                h3 = jnp.concatenate([right, h, left], axis=-1)
                return mm(h3, cout)

            def mm_h3(h, cout):  # (3,1) SAME conv along H
                up = jnp.pad(h[:, 1:, :, :], ((0, 0), (0, 1), (0, 0),
                                              (0, 0)))
                down = jnp.pad(h[:, :-1, :, :], ((0, 0), (1, 0), (0, 0),
                                                 (0, 0)))
                h3 = jnp.concatenate([down, h, up], axis=-1)
                return mm(h3, cout)

            h = fnn.relu(BatchStatsNorm()(mm(x, c1)))
            h = fnn.relu(BatchStatsNorm()(mm(h, c2)))
            h = fnn.relu(BatchStatsNorm()(mm_w3(h, c1)))
            h = fnn.relu(BatchStatsNorm()(mm_h3(h, c1)))
            h = fnn.relu(BatchStatsNorm()(mm(h, self.dim)))
            return h

    # single-pass-statistics norm variant: E[x], E[x^2] in one fused
    # sibling reduction; var = E[x^2] - E[x]^2 (fp32 accumulate, same eps)
    class SPNorm(fnn.Module):
        eps: float = 1e-5

        @fnn.compact
        def __call__(self, x):
            c = x.shape[-1]
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            m = jnp.mean(x32, axis=axes)
            m2 = jnp.mean(x32 * x32, axis=axes)
            var = m2 - m * m
            scale = self.param("scale", fnn.initializers.ones, (c,))
            bias = self.param("bias", fnn.initializers.zeros, (c,))
            out = (x32 - m) / jnp.sqrt(var + self.eps) * scale + bias
            return out.astype(x.dtype)

    from pnode_tpu.models.sqnxt import _conv

    def _norm_dyn(norm_cls):
        class NormDyn(fnn.Module):
            dim: int
            dtype: object = None

            @fnn.compact
            def __call__(self, t, x):
                c1 = int(self.dim * 0.5)
                c2 = int(self.dim * 0.25)
                dt_ = self.dtype
                h = fnn.relu(norm_cls()(_conv(c1, 1, dtype=dt_)(x)))
                h = fnn.relu(norm_cls()(_conv(c2, 1, dtype=dt_)(h)))
                h = fnn.relu(norm_cls()(_conv(c1, (1, 3), dtype=dt_)(h)))
                h = fnn.relu(norm_cls()(_conv(c1, (3, 1), dtype=dt_)(h)))
                h = fnn.relu(norm_cls()(_conv(self.dim, 1, dtype=dt_)(h)))
                return h
        return NormDyn

    SPDyn = _norm_dyn(SPNorm)
    # forced-two-pass variant: with the size gate now in BatchStatsNorm,
    # plain ODEDynamics takes the single-pass branch at stage-1/2 sizes —
    # this pins jnp.var's centered pass for an A/B at every stage
    TPDyn = _norm_dyn(
        lambda: BatchStatsNorm(single_pass_min_size=1 << 62))

    # ---- per-stage dynamics-eval probes --------------------------------
    # SqNxt-23 stages: (channels, spatial). inner-scan the eval with a
    # carry-perturbed input so XLA cannot hoist it (profile_sinode lesson).
    dt = {"f32": None, "bf16": jnp.bfloat16}[args.dtype]
    stages = [(32, 32), (64, 16), (128, 8), (256, 4)]
    variants = [(ch, hw, "dyn") for ch, hw in stages + [(128, 32)]]
    variants += [(ch, hw, "mm ") for ch, hw in stages]
    variants += [(ch, hw, "sp ") for ch, hw in stages]
    variants += [(ch, hw, "tp ") for ch, hw in stages]
    kinds = {"dyn": ODEDynamics, "mm ": MMDyn, "sp ": SPDyn, "tp ": TPDyn}
    for ch, hw, tag in variants:  # (128, 32): stage-1 spatial,
        # channels padded to the 128-lane width (8x stage-1 logical work)
        dyn = kinds[tag](ch, dtype=dt)
        h0 = jnp.asarray(
            rng.normal(size=(batch, hw, hw, ch)).astype("float32"))
        if dt is not None:
            h0 = h0.astype(dt)
        p = dyn.init(jax.random.PRNGKey(1), 0.0, h0)

        def evals(p, h0, dyn=dyn):
            def body(carry, _):
                out = dyn.apply(p, 0.0, carry)
                # feed the output back so every eval depends on the last
                return out, ()
            out, _ = lax.scan(body, h0, None, length=args.inner)
            return jnp.sum(out)

        c = jax.jit(evals).lower(p, h0).compile()
        _sync(c(p, h0))
        ms = _time_ms(lambda: c(p, h0), args.dispatches, args.windows)
        results[f"{tag} c={ch} {hw}x{hw} (x{args.inner})"] = ms

    print(f"\ncifar b={batch} dtype={args.dtype}:")
    for k, v in results.items():
        print(f"  {k:>28}: {v:9.3f} ms")
    if not args.skip_full:
        print(f"  {'backward(=grad-fwd)':>28}: "
              f"{results['grad'] - results['fwd(eval)']:9.3f} ms")
        print(f"  {'sgd(=train-grad)':>28}: "
              f"{results['train(=bench)'] - results['grad']:9.3f} ms")
    # per-eval numbers for the stage probes
    print("\nper-dynamics-eval (us):")
    for k, v in results.items():
        if k.startswith(("dyn ", "mm ", "sp ", "tp ")):
            print(f"  {k:>28}: {v * 1e3 / args.inner:9.2f} us/eval")
    # forward model cost in evals: 17 ODE blocks x Nt=2 x 4 stages = 136
    # dynamics evals (stage-weighted) + stem/entry/head


if __name__ == "__main__":
    main()
