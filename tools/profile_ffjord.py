"""Decompose the FFJORD tabular training iteration into component costs.

The miniboone recipe (/root/reference/ffjord-pnode/train_tabular.py:5:
nhidden 2, hdim_factor 20, 1 block, softplus, batch 1000, rk4 dt 0.25)
measures 6.43 ms/iter (155.6 it/s) on the chip at MFU 0.041 — this probe
locates where the time goes, under the bench protocol (scanned inner
iterations per dispatch, device sync via scalar fetch, carry perturbing
the solve input so XLA cannot hoist the loop-invariant work):

  fwd         CNF forward solve + NLL only (no grad)
  grad        jax.value_and_grad of the NLL
  train       full step: value_and_grad + Adam (== the driver)
  dyn_chain   microprobe: the CNF dynamics (net + Hutchinson jvp) evaluated
              the per-iteration NFE-F count of times
  mlp_chain   microprobe: the bare ODEnet (no divergence) at the same count
  mlp_paired  microprobe: primal+tangent via ONE stacked (2B) dot per layer
              (what a paired-jvp rewrite would execute)
  adam        optimizer alone (fixed gradient, no solve)

Usage: python tools/profile_ffjord.py [--inner 50] [--windows 3]
       [--dispatches 5] [--probes solve,micro,opt]
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


def _time(step, n_disp, windows, inner):
    rates = []
    for _ in range(windows):
        t0 = time.time()
        out = None
        for _ in range(n_disp):
            out = step()
        _sync(out)
        rates.append(n_disp / (time.time() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    return 1e6 / (med * inner)  # us per inner iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--dispatches", type=int, default=5)
    ap.add_argument("--probes", type=str, default="all",
                    help="comma list: solve,micro,opt (default all)")
    args, unknown = ap.parse_known_args()
    probes = set(("solve,micro,opt" if args.probes == "all"
                  else args.probes).split(","))

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    import pnode_tpu
    from pnode_tpu.ffjord import build_model_tabular
    from pnode_tpu.ffjord.datasets import load_tabular

    pnode_tpu.init([sys.argv[0]] + unknown)

    data = load_tabular("miniboone")
    D = data.dim
    B = 1000
    hidden = (20 * D,) * 2
    model = build_model_tabular(
        dim=D, num_blocks=1, hidden_dims=hidden,
        layer_type="concatsquash", nonlinearity="softplus",
        time_length=1.0, solver="rk4", step_size=0.25,
        batch_norm=False, rademacher=True, regularization_fns=[],
    )
    x = jnp.asarray(data.trn[:B])
    params = model.init(jax.random.PRNGKey(0), x)
    inner = args.inner

    _ = float(jnp.zeros((), jnp.float32) + 1.0)  # fetch-channel warmup
    t0 = time.time()
    _ = float(jnp.zeros((), jnp.float32) + 2.0)
    print(f"steady-state fetch: {time.time() - t0:.3f}s", file=sys.stderr)

    from pnode_tpu.ffjord import standard_normal_logprob

    def nll(p, xb, key):
        z, dlp, _ = model.apply(p, xb, key=key, training=True)
        logpx = standard_normal_logprob(z)[:, None] - dlp
        return -jnp.mean(logpx)

    key0 = jax.random.PRNGKey(7)
    results = {}

    # ---- fwd ----
    def fwd_steps(p, xb):
        def body(carry, _):
            loss = nll(p, xb + 1e-30 * carry, key0)
            return loss, loss
        _, losses = lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=inner)
        return losses[-1]

    if "solve" in probes:
        cf = jax.jit(fwd_steps).lower(params, x).compile()

        def stepf():
            return cf(params, x)

        _sync(stepf())
        results["fwd"] = _time(stepf, args.dispatches, args.windows, inner)

        # ---- grad ----
        def grad_steps(p, xb):
            def body(carry, _):
                loss, g = jax.value_and_grad(nll)(carry, xb, key0)
                return jax.tree_util.tree_map(
                    lambda a, b: a - 0.0 * b, carry, g), loss
            p, losses = lax.scan(body, p, None, length=inner)
            return losses[-1]

        cg = jax.jit(grad_steps).lower(params, x).compile()

        def stepg():
            return cg(params, x)

        _sync(stepg())
        results["grad"] = _time(stepg, args.dispatches, args.windows, inner)

        # ---- train (driver protocol: adam + weight decay) ----
        opt = optax.chain(
            optax.add_decayed_weights(1e-6),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(1e-3),
        )
        s0 = opt.init(params)

        def train_steps(p, s, xb):
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(nll)(p, xb, key0)
                up, s = opt.update(g, s, params=p)
                return (optax.apply_updates(p, up), s), loss
            (p, s), losses = lax.scan(body, (p, s), None, length=inner)
            return p, s, losses[-1]

        ct = jax.jit(train_steps).lower(params, s0, x).compile()
        st = {"p": params, "s": s0}

        def stept():
            st["p"], st["s"], loss = ct(st["p"], st["s"], x)
            return loss

        _sync(stept())
        results["train"] = _time(stept, args.dispatches, args.windows, inner)

    # ---- microprobes ----
    # per-iteration dynamics-eval count: rk4 x 4 steps = 16 fwd; the
    # stage-exact adjoint replays + transposes each (~2x) => ~48 total
    cnf = model.layers[0].cnf  # one block, no batch_norm
    net_params = params[0]
    n_eval = 16
    if "micro" in probes and cnf is not None:
        dyn = cnf._dynamics(False, False)
        probe = jnp.sign(jax.random.normal(jax.random.PRNGKey(3), (B, D)))
        flat0 = jnp.concatenate([x, jnp.zeros((B, 1), x.dtype)], axis=-1)
        p_dyn = {"net": net_params, "probe": probe}

        def dyn_chain(y):
            def body(carry, _):
                out = dyn(0.3, carry, p_dyn)
                return carry + 0.25 * out, ()
            out, _ = lax.scan(body, y, None, length=inner * n_eval)
            return out

        cd = jax.jit(dyn_chain).lower(flat0).compile()

        def stepd():
            return cd(flat0)

        _sync(stepd())
        results[f"dyn_chain(x{n_eval})"] = _time(
            stepd, args.dispatches, args.windows, inner)

        # bare net, no divergence
        def net_closed(zz):
            return cnf.net.apply(net_params, 0.3, zz)

        def mlp_chain(y):
            def body(carry, _):
                return carry + 0.25 * net_closed(carry), ()
            out, _ = lax.scan(body, y, None, length=inner * n_eval)
            return out

        cm = jax.jit(mlp_chain).lower(x).compile()

        def stepm():
            return cm(x)

        _sync(stepm())
        results[f"mlp_chain(x{n_eval})"] = _time(
            stepm, args.dispatches, args.windows, inner)

        # net + jvp the way the CNF runs it today
        def jvp_chain(y):
            def body(carry, _):
                dz, Je = jax.jvp(net_closed, (carry,), (probe,))
                div = jnp.sum(probe * Je, axis=-1)
                return carry + 0.25 * dz + 1e-30 * div[:, None], ()
            out, _ = lax.scan(body, y, None, length=inner * n_eval)
            return out

        cj = jax.jit(jvp_chain).lower(x).compile()

        def stepj():
            return cj(x)

        _sync(stepj())
        results[f"jvp_chain(x{n_eval})"] = _time(
            stepj, args.dispatches, args.windows, inner)

        # the paired-propagation candidate: one stacked (2B) dot per layer
        # (hand-written concatsquash math, softplus pairing)
        p_tree = (net_params["params"] if "params" in net_params
                  else net_params)
        dims = [D] + list(hidden) + [D]
        Ws, bs, gWs, gbs, bWs = [], [], [], [], []
        for li in range(len(dims) - 1):
            lp = p_tree[f"ConcatSquashLinear_{li}"]
            Ws.append(lp["Dense_2"]["kernel"])
            bs.append(lp["Dense_2"]["bias"])
            gWs.append(lp["Dense_0"]["kernel"])
            gbs.append(lp["Dense_0"]["bias"])
            bWs.append(lp["Dense_1"]["kernel"])

        def paired_chain(y):
            t = jnp.full((1, 1), 0.3, y.dtype)

            def body(carry, _):
                s = jnp.concatenate([carry, probe], axis=0)  # (2B, D)
                for li in range(len(Ws)):
                    gate = jax.nn.sigmoid(t @ gWs[li] + gbs[li])
                    tb = t @ bWs[li]
                    s = (s @ Ws[li]) * gate
                    s = s.at[:B].add(bs[li] * gate + tb)
                    if li < len(Ws) - 1:
                        u = s[:B]
                        s = jnp.concatenate(
                            [jax.nn.softplus(u),
                             jax.nn.sigmoid(u) * s[B:]], axis=0)
                dz, Je = s[:B], s[B:]
                div = jnp.sum(probe * Je, axis=-1)
                return carry + 0.25 * dz + 1e-30 * div[:, None], ()
            out, _ = lax.scan(body, y, None, length=inner * n_eval)
            return out

        cp = jax.jit(paired_chain).lower(x).compile()

        def stepp():
            return cp(x)

        _sync(stepp())
        results[f"paired_chain(x{n_eval})"] = _time(
            stepp, args.dispatches, args.windows, inner)

    # ---- optimizer alone ----
    if "opt" in probes:
        g_fix = jax.tree_util.tree_map(
            lambda a: jnp.full_like(a, 1e-4), params)
        opt = optax.chain(
            optax.add_decayed_weights(1e-6),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(1e-3),
        )
        s0 = opt.init(params)

        def steps(p, s):
            def body(carry, _):
                p, s = carry
                u, s = opt.update(g_fix, s, params=p)
                return (optax.apply_updates(p, u), s), ()
            (p, s), _ = lax.scan(body, (p, s), None, length=inner)
            return p, s

        c = jax.jit(steps).lower(params, s0).compile()
        st = {"v": (params, s0)}

        def stepo():
            st["v"] = c(*st["v"])
            return st["v"][0]

        out = stepo()
        _sync(jax.tree_util.tree_leaves(out)[0])
        rates = []
        for _ in range(args.windows):
            t0 = time.time()
            for _ in range(args.dispatches):
                out = stepo()
            _sync(jax.tree_util.tree_leaves(out)[0])
            rates.append(args.dispatches / (time.time() - t0))
        rates.sort()
        results["adam_alone"] = 1e6 / (rates[len(rates) // 2] * inner)

    print(f"\nffjord miniboone D={D} B={B} rk4 dt=0.25 inner={inner}:")
    for k, v in results.items():
        print(f"  {k:>22}: {v:8.2f} us/iter")
    if "solve" in probes:
        print(f"  {'reverse(=grad-fwd)':>22}: "
              f"{results['grad'] - results['fwd']:8.2f} us/iter")
        print(f"  {'adam(=train-grad)':>22}: "
              f"{results['train'] - results['grad']:8.2f} us/iter")


if __name__ == "__main__":
    main()
