"""Derive an 8-stage, 5th-order additive (IMEX) ARK pair numerically.

The reference exposes ``-ts_arkimex_type 5`` (Kennedy-Carpenter
ARK5(4)8L[2]SA). Rather than transcribing its 70+ long rational
coefficients, this tool searches for an 8-stage ESDIRK(implicit)+ERK
(explicit) pair with shared b, c, stiff accuracy (last implicit row = b) and
first-stage-explicit structure, by least-squares on the FULL set of additive
order-5 colored-tree conditions (pnode_tpu/order_conditions.py). A solution
with residual < 1e-12 is written to pnode_tpu/tableaus_ark5.py.

Usage: python tools/derive_ark5.py [--restarts N]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
from scipy.optimize import least_squares

sys.path.insert(0, ".")
from pnode_tpu.order_conditions import residuals  # noqa: E402

S = 8


def unpack(x):
    """x -> (a_im, a_ex, b, c, gamma) with structural constraints baked in."""
    i = 0
    gamma = x[i]; i += 1
    c_mid = x[i:i + 6]; i += 6          # c_2..c_7
    b_free = x[i:i + 6]; i += 6         # b_2..b_7 (b_1 from sum, b_8 = gamma)
    c = np.concatenate([[0.0], c_mid, [1.0]])
    b8 = gamma
    b1 = 1.0 - b8 - np.sum(b_free)
    b = np.concatenate([[b1], b_free, [b8]])

    a_im = np.zeros((S, S))
    # ESDIRK: rows 2..7 free strictly-lower entries except col0 fixed by row sum
    for r in range(1, S - 1):
        n_free = r - 1  # cols 1..r-1
        row = x[i:i + n_free]; i += n_free
        a_im[r, 1:r] = row
        a_im[r, r] = gamma
        a_im[r, 0] = c[r] - gamma - np.sum(row)
    a_im[S - 1, :] = b  # stiffly accurate (requires b8 == gamma: enforced)

    a_ex = np.zeros((S, S))
    for r in range(1, S):
        n_free = r - 1  # cols 1..r-1
        row = x[i:i + n_free]; i += n_free
        a_ex[r, 1:r] = row
        a_ex[r, 0] = c[r] - np.sum(row)
    assert i == len(x)
    return a_im, a_ex, b, c, gamma


N_X = 1 + 6 + 6 + sum(r - 1 for r in range(1, S - 1)) + sum(
    r - 1 for r in range(1, S)
)


def _R(z, A, b):
    s = len(b)
    try:
        return 1.0 + z * (b @ np.linalg.solve(np.eye(s) - z * A, np.ones(s)))
    except np.linalg.LinAlgError:
        return 1e6  # singular resolvent at a bad iterate: large penalty


# stability sample points in the left half-plane (implicit part must damp)
_STAB_PTS = [-0.5, -2.0, -8.0, -30.0, -120.0, -1e3, -1e5,
             complex(-1.0, 3.0), complex(-10.0, 10.0), complex(-100.0, 30.0)]


def fun(x):
    a_im, a_ex, b, c, gamma = unpack(x)
    res = residuals(a_im, a_ex, b, 5)
    # L-stability: R_im(-inf) = 0, and |R_im| <= 1 on the sampled left plane
    stab = [2.0 * _R(-1e10, a_im, b)]
    for z in _STAB_PTS:
        r = abs(_R(z, a_im, b))
        stab.append(1.0 * max(0.0, r - 0.99))
    extras = [
        0.03 * max(0.0, 0.15 - gamma),
        0.03 * max(0.0, gamma - 0.45),
        0.001 * np.maximum(np.abs(x) - 8.0, 0.0).sum(),
    ]
    return np.concatenate([res, stab, extras])


def order_only(x):
    a_im, a_ex, b, c, gamma = unpack(x)
    return residuals(a_im, a_ex, b, 5)


def weighted(x, w):
    a_im, a_ex, b, c, gamma = unpack(x)
    res = residuals(a_im, a_ex, b, 5)
    stab = [w * 2.0 * _R(-1e10, a_im, b)]
    for z in _STAB_PTS:
        stab.append(w * max(0.0, abs(_R(z, a_im, b)) - 0.99))
    return np.concatenate([res, stab])


def main():
    """Homotopy: solve order conditions exactly from random inits, then ramp
    the stability penalty while re-projecting onto the order manifold."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    best = None
    for trial in range(args.restarts):
        x0 = rng.normal(scale=0.4, size=N_X)
        x0[0] = 0.2 + 0.1 * rng.random()
        x0[1:7] = np.sort(rng.random(6))
        sol = least_squares(order_only, x0, method="lm", max_nfev=3000)
        if np.max(np.abs(sol.fun)) > 1e-12:
            print(f"trial {trial}: phase-A failed "
                  f"({np.max(np.abs(sol.fun)):.1e})", flush=True)
            continue
        x = sol.x
        for w in (0.05, 0.3, 1.0):
            x = least_squares(lambda xx: weighted(xx, w), x, method="lm",
                              max_nfev=1500).x
        # final projection back onto the exact order manifold
        x = least_squares(order_only, x, method="lm", max_nfev=2500).x
        r_ord = np.max(np.abs(order_only(x)))
        a_im, _, b, _, _ = unpack(x)
        rinf = abs(_R(-1e10, a_im, b))
        rmax = max(abs(_R(z, a_im, b)) for z in _STAB_PTS)
        print(f"trial {trial}: order-res {r_ord:.3e} |R(inf)| {rinf:.4f} "
              f"maxR {rmax:.3f}", flush=True)
        # accept A-stable-at-infinity pairs (|R| <= 1 on the sampled left
        # half-plane); prefer stronger damping at infinity
        ok = r_ord < 1e-11 and rinf < 1.0 and rmax <= 1.0
        score = r_ord + rinf + max(0.0, rmax - 1.0)
        if ok and (best is None or score < best[0]):
            best = (score, x, r_ord, rinf)
        if ok:
            break  # first acceptable pair wins (budgeted search)
    if best is None:
        print("NO stable solution found; keeping the ARK4 alias")
        return 1
    _, x, r, _rinf = best
    print(f"best residual {r:.3e}")
    if r > 1e-11:
        print("NO solution found to tolerance; keeping the ARK4 alias")
        return 1
    a_im, a_ex, b, c, gamma = unpack(x)
    rinf = abs(_R(-1e10, a_im, b))
    rmax = max(abs(_R(z, a_im, b)) for z in _STAB_PTS)
    np.set_printoptions(precision=17)
    out = f'''"""Derived 8-stage order-5 additive ARK pair (tools/derive_ark5.py).

Satisfies ALL additive order-5 colored-tree conditions to {r:.1e}
(verified by tests/test_order_conditions.py). Structure: ESDIRK implicit
(gamma = {gamma!r}), stiffly accurate, shared b/c, explicit ERK part.
Implicit-part stability (numerical): |R(-inf)| = {rinf:.2e}, max |R| over
sampled left half-plane = {rmax:.3f}.
"""

import numpy as np

GAMMA = {gamma!r}
A_IM = np.array({np.array2string(a_im, separator=", ")})
A_EX = np.array({np.array2string(a_ex, separator=", ")})
B = np.array({np.array2string(b, separator=", ")})
C = np.array({np.array2string(c, separator=", ")})
'''
    with open("pnode_tpu/tableaus_ark5.py", "w") as f:
        f.write(out)
    print("wrote pnode_tpu/tableaus_ark5.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
