// CAMS: optimal checkpointing for adjoint MULTISTAGE time-stepping schemes.
//
// Native planner complementing revolve.cpp — the reference exposes both
// schedules through PETSc TSTrajectory (`revolve` and `CAMS`,
// /root/reference/README.md:91-100; CAMS is the subject of arXiv 2106.13879,
// "Optimal Checkpointing for Adjoint Multistage Time-Stepping Schemes").
// Re-derived from the pnode_tpu executor's exact cost model rather than
// transcribed, and verified OPTIMAL against exhaustive search over the full
// action space (tests/test_cams.py).
//
// Cost model (matches pnode_tpu/adjoint.py):
//   - Memory in SOLUTION-VECTOR UNITS; budget m = spare units beyond the
//     initial state's implicit slot.
//   - SOLUTION checkpoint y_k: 1 unit; restore point for advances.
//   - STAGE checkpoint (y_k, aux_k): w units (w = 1 + stage-set size).
//     Reversing a stage-checkpointed step is FREE: step_adj consumes the
//     stored stages, skipping the stage recomputation (for implicit
//     steppers a full Newton re-solve) that solution-only reversal pays.
//     Its y_k also serves as a restore point while held.
//   - Reversing a non-checkpointed step k: cursor at y_k + ONE forward-step
//     evaluation (stage recompute inside step_adj).
//   - Advancing costs 1 per step; CAPTURING while advancing costs nothing
//     extra (the stage values are computed by the advance anyway).
//   - The ORIGINAL forward solve is free and may store checkpoints as it
//     goes (unlike the classical revolve executor, which replays from y0).
//   - A solution checkpoint may be DROPPED AT ITS FINAL RESTORE, freeing its
//     unit for captures on that last pass.
//   - Cost = forward-step evaluations after the original pass.
//
// Dynamic program over (n, m, d, g), where d in {0,1} is the restore-point
// offset behind the range start (stage checkpoints anchor the range that
// starts one step after them) and g in {0,1} marks a droppable anchor (a
// solution checkpoint; stage-checkpoint anchors must survive until their
// own reversal):
//
//   R(n,m,d,g) = d + P(n,m,d,g)                 (launch a paid pass)
//   P(n,m,d,g): pass in flight at the range start:
//     plain     : n==1 ? 1 : n + R(n-1,m,d,g)       advance, recompute last
//     promote   : d==1, m>=1: P(n,m-1,0,1)          store sol at range start
//     sol-split : a + P(n-a,m-1,0,1) + R(a,m,d,g)   a in [1,n-1], m>=1
//     cap-split : (a+1) + P(n-a-1,m-w,1,0) + R(a,m,d,g)   a in [0,n-1], m>=w
//     final     : g==1 && (n-1)w <= m+1: n          drop anchor at restore,
//                                                   capture-chain the range
//   F(n,m,d,g): the free (original) pass in flight:
//     use-R     : R(n,m,d,g)
//     promote   : d==1, m>=1: F(n,m-1,0,1)
//     sol-split : F(n-a,m-1,0,1) + R(a,m,d,g)
//     cap-split : F(n-a-1,m-w,1,0) + R(a,m,d,g)    a in [0,n-1], m>=w
//     full-cap  : n*w <= m+g: 0                    (elides a pending anchor)
//
// The same-pass continuations (P after sol/cap-split, promote) express
// multi-store-per-pass; paid re-passes gain nothing from it (advance costs
// are additive), which keeps the split recursion exact.
//
// The C++ side computes cost + decision tables; plan EMISSION lives in
// pnode_tpu/cams.py (one implementation, shared with the pure-Python
// fallback DP).
//
// Decision encoding (int32): kind * (1<<24) + a, with kinds
//   P: 0 plain | 1 promote | 2 sol-split(a) | 3 cap-split(a) | 4 final
//   F: 0 use-R | 1 promote | 2 sol-split(a) | 3 cap-split(a) | 4 full-cap
//
// Build:  g++ -O2 -shared -fPIC -o libcams.so cams.cpp

#include <cstdint>
#include <vector>

namespace {

constexpr int64_t INF = INT64_MAX / 4;

inline int64_t idx(int64_t n, int64_t m, int64_t d, int64_t g, int64_t M) {
  return ((n * (M + 1) + m) * 2 + d) * 2 + g;
}

}  // namespace

extern "C" {

// Fills the decision tables Pdec/Fdec, each sized (n+1)*(m+1)*4 with layout
// [n][m][d][g]. Returns F(n, m, 0, 0), the optimal recompute cost.
int64_t cams_solve(int64_t N, int64_t M, int64_t W, int32_t* Pdec,
                   int32_t* Fdec) {
  if (W < 1) W = 1;
  if (M < 0) M = 0;
  const int64_t SZ = (N + 1) * (M + 1) * 4;
  std::vector<int64_t> P(SZ, 0), F(SZ, 0);

  for (int64_t n = 1; n <= N; ++n) {
    for (int64_t m = 0; m <= M; ++m) {
      for (int64_t d = 0; d < 2; ++d) {
        for (int64_t g = 0; g < 2; ++g) {
          const int64_t i = idx(n, m, d, g, M);
          // ---- P ----
          int64_t best;
          int32_t dec;
          if (n == 1) {
            best = 1;
            dec = 0;
          } else {
            best = n + d + P[idx(n - 1, m, d, g, M)];
            dec = 0;
          }
          if (d == 1 && m >= 1) {
            int64_t c = P[idx(n, m - 1, 0, 1, M)];
            if (c < best) { best = c; dec = (1 << 24); }
          }
          if (m >= 1) {
            for (int64_t a = 1; a < n; ++a) {
              int64_t c = a + P[idx(n - a, m - 1, 0, 1, M)] +
                          (a > 0 ? d + P[idx(a, m, d, g, M)] : 0);
              if (c < best) { best = c; dec = (2 << 24) | (int32_t)a; }
            }
          }
          if (m >= W) {
            for (int64_t a = 0; a < n; ++a) {
              // continuation is the SAME pass (cursor already at a+1): P,
              // not R — no restore offset
              int64_t rc = (n - a - 1 > 0)
                               ? P[idx(n - a - 1, m - W, 1, 0, M)]
                               : 0;
              int64_t lc = (a > 0) ? d + P[idx(a, m, d, g, M)] : 0;
              int64_t c = (a + 1) + rc + lc;
              if (c < best) { best = c; dec = (3 << 24) | (int32_t)a; }
            }
          }
          if (g == 1 && (n - 1) * W <= m + 1) {
            if (n < best) { best = n; dec = (4 << 24); }
          }
          P[i] = best;
          Pdec[i] = dec;

          // ---- F ----
          int64_t fbest = d + P[i];  // use-R
          int32_t fdec = 0;
          if (d == 1 && m >= 1) {
            int64_t c = F[idx(n, m - 1, 0, 1, M)];
            if (c < fbest) { fbest = c; fdec = (1 << 24); }
          }
          if (m >= 1) {
            for (int64_t a = 1; a < n; ++a) {
              int64_t c = F[idx(n - a, m - 1, 0, 1, M)] +
                          (a > 0 ? d + P[idx(a, m, d, g, M)] : 0);
              if (c < fbest) { fbest = c; fdec = (2 << 24) | (int32_t)a; }
            }
          }
          if (m >= W) {
            for (int64_t a = 0; a < n; ++a) {
              int64_t rc = (n - a - 1 > 0) ? F[idx(n - a - 1, m - W, 1, 0, M)]
                                           : 0;
              int64_t lc = (a > 0) ? d + P[idx(a, m, d, g, M)] : 0;
              int64_t c = rc + lc;
              if (c < fbest) { fbest = c; fdec = (3 << 24) | (int32_t)a; }
            }
          }
          if (n * W <= m + g) {
            if (0 < fbest) { fbest = 0; fdec = (4 << 24); }
          }
          F[i] = fbest;
          Fdec[i] = fdec;
        }
      }
    }
  }
  return F[idx(N, M, 0, 0, M)];
}

}  // extern "C"
