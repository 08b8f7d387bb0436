// Optimal binomial checkpointing (revolve/treeverse) schedule generator.
//
// Native replacement for the revolve engine PETSc's TSTrajectory uses to
// realize `-ts_trajectory_max_cps_ram N` optimal checkpoint schedules
// (the reference's headline memory feature, /root/reference/README.md:91-100).
// Given n forward steps and c checkpoint slots (beyond the initial state),
// emits the action sequence that reverses the trajectory with the provably
// minimal number of forward re-steps T(n,c) = r*n - C(s+r, s+1), where
// s = c+1 and r = min{r : C(s+r, s) >= n} (Griewank & Walther, "Algorithm
// 799: revolve", ACM TOMS 2000 — re-derived and verified against exhaustive
// dynamic programming in tests/test_revolve.py).
//
// Actions (op, arg):
//   0 RESTORE k : cursor <- stored state at node k
//   1 ADVANCE k : advance cursor forward to node k (costs k - cursor steps)
//   2 STORE   k : store cursor state (cursor must be at node k)
//   3 REVERSE k : apply the adjoint of step k (cursor must be at node k)
//   4 DROP    k : free the stored state at node k
//
// Build:  g++ -O2 -shared -fPIC -o librevolve.so revolve.cpp

#include <cstdint>
#include <vector>

namespace {

struct Plan {
  int64_t* ops;
  int64_t* args;
  int64_t cap;
  int64_t len;
  bool overflow;

  void emit(int64_t op, int64_t arg) {
    if (len >= cap) {
      overflow = true;
      return;
    }
    ops[len] = op;
    args[len] = arg;
    ++len;
  }
};

// C(a, b) saturating at a large sentinel to avoid overflow.
int64_t binom(int64_t a, int64_t b) {
  if (b < 0 || b > a) return 0;
  if (b > a - b) b = a - b;
  long double acc = 1.0L;
  for (int64_t i = 1; i <= b; ++i) {
    acc = acc * (long double)(a - b + i) / (long double)i;
    if (acc > 4e18L) return INT64_MAX / 2;
  }
  return (int64_t)(acc + 0.5L);
}

int64_t rep(int64_t n, int64_t s) {
  int64_t r = 0;
  while (binom(s + r, s) < n) ++r;
  return r;
}

// Minimal forward re-steps to reverse n steps with c spare slots.
int64_t t_opt(int64_t n, int64_t c) {
  if (n <= 1) return 0;
  if (c <= 0) return n * (n - 1) / 2;
  int64_t s = c + 1;
  int64_t r = rep(n, s);
  return r * n - binom(s + r, s + 1);
}

// Optimal advance length m for splitting [0, n) with c spare slots: scan all
// m using the closed-form costs (cheap) for exactness.
int64_t best_split(int64_t n, int64_t c) {
  int64_t best_m = 1;
  int64_t best_cost = INT64_MAX;
  for (int64_t m = 1; m < n; ++m) {
    int64_t cost = m + t_opt(m, c) + t_opt(n - m, c - 1);
    if (cost < best_cost) {
      best_cost = cost;
      best_m = m;
    }
  }
  return best_m;
}

// Reverse steps [b, e); precondition: state at node b is stored.
void plan_range(Plan& p, int64_t b, int64_t e, int64_t c) {
  if (p.overflow) return;
  int64_t n = e - b;
  if (n <= 0) return;
  if (n == 1) {
    p.emit(0, b);  // RESTORE b
    p.emit(3, b);  // REVERSE b
    return;
  }
  if (c <= 0) {
    // no spare slots: re-advance from b for every step, most recent first
    for (int64_t k = e - 1; k >= b; --k) {
      p.emit(0, b);
      if (k > b) p.emit(1, k);  // ADVANCE to k
      p.emit(3, k);
    }
    return;
  }
  int64_t m = best_split(n, c);
  p.emit(0, b);       // RESTORE b
  p.emit(1, b + m);   // ADVANCE to b+m
  p.emit(2, b + m);   // STORE b+m
  plan_range(p, b + m, e, c - 1);
  p.emit(4, b + m);   // DROP b+m
  plan_range(p, b, b + m, c);
}

}  // namespace

extern "C" {

// Fills ops/args (caller-allocated, capacity cap); returns the number of
// actions, or -1 on overflow. n = number of steps, c = spare checkpoint
// slots (the initial state has its own implicit slot).
int64_t revolve_plan(int64_t n, int64_t c, int64_t* ops, int64_t* args,
                     int64_t cap) {
  Plan p{ops, args, cap, 0, false};
  plan_range(p, 0, n, c);
  return p.overflow ? -1 : p.len;
}

// Closed-form minimal recompute cost (for planning/telemetry).
int64_t revolve_cost(int64_t n, int64_t c) { return t_opt(n, c); }

}  // extern "C"
