"""SqueezeNext ODE-net for CIFAR-10 (flax).

Rebuild of /root/reference/examples-pnode/models/sqnxt_PETSc.py: the
SqNxt-23 backbone where each stage's residual blocks after the first are
replaced by ODE blocks integrating the BasicBlock2 dynamics over [0, 1]
(train-Cifar10.py ODEBlock_PNODE, :104-143).

Norm layers: the reference keeps torch BatchNorm in train mode inside the
ODE dynamics (batch statistics recomputed at every f evaluation). The pure
equivalent here is ``BatchStatsNorm`` — normalize by the current batch's
statistics with learnable affine, no running averages — which keeps the
dynamics a pure function of (t, y, params) as the scan-compiled solver
requires. (Eval-time behavior therefore matches train-mode BN; the
reference's eval-time running-stats BN is a documented deviation.)
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchStatsNorm(nn.Module):
    """Normalize over (batch, H, W) per channel with learnable affine.

    Statistics are always computed in f32 (bf16 mean/var over 128k
    elements loses whole digits); the result is cast back to the input
    dtype so the mixed-precision activation stream stays bf16.

    For LARGE inputs the statistics ride one fused sibling reduction
    (E[x], E[x^2]; var = E[x^2] - E[x]^2, clamped at 0) instead of
    jnp.var's separate centered pass: measured on the chip this takes a
    stage-1 SqNxt dynamics eval from 96 to 79 us (tools/profile_cifar.py)
    but LOSES ~17% on tiny stage-4 tensors where the extra x*x pass
    costs more than the saved reduction — hence the size gate. The
    uncentered form is safe here: conv outputs have O(1) mean/var, so
    f32 cancellation noise is ~1e-7 relative, far below the norm's eps."""

    eps: float = 1e-5
    # single-pass stats above ~1M f32 elements (measured crossover)
    single_pass_min_size: int = 1 << 20

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes)
        if x.size >= self.single_pass_min_size:
            m2 = jnp.mean(x32 * x32, axis=axes)
            var = jnp.maximum(m2 - mean * mean, 0.0)
        else:
            var = jnp.var(x32, axis=axes)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        out = (x32 - mean) / jnp.sqrt(var + self.eps) * scale + bias
        return out.astype(x.dtype)


def _conv(ch, ksize, stride=1, dtype=None):
    if isinstance(ksize, int):
        ksize = (ksize, ksize)
    return nn.Conv(ch, ksize, strides=(stride, stride), padding="SAME",
                   use_bias=True, dtype=dtype)


class BasicBlock(nn.Module):
    """SqueezeNext residual block (sqnxt_PETSc.py BasicBlock, :8-68)."""

    in_channels: int
    out_channels: int
    stride: int = 1
    dtype: object = None  # compute/activation dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        red = 0.5
        if self.stride == 2:
            red = 1.0
        elif self.in_channels > self.out_channels:
            red = 0.25
        c1 = int(self.in_channels * red)
        c2 = int(self.in_channels * red * 0.5)
        dt = self.dtype

        h = nn.relu(BatchStatsNorm()(_conv(c1, 1, self.stride, dt)(x)))
        h = nn.relu(BatchStatsNorm()(_conv(c2, 1, dtype=dt)(h)))
        h = nn.relu(BatchStatsNorm()(_conv(c1, (1, 3), dtype=dt)(h)))
        h = nn.relu(BatchStatsNorm()(_conv(c1, (3, 1), dtype=dt)(h)))
        h = nn.relu(BatchStatsNorm()(_conv(self.out_channels, 1,
                                           dtype=dt)(h)))
        if self.stride == 2 or self.in_channels != self.out_channels:
            sc = nn.relu(BatchStatsNorm()(_conv(self.out_channels, 1,
                                                self.stride, dt)(x)))
        else:
            sc = nn.relu(x)
        return nn.relu(h + sc)


class ODEDynamics(nn.Module):
    """BasicBlock2: the conv stack without residual, as f(t, y)
    (sqnxt_PETSc.py BasicBlock2, :71-121)."""

    dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, t, x):
        c1 = int(self.dim * 0.5)
        c2 = int(self.dim * 0.25)
        dt = self.dtype
        h = nn.relu(BatchStatsNorm()(_conv(c1, 1, dtype=dt)(x)))
        h = nn.relu(BatchStatsNorm()(_conv(c2, 1, dtype=dt)(h)))
        h = nn.relu(BatchStatsNorm()(_conv(c1, (1, 3), dtype=dt)(h)))
        h = nn.relu(BatchStatsNorm()(_conv(c1, (3, 1), dtype=dt)(h)))
        h = nn.relu(BatchStatsNorm()(_conv(self.dim, 1, dtype=dt)(h)))
        return h


class Stem(nn.Module):
    width_x: float = 1.0
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return nn.relu(
            BatchStatsNorm()(_conv(int(self.width_x * 64), 3,
                                   dtype=self.dtype)(x))
        )


class Head(nn.Module):
    width_x: float = 1.0
    num_classes: int = 10
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        h = nn.relu(BatchStatsNorm()(_conv(int(self.width_x * 128), 1,
                                           dtype=self.dtype)(x)))
        h = nn.avg_pool(h, (4, 4), strides=(4, 4))
        h = h.reshape(h.shape[0], -1)
        # logits in f32 regardless of the activation stream (loss stability)
        return nn.Dense(self.num_classes,
                        dtype=self.dtype)(h).astype(jnp.float32)


class SqueezeNextODE:
    """SqNxt-23 with ODE stages: orchestrates flax pieces + ODE solves.

    Functional API:
        model = SqueezeNextODE(num_classes=10, method="rk4", Nt=2)
        params = model.init(key, x)           # list of pytrees
        logits = model.apply(params, x, training=True)
    """

    # SqNxt_23: blocks per stage (sqnxt_PETSc.py SqNxt_23_1x: [6,6,8,1])
    BLOCKS = (6, 6, 8, 1)
    STAGE_CH = (32, 64, 128, 256)
    STAGE_STRIDE = (1, 2, 2, 2)

    def __init__(self, num_classes: int = 10, width_x: float = 1.0,
                 method: str = "rk4", Nt: int = 2, t1: float = 1.0,
                 enable_adjoint: bool = True, dtype=None,
                 use_pallas: str = "auto"):
        """``dtype="bf16"``/``jnp.bfloat16`` selects mixed-precision
        training: parameters and their gradients stay f32 (flax casts at
        each conv), norm statistics and logits are computed in f32, but
        the activation stream AND the ODE state/trajectory are bf16 —
        halving the HBM traffic this conv-bound workload sits on (bench:
        hbm_frac > 1 at f32). TPU-native capability beyond the reference
        (PETSc builds are fp32/fp64 only).

        ``use_pallas``: "auto" (fused ODE-dynamics Pallas kernel on TPU
        where the stage fits VMEM — ops/fused_sqnxt.py), "off", "on",
        or "interpret" (CPU testing). The CIFAR step is op-latency bound
        (~5 us/op floor x ~13 ops/eval, tools/profile_cifar.py); the
        fused kernel evaluates the whole conv/norm/relu chain in one
        launch on a lane-dense (C, N) layout, converting layouts once
        per RUN of consecutive ODE blocks (a stage), not per eval."""
        from ..solver import ODESolver

        if isinstance(dtype, str):
            dtype = {"f32": None, "float32": None,
                     "bf16": jnp.bfloat16,
                     "bfloat16": jnp.bfloat16}[dtype]
        self.width_x = width_x
        self.method = method
        self.step_size = t1 / float(Nt)
        self.t1 = t1
        self._ODESolver = ODESolver
        self.enable_adjoint = enable_adjoint
        self.dtype = dtype

        self.pieces = [("stem", Stem(width_x, dtype=dtype))]
        in_ch = 64
        for si, (nblocks, ch, stride) in enumerate(
            zip(self.BLOCKS, self.STAGE_CH, self.STAGE_STRIDE)
        ):
            self.pieces.append((
                "entry",
                BasicBlock(int(width_x * in_ch), int(width_x * ch), stride,
                           dtype=dtype),
            ))
            for _ in range(nblocks - 1):
                self.pieces.append(
                    ("ode", ODEDynamics(int(width_x * ch), dtype=dtype))
                )
            in_ch = ch
        self.pieces.append(("head", Head(width_x, num_classes, dtype=dtype)))
        self._solvers = {}
        self._init_jit = None
        if use_pallas not in ("auto", "off", "on", "interpret"):
            raise ValueError(f"use_pallas={use_pallas!r}: "
                             "auto|off|on|interpret")
        self.use_pallas = use_pallas

    # -- parameter init ---------------------------------------------------

    def init(self, key, x):
        """Initialize all piece params as ONE jitted program: the eager
        per-op version dispatches thousands of tiny conv/norm ops for the
        shape-propagating forwards (minutes of host wall time on slow
        hosts / tunneled backends)."""
        if self._init_jit is None:
            self._init_jit = jax.jit(self._init_impl)
        return self._init_jit(key, x)

    def _init_impl(self, key, x):
        params = []
        h = x
        keys = jax.random.split(key, len(self.pieces))
        for k, (kind, mod) in zip(keys, self.pieces):
            if kind == "ode":
                p = mod.init(k, 0.0, h)
                params.append(p)
                # state shape unchanged by the ODE block
            else:
                p = mod.init(k, h)
                params.append(p)
                h = mod.apply(p, h)
        return params

    def _ode_solver(self, mod, shape, dtype):
        # key on the module CONFIG, not identity: all ODE blocks of a stage
        # share one dim, hence one traced solver (flax modules are pure
        # functions of their hyperparameters) — ~4x less host tracing than
        # one solver per block instance
        key = (repr(mod), shape, str(dtype))
        ode = self._solvers.get(key)
        if ode is None:
            ode = self._ODESolver()
            ode.setupTS(
                jnp.zeros(shape, dtype),
                ((lambda t, y, p, m=mod: m.apply(p, t, y)), {}),
                step_size=self.step_size,
                method=self.method,
                enable_adjoint=self.enable_adjoint,
            )
            self._solvers[key] = ode
        return ode

    def _fused_meta(self, mod, shape, dtype):
        """fused-kernel meta for this stage, or None (gated off).

        ``auto`` resolves to the XLA path: the fused conv-chain kernels
        are a measured NON-win at CIFAR shapes (same-session fetch-sync
        A/B, RESULTS.md round 5 — whole-chain on stages 2-3 is neutral
        because those stages sit at the per-op floor, and LAYERED
        stage-1 kernels are -23% end-to-end: forward neutral 11.1 vs
        10.7 ms, hand-written backward 28.0 vs XLA autodiff's 22.0 ms).
        ``on`` opts in explicitly: whole-chain kernel when its backward
        resident set fits the raised VMEM limit (ops/vmem.py), else
        LAYERED mode (one kernel per layer, full-N exact batch stats —
        the CIFAR stage-1 chain kernel needs ~170 MB), else None."""
        if self.use_pallas in ("off", "auto"):
            return None
        from ..ops import fused_sqnxt as fs
        from ..ops.vmem import vmem_limit_bytes

        interp = self.use_pallas == "interpret"
        if not fs.fused_sqnxt_available(interp):
            return None
        B, H, W, C = shape
        meta = fs.make_meta(mod.dim, B, H, W, dtype, interpret=interp)
        if (not interp
                and fs.vmem_estimate_bytes(meta) > vmem_limit_bytes()):
            meta = fs.make_meta(mod.dim, B, H, W, dtype,
                                interpret=interp, layered=True)
            if fs.vmem_estimate_layered_bytes(meta) > vmem_limit_bytes():
                return None
        return meta

    def _ode_solver_fused(self, mod, meta, dtype):
        from ..ops import fused_sqnxt as fs

        key = ("fused", repr(mod), meta, str(dtype))
        ode = self._solvers.get(key)
        if ode is None:
            ode = self._ODESolver()
            ode.setupTS(
                jnp.zeros((meta.cdims[0], meta.n_pad), dtype),
                ((lambda t, y, p, m=meta: fs.fused_sqnxt_dyn(y, p, m)),
                 {}),
                step_size=self.step_size,
                method=self.method,
                enable_adjoint=self.enable_adjoint,
            )
            self._solvers[key] = ode
        return ode

    def apply(self, params, x, training: bool = True):
        import numpy as np

        h = x
        t_out = np.array([self.t1])  # single output time (ODEBlock_PNODE:119)
        cn_meta = None  # non-None while h rides the fused (C, N) layout
        nhwc = None  # the (B, H, W, C) shape h had before to_cn
        from ..ops import fused_sqnxt as fs

        for p, (kind, mod) in zip(params, self.pieces):
            if kind == "ode":
                meta = (cn_meta if cn_meta is not None
                        else self._fused_meta(mod, h.shape, h.dtype))
                if meta is not None:
                    if cn_meta is None:
                        nhwc = h.shape
                        h = fs.to_cn(h, meta)
                        cn_meta = meta
                    ode = self._ode_solver_fused(mod, meta, h.dtype)
                else:
                    ode = self._ode_solver(mod, h.shape, h.dtype)
                sol, _ = ode.solve(
                    h, t_out, params=p,
                    with_adjoint=training and self.enable_adjoint,
                )
                h = sol[-1]
            else:
                if cn_meta is not None:
                    h = fs.from_cn(h, nhwc[0], nhwc[1], nhwc[2])
                    cn_meta = None
                h = mod.apply(p, h)
        return h

    @property
    def nfe_per_forward(self):
        n_ode = sum(1 for kind, _ in self.pieces if kind == "ode")
        from ..tableaus import get_rk_tableau

        stages = get_rk_tableau(self.method).stages
        steps = int(round(self.t1 / self.step_size))
        return n_ode * stages * steps
