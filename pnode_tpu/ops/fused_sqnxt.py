"""Fused SqueezeNext ODE-dynamics Pallas kernels (CIFAR-10 ODE-net).

Why: the CIFAR-10 step is op-latency bound, not FLOP bound. Each
ODEDynamics evaluation (models/sqnxt.py, rebuilding the reference's
BasicBlock2 — /root/reference/examples-pnode/models/sqnxt_PETSc.py:71-121)
is a 5-deep conv/batch-stats-norm/relu chain that XLA schedules as ~13
small ops; at CIFAR stage shapes each op is ~1-2 MB and the chip's ~5
us/op scheduling floor dominates (60-116 us/eval measured,
tools/profile_cifar.py). One Pallas kernel evaluates the whole chain with
everything VMEM-resident, replacing ~13 ops with 1; the backward is a
second fused kernel (recompute-from-x, then stage-exact backprop),
wired with jax.custom_vjp.

Layout: activations ride as (C, N) with channels on SUBLANES and
N = B*H*W on LANES (b-major, then i, then j). CIFAR channel counts
(8..64) would waste up to 8x of every 128-wide lane tile in the natural
NHWC layout; (C, N) keeps lanes dense. The (1,3)/(3,1) convs become
lane-shifted matmuls: shift by +-1 (j taps) or +-W (i taps) with
boundary masks built from an in-kernel lane iota.

Numerics match the XLA path (models/sqnxt.py) op-for-op: conv matmuls
accumulate f32 and cast to the activation dtype before the bias add;
norm statistics are f32 with the same single-pass-vs-centered size gate
as BatchStatsNorm; the affine output is cast to the activation dtype
BEFORE the relu. The backward replicates autodiff's dtype round-trips
(cotangents carry the primal dtype between layers).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .fused_mlp import fused_mlp_available  # live platform check

_EPS = 1e-5
_SINGLE_PASS_MIN = 1 << 20  # BatchStatsNorm.single_pass_min_size


class SqnxtMeta(NamedTuple):
    """Static description of the 5-layer chain.

    taps[l]: tuple of lane shifts for layer l's conv taps (0 for 1x1;
    (-1, 0, 1) for (1,3); (-W, 0, W) for (3,1) — shift s means the tap
    reads h[:, n+s]).
    axis[l]: "j" | "i" | None — which image axis the taps move along
    (selects the boundary mask); None for 1x1.
    cdims: (C0, C1, ..., C5) channel counts.
    single_pass[l]: BatchStatsNorm size-gate verdict for layer l's output.
    """

    taps: Tuple[Tuple[int, ...], ...]
    axis: Tuple[object, ...]
    cdims: Tuple[int, ...]
    single_pass: Tuple[bool, ...]
    H: int
    W: int
    n_real: int
    n_pad: int
    dtype: str
    interpret: bool
    # layered mode: one Pallas kernel PER LAYER instead of the whole
    # 5-layer chain in one kernel. Each layer kernel still sees the full
    # N axis, so the batch statistics stay exact with no cross-tile
    # machinery; only one layer's buffers are VMEM-resident at a time,
    # which is what lets the big stage-1 shape (c=32 @ 32x32 x b128)
    # fuse at all. Costs vs the chain kernel: the inter-layer activation
    # round-trips HBM and each eval pays 5 launches instead of 1.
    layered: bool = False


def make_meta(dim: int, B: int, H: int, W: int, dtype,
              interpret: bool = False, layered: bool = False) -> SqnxtMeta:
    """Chain spec for ODEDynamics(dim): 1x1 D->c1, 1x1 c1->c2, (1,3)
    c2->c1, (3,1) c1->c1, 1x1 c1->D (sqnxt_PETSc.py BasicBlock2)."""
    c1, c2 = int(dim * 0.5), int(dim * 0.25)
    cdims = (dim, c1, c2, c1, c1, dim)
    taps = ((0,), (0,), (-1, 0, 1), (-W, 0, W), (0,))
    axis = (None, None, "j", "i", None)
    n_real = B * H * W
    n_pad = int(np.ceil(n_real / 128) * 128)
    single = tuple(n_real * c >= _SINGLE_PASS_MIN for c in cdims[1:])
    return SqnxtMeta(taps, axis, cdims, single, H, W, n_real, n_pad,
                     jnp.dtype(dtype).name, bool(interpret),
                     bool(layered))


def _lane_shift(h, s):
    """out[:, n] = h[:, n+s], zero-filled at the global edge."""
    if s == 0:
        return h
    C, N = h.shape
    z = jnp.zeros((C, abs(s)), h.dtype)
    if s > 0:
        return jnp.concatenate([h[:, s:], z], axis=1)
    return jnp.concatenate([z, h[:, : N + s]], axis=1)


def _tap_masks(meta: SqnxtMeta, dtype):
    """(1, N) validity masks per (axis, shift), from a lane iota.

    For a j tap with shift s (s in {-1,+1}): source j+s must be in
    [0, W). For an i tap (s = +-W): source i+-1 must be in [0, H).
    Padded lanes never feed real lanes: the real boundary lanes are
    image-edge lanes, which the masks zero.
    """
    n = jax.lax.broadcasted_iota(jnp.int32, (1, meta.n_pad), 1)
    jm = n % meta.W
    im = (n // meta.W) % meta.H
    masks = {}
    for ax, s_img in (("j", -1), ("j", 1), ("i", -1), ("i", 1)):
        coord = jm if ax == "j" else im
        lim = meta.W if ax == "j" else meta.H
        ok = jnp.logical_and(coord + s_img >= 0, coord + s_img < lim)
        masks[(ax, s_img)] = ok.astype(dtype)
    return masks


def _valid_mask(meta: SqnxtMeta, dtype):
    if meta.n_pad == meta.n_real:
        return None
    n = jax.lax.broadcasted_iota(jnp.int32, (1, meta.n_pad), 1)
    return (n < meta.n_real).astype(dtype)


def _conv_apply(h, Ws, meta, li, masks, acc_dtype=jnp.float32):
    """z32 = sum_t W_t @ shifted_t(h) in f32."""
    z = None
    for t, s in enumerate(meta.taps[li]):
        hk = _lane_shift(h, s)
        if s != 0:
            s_img = 1 if s > 0 else -1
            hk = hk * masks[(meta.axis[li], s_img)]
        d = jnp.dot(Ws[t], hk, preferred_element_type=acc_dtype)
        z = d if z is None else z + d
    return z


def _layer_fwd(h, z32, b, gam, bet, meta, li, valid):
    """bias + BatchStatsNorm + relu, matching models/sqnxt.py order.

    Returns (h_next, z_d, m, sr): z_d is the stored-dtype conv+bias
    output (the recompute anchor), m/sr the f32 stats.
    """
    dt = h.dtype
    z_d = z32.astype(dt) + b.astype(dt)
    if valid is not None:
        z_d = z_d * valid.astype(dt)
    zf = z_d.astype(jnp.float32)
    inv_n = 1.0 / meta.n_real
    m = jnp.sum(zf, axis=1, keepdims=True) * inv_n
    if meta.single_pass[li]:
        m2 = jnp.sum(zf * zf, axis=1, keepdims=True) * inv_n
        var = jnp.maximum(m2 - m * m, 0.0)
    else:
        zc = zf - m
        if valid is not None:
            zc = zc * valid
        var = jnp.sum(zc * zc, axis=1, keepdims=True) * inv_n
    sr = jnp.sqrt(var + _EPS)
    a = (zf - m) / sr * gam + bet
    h_next = jnp.maximum(a.astype(dt), 0)
    if valid is not None:
        h_next = h_next * valid.astype(dt)
    return h_next, z_d, m, sr


def _split_params(flat, meta):
    """flat -> per-layer (Ws, b, gam, bet)."""
    out, i = [], 0
    for li in range(5):
        nt = len(meta.taps[li])
        Ws = flat[i: i + nt]
        b, gam, bet = flat[i + nt], flat[i + nt + 1], flat[i + nt + 2]
        out.append((Ws, b, gam, bet))
        i += nt + 3
    return out


def _fwd_kernel(meta, x_ref, *refs):
    out_ref = refs[-1]
    flat = [r[:] for r in refs[:-1]]
    layers = _split_params(flat, meta)
    dt = x_ref.dtype
    masks = _tap_masks(meta, dt)
    valid = _valid_mask(meta, jnp.float32)
    h = x_ref[:]
    for li, (Ws, b, gam, bet) in enumerate(layers):
        z32 = _conv_apply(h, Ws, meta, li, masks)
        h, _, _, _ = _layer_fwd(h, z32, b, gam, bet, meta, li, valid)
    out_ref[:] = h


def _bwd_kernel(meta, x_ref, g_ref, *refs):
    """Recompute the chain from x, then backprop stage-exactly.

    refs = params..., dx_ref, dparam refs (same structure as params, all
    f32), then 5 VMEM scratch refs (one per-layer conv+bias anchor).

    Liveness: the anchors ride explicit VMEM scratch and the previous
    layer's activation is RECOMPUTED elementwise from its anchor instead
    of being kept live — with all six layer inputs + five anchors held in
    vregs, Mosaic's register allocator spilled 146 MB at the CIFAR
    stage-1 shape (32 x 131072) and the kernel did not compile. This
    structure keeps at most one layer's tensors live at a time.
    """
    n_param = sum(len(t) + 3 for t in meta.taps)
    flat = [r[:] for r in refs[:n_param]]
    dx_ref = refs[n_param]
    drefs = refs[n_param + 1: n_param + 1 + n_param]
    z_scr = refs[n_param + 1 + n_param:]
    layers = _split_params(flat, meta)
    dt = x_ref.dtype
    masks = _tap_masks(meta, dt)
    valid = _valid_mask(meta, jnp.float32)

    # forward recompute: anchors to scratch, single live activation
    ms, srs = [], []
    h = x_ref[:]
    for li, (Ws, b, gam, bet) in enumerate(layers):
        z32 = _conv_apply(h, Ws, meta, li, masks)
        h, z_d, m, sr = _layer_fwd(h, z32, b, gam, bet, meta, li, valid)
        z_scr[li][:] = z_d
        ms.append(m)
        srs.append(sr)

    def _act(li):
        """Layer li's INPUT, recomputed from the (li-1) anchor — exactly
        _layer_fwd's h_next expression."""
        if li == 0:
            return x_ref[:]
        _, _, gam_p, bet_p = layers[li - 1]
        zf_p = z_scr[li - 1][:].astype(jnp.float32)
        a_p = (zf_p - ms[li - 1]) / srs[li - 1] * gam_p + bet_p
        h_p = jnp.maximum(a_p.astype(dt), 0)
        if valid is not None:
            h_p = h_p * valid.astype(dt)
        return h_p

    g = g_ref[:]  # cotangent in activation dtype
    dflat = [None] * n_param
    for li in range(4, -1, -1):
        Ws, b, gam, bet = layers[li]
        z_d, m, sr = z_scr[li][:], ms[li], srs[li]
        zf = z_d.astype(jnp.float32)
        zh = (zf - m) / sr
        a_d = (zh * gam + bet).astype(dt)
        # relu mask on the f32 upcast (exact): v5e Mosaic rejects
        # vector cmpf on bf16 ("Target does not support this comparison")
        g_a = jnp.where(a_d.astype(jnp.float32) > 0, g, 0).astype(
            jnp.float32)
        if valid is not None:
            g_a = g_a * valid
        d_gam = jnp.sum(g_a * zh, axis=1, keepdims=True)
        d_bet = jnp.sum(g_a, axis=1, keepdims=True)
        g_zh = g_a * gam
        inv_n = 1.0 / meta.n_real
        c1 = jnp.sum(g_zh, axis=1, keepdims=True) * inv_n
        c2 = jnp.sum(g_zh * zh, axis=1, keepdims=True) * inv_n
        g_z32 = (g_zh - c1 - zh * c2) / sr
        if valid is not None:
            g_z32 = g_z32 * valid
        g_zd = g_z32.astype(dt)
        d_b = jnp.sum(g_zd.astype(jnp.float32), axis=1, keepdims=True)
        h_prev = _act(li)
        g_h = None
        d_Ws = []
        for t, s in enumerate(meta.taps[li]):
            hk = _lane_shift(h_prev, s)
            if s != 0:
                s_img = 1 if s > 0 else -1
                mk = masks[(meta.axis[li], s_img)]
                hk = hk * mk
            dW = jax.lax.dot_general(
                g_zd, hk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # autodiff's cotangent dtype round-trip (bf16 W cast)
            d_Ws.append(dW.astype(dt).astype(jnp.float32))
            gk = jax.lax.dot_general(
                Ws[t], g_zd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if s != 0:
                gk = gk * masks[(meta.axis[li], 1 if s > 0 else -1)
                                ].astype(jnp.float32)
                gk = _lane_shift(gk, -s)
            g_h = gk if g_h is None else g_h + gk
        g = g_h.astype(dt)
        # write this layer's param grads (flat order within layer:
        # taps..., b, gam, bet)
        base = sum(len(meta.taps[k]) + 3 for k in range(li))
        for t in range(len(meta.taps[li])):
            dflat[base + t] = d_Ws[t]
        dflat[base + len(meta.taps[li])] = d_b
        dflat[base + len(meta.taps[li]) + 1] = d_gam
        dflat[base + len(meta.taps[li]) + 2] = d_bet
    dx_ref[:] = g
    for r, v in zip(drefs, dflat):
        r[:] = v.astype(r.dtype)


def vmem_estimate_bytes(meta: SqnxtMeta) -> int:
    """Rough resident-set model for the BACKWARD kernel (the bigger one):
    x + g + dx + all layer anchors z_l (dtype) + ~4 live f32 temps at the
    widest layer. Used by callers to gate the fused path."""
    esize = 2 if meta.dtype == "bfloat16" else 4

    def buf(c, e=esize):
        rows = max(c, 16 if e == 2 else 8)
        return rows * meta.n_pad * e

    total = buf(meta.cdims[0]) * 3  # x, dx, g(out-ish)
    total += sum(buf(c) for c in meta.cdims[1:])  # z anchors
    total += 4 * buf(max(meta.cdims), 4)  # live f32 temps
    return int(total)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _core(x, flat, meta):
    return _call_fwd(x, flat, meta)


def _call_fwd(x, flat, meta):
    from .vmem import tpu_compiler_params

    return pl.pallas_call(
        functools.partial(_fwd_kernel, meta),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(flat)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=meta.interpret,
        **({} if meta.interpret else
           {"compiler_params": tpu_compiler_params()}),
    )(x, *flat)


def _core_fwd(x, flat, meta):
    return _call_fwd(x, flat, meta), (x, flat)


def _core_bwd(meta, res, g):
    x, flat = res
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    for f in flat:
        out_shapes.append(jax.ShapeDtypeStruct(f.shape, jnp.float32))
    from .vmem import tpu_compiler_params

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, meta),
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(flat)),
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
        ),
        scratch_shapes=[
            pltpu.VMEM((c, meta.n_pad), x.dtype) for c in meta.cdims[1:]
        ],
        interpret=meta.interpret,
        **({} if meta.interpret else
           {"compiler_params": tpu_compiler_params()}),
    )(x, g, *flat)
    dx = outs[0]
    dflat = tuple(o.astype(f.dtype) for o, f in zip(outs[1:], flat))
    return dx, dflat


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# flax-facing wrapper


def pack_params(params, meta: SqnxtMeta, dtype) -> Tuple[jnp.ndarray, ...]:
    """flax ODEDynamics param pytree -> flat kernel arg tuple.

    Per layer: [W_tap... (Cout, Cin) dtype] + [b (Cout,1) dtype] +
    [gamma (Cout,1) f32] + [beta (Cout,1) f32]. Differentiable —
    gradients flow back to the pytree through these transposes.
    """
    p = params["params"] if "params" in params else params
    flat = []
    for li in range(5):
        k = p[f"Conv_{li}"]["kernel"]  # (kh, kw, Cin, Cout)
        kh, kw, cin, cout = k.shape
        ntap = kh * kw
        taps = k.reshape(ntap, cin, cout)
        for t in range(ntap):
            flat.append(jnp.transpose(taps[t]).astype(dtype))
        flat.append(p[f"Conv_{li}"]["bias"].reshape(-1, 1).astype(dtype))
        flat.append(
            p[f"BatchStatsNorm_{li}"]["scale"].reshape(-1, 1)
            .astype(jnp.float32))
        flat.append(
            p[f"BatchStatsNorm_{li}"]["bias"].reshape(-1, 1)
            .astype(jnp.float32))
    return tuple(flat)


def fused_sqnxt_dyn(x_cn: jnp.ndarray, params, meta: SqnxtMeta):
    """Evaluate the ODEDynamics chain on a (C, N) state in ONE kernel
    (``meta.layered``: one kernel per layer — big-stage shapes whose full
    chain exceeds VMEM).

    x_cn: (dim, n_pad) activation-dtype array (lane-padded); params: the
    flax ODEDynamics variables. Returns (dim, n_pad). Differentiable wrt
    both.
    """
    flat = pack_params(params, meta, x_cn.dtype)
    if meta.layered:
        return _core_layered(x_cn, flat, meta)
    return _core(x_cn, flat, meta)


def to_cn(x: jnp.ndarray, meta: SqnxtMeta) -> jnp.ndarray:
    """(B, H, W, C) -> lane-padded (C, N)."""
    n, c = x.shape[0] * x.shape[1] * x.shape[2], x.shape[3]
    h = x.reshape(n, c).T
    if meta.n_pad != n:
        h = jnp.pad(h, ((0, 0), (0, meta.n_pad - n)))
    return h


def from_cn(h: jnp.ndarray, B: int, H: int, W: int) -> jnp.ndarray:
    """lane-padded (C, N) -> (B, H, W, C)."""
    c = h.shape[0]
    return h[:, : B * H * W].T.reshape(B, H, W, c)


def fused_sqnxt_available(interpret: bool = False) -> bool:
    return fused_mlp_available(interpret)


def xla_reference(x_cn, params, meta: SqnxtMeta):
    """Same math in plain jnp on the (C, N) layout — the test oracle for
    interpret-mode exactness (the flax module itself is the ground truth
    for layout-conversion tests)."""
    flat = pack_params(params, meta, x_cn.dtype)
    layers = _split_params(flat, meta)
    masks = _tap_masks(meta, x_cn.dtype)
    valid = _valid_mask(meta, jnp.float32)
    h = x_cn
    for li, (Ws, b, gam, bet) in enumerate(layers):
        z32 = _conv_apply(h, Ws, meta, li, masks)
        h, _, _, _ = _layer_fwd(h, z32, b, gam, bet, meta, li, valid)
    return h


# ---------------------------------------------------------------------------
# Layered mode: one kernel per layer (stage-1 shapes).
#
# The chain kernel holds x/g/dx + all five recompute anchors + live f32
# temps resident at once; at the CIFAR stage-1 shape (c=32 @ 32x32 x b128,
# N = 131072 lanes) that exceeds the ~120 MB measured VMEM budget and the
# gate keeps the XLA path (models/sqnxt.py). Layered mode splits the chain
# at layer boundaries: each kernel evaluates conv -> bias -> batch-stats
# norm -> relu for ONE layer with the FULL N axis resident, so the batch
# statistics are computed exactly inside the kernel — no grid tiling, no
# cross-tile partial-sum machinery — and the resident set is one layer's
# buffers (~3-6 x C*N) instead of the whole chain's. The inter-layer
# activation round-trips HBM (the XLA path round-trips EVERY op, ~13 per
# eval, so layered still cuts traffic ~2x and op count ~2.5x). Backward:
# one kernel per layer in reverse, recomputing z_l from the saved layer
# input (same recompute-from-anchor strategy as the chain kernel, at
# per-layer granularity); full-N reductions for the norm backward happen
# in-kernel, exactly.
# ---------------------------------------------------------------------------


def vmem_estimate_layered_bytes(meta: SqnxtMeta) -> int:
    """Resident-set model for the WORST single-layer backward kernel:
    h_in + g_out + dh + recomputed z (dtype) + ~4 live f32 temps at the
    wider of (Cin, Cout)."""
    esize = 2 if meta.dtype == "bfloat16" else 4

    def buf(c, e=esize):
        rows = max(c, 16 if e == 2 else 8)
        return rows * meta.n_pad * e

    worst = 0
    for li in range(5):
        cin, cout = meta.cdims[li], meta.cdims[li + 1]
        tot = buf(cin) + buf(cout) + buf(cin)      # h_in, g, dh
        tot += buf(cout)                           # z anchor (dtype)
        tot += 4 * buf(max(cin, cout), 4)          # live f32 temps
        worst = max(worst, tot)
    return int(worst)


def _layer_flat_slice(meta: SqnxtMeta, li: int):
    base = sum(len(meta.taps[k]) + 3 for k in range(li))
    return base, len(meta.taps[li]) + 3


def _fwd_layer_kernel(meta, li, h_ref, *refs):
    n_p = len(meta.taps[li]) + 3
    flat = [r[:] for r in refs[:n_p]]
    out_ref = refs[n_p]
    Ws = flat[: len(meta.taps[li])]
    b, gam, bet = flat[-3:]
    masks = _tap_masks(meta, h_ref.dtype)
    valid = _valid_mask(meta, jnp.float32)
    z32 = _conv_apply(h_ref[:], Ws, meta, li, masks)
    h_next, _, _, _ = _layer_fwd(h_ref[:], z32, b, gam, bet, meta, li,
                                 valid)
    out_ref[:] = h_next


def _bwd_layer_kernel(meta, li, h_ref, g_ref, *refs):
    """Single-layer backward: recompute z_l from the saved layer input,
    then the same stage-exact backprop block as the chain kernel."""
    n_p = len(meta.taps[li]) + 3
    flat = [r[:] for r in refs[:n_p]]
    dh_ref = refs[n_p]
    drefs = refs[n_p + 1: n_p + 1 + n_p]
    Ws = flat[: len(meta.taps[li])]
    b, gam, bet = flat[-3:]
    dt = h_ref.dtype
    masks = _tap_masks(meta, dt)
    valid = _valid_mask(meta, jnp.float32)

    h_prev = h_ref[:]
    z32 = _conv_apply(h_prev, Ws, meta, li, masks)
    _, z_d, m, sr = _layer_fwd(h_prev, z32, b, gam, bet, meta, li, valid)

    g = g_ref[:]
    zf = z_d.astype(jnp.float32)
    zh = (zf - m) / sr
    a_d = (zh * gam + bet).astype(dt)
    g_a = jnp.where(a_d.astype(jnp.float32) > 0, g, 0).astype(jnp.float32)
    if valid is not None:
        g_a = g_a * valid
    d_gam = jnp.sum(g_a * zh, axis=1, keepdims=True)
    d_bet = jnp.sum(g_a, axis=1, keepdims=True)
    g_zh = g_a * gam
    inv_n = 1.0 / meta.n_real
    c1 = jnp.sum(g_zh, axis=1, keepdims=True) * inv_n
    c2 = jnp.sum(g_zh * zh, axis=1, keepdims=True) * inv_n
    g_z32 = (g_zh - c1 - zh * c2) / sr
    if valid is not None:
        g_z32 = g_z32 * valid
    g_zd = g_z32.astype(dt)
    d_b = jnp.sum(g_zd.astype(jnp.float32), axis=1, keepdims=True)
    g_h = None
    d_Ws = []
    for t, s in enumerate(meta.taps[li]):
        hk = _lane_shift(h_prev, s)
        if s != 0:
            s_img = 1 if s > 0 else -1
            mk = masks[(meta.axis[li], s_img)]
            hk = hk * mk
        dW = jax.lax.dot_general(
            g_zd, hk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_Ws.append(dW.astype(dt).astype(jnp.float32))
        gk = jax.lax.dot_general(
            Ws[t], g_zd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if s != 0:
            gk = gk * masks[(meta.axis[li], 1 if s > 0 else -1)
                            ].astype(jnp.float32)
            gk = _lane_shift(gk, -s)
        g_h = gk if g_h is None else g_h + gk
    dh_ref[:] = g_h.astype(dt)
    dflat = d_Ws + [d_b, d_gam, d_bet]
    for r, v in zip(drefs, dflat):
        r[:] = v.astype(r.dtype)


def _call_layer_fwd(h, layer_flat, meta, li):
    from .vmem import tpu_compiler_params

    cout = meta.cdims[li + 1]
    return pl.pallas_call(
        functools.partial(_fwd_layer_kernel, meta, li),
        out_shape=jax.ShapeDtypeStruct((cout, meta.n_pad), h.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
            1 + len(layer_flat)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=meta.interpret,
        **({} if meta.interpret else
           {"compiler_params": tpu_compiler_params()}),
    )(h, *layer_flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _core_layered(x, flat, meta):
    h = x
    for li in range(5):
        base, n_p = _layer_flat_slice(meta, li)
        h = _call_layer_fwd(h, flat[base: base + n_p], meta, li)
    return h


def _core_layered_fwd(x, flat, meta):
    hs = []
    h = x
    for li in range(5):
        hs.append(h)
        base, n_p = _layer_flat_slice(meta, li)
        h = _call_layer_fwd(h, flat[base: base + n_p], meta, li)
    return h, (tuple(hs), flat)


def _core_layered_bwd(meta, res, g):
    from .vmem import tpu_compiler_params

    hs, flat = res
    dflat = [None] * len(flat)
    for li in range(4, -1, -1):
        base, n_p = _layer_flat_slice(meta, li)
        layer_flat = flat[base: base + n_p]
        cin = meta.cdims[li]
        out_shapes = [jax.ShapeDtypeStruct((cin, meta.n_pad), g.dtype)]
        for f in layer_flat:
            out_shapes.append(jax.ShapeDtypeStruct(f.shape, jnp.float32))
        outs = pl.pallas_call(
            functools.partial(_bwd_layer_kernel, meta, li),
            out_shape=tuple(out_shapes),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
                2 + n_p),
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in out_shapes),
            interpret=meta.interpret,
            **({} if meta.interpret else
               {"compiler_params": tpu_compiler_params()}),
        )(hs[li], g, *layer_flat)
        g = outs[0]
        for k, (o, f) in enumerate(zip(outs[1:], layer_flat)):
            dflat[base + k] = o.astype(f.dtype)
    return g, tuple(dflat)


_core_layered.defvjp(_core_layered_fwd, _core_layered_bwd)
