"""Fused Pallas gating kernel: ML association costs for M×K pairs.

The XLA gate (ops/association.gate_batch) is already strip-based and
gather-free; this kernel fuses the whole cost evaluation — Φ base assembly
from the pose/diagonal strips, per-measurement R add, 2×2 Mahalanobis
solve, signature cost — into ONE VMEM-resident pass over the landmark
tiles, emitting the [M,K] cost matrix without materializing any [K,2,2]
intermediates in HBM.

Inputs are the same precomputed strips the XLA path uses (all O(K), cheap
to produce):
  lm [K,2], sig [K], active [K] — landmark table slices of the state
  prr [3,3] — pose covariance block (broadcast, SMEM-sized)
  prl [K,6] — pose↔landmark strip, row-major (P[0:3, 3+2k:5+2k] flattened)
  pll [K,4] — landmark diagonal blocks flattened (p00, p01, p10, p11)
  pose [3], zs [M,3], rdiag [M,2]
Output: cost [M,K] (position + signature or signature-only upstream).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEG = 3.14159265358979323846 / 180.0


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _gate_kernel(pose_ref, prr_ref, zs_ref, rdiag_ref, lm_ref, zphi_ref,
                 sig_ref, act_ref, prl_ref, pll_ref, scost_ref, out_ref, *,
                 wrap_innovation: bool):
    # landmark tile data, transposed layout [rows, TK] (lane dim = TK);
    # strips kept 2-D [1, TK] so every op below is a well-shaped
    # (sublane, lane) VPU tile — the measurement axis broadcasts as
    # sublanes ([TM, 1] against [1, TK]), vectorizing the whole M×K block
    # in one shot instead of a per-measurement scalar loop.
    lx = lm_ref[0:1, :]
    ly = lm_ref[1:2, :]
    xr = pose_ref[0, 0]
    yr = pose_ref[0, 1]

    dx = lx - xr
    dy = ly - yr
    q = dx * dx + dy * dy
    q = jnp.where(q == 0.0, 1.0, q)
    sq = jnp.sqrt(q)
    inv_q = 1.0 / q

    # H blocks (Correspondence.m:62-63), rows r=(range), b=(bearing):
    # A = [[-sq dx, -sq dy, 0], [dy, -dx, -q]]/q ; B = [[sq dx, sq dy],
    # [-dy, dx]]/q
    a00 = -sq * dx * inv_q
    a01 = -sq * dy * inv_q
    a10 = dy * inv_q
    a11 = -dx * inv_q
    a12 = -1.0
    b00 = sq * dx * inv_q
    b01 = sq * dy * inv_q
    b10 = -dy * inv_q
    b11 = dx * inv_q

    p = prr_ref[:]                                         # [3,3] (VMEM)
    prl = prl_ref[:]                                       # [6,TK]
    pll = pll_ref[:]                                       # [4,TK]

    def prl_row(i):
        return prl[i:i + 1, :]

    def pll_row(i):
        return pll[i:i + 1, :]

    # Phi0 = A Prr A^T + A Prl B^T + B Prl^T A^T + B Pll B^T, unrolled.
    def arow(i, j):  # A[i,:] . Prr . A[j,:]
        ai = (a00, a01, jnp.zeros_like(q)) if i == 0 else (a10, a11,
                                                           a12 + 0 * q)
        aj = (a00, a01, jnp.zeros_like(q)) if j == 0 else (a10, a11,
                                                           a12 + 0 * q)
        s = 0.0
        for pp in range(3):
            for qq in range(3):
                s = s + ai[pp] * p[pp, qq] * aj[qq]
        return s

    A0 = (a00, a01, jnp.zeros_like(q))
    A1 = (a10, a11, a12 + 0 * q)
    B0 = (b00, b01)
    B1 = (b10, b11)

    def aprlb(Ai, Bj):   # A[i,:] . Prl_k . B[j,:]
        s = 0.0
        for pp in range(3):
            for qq in range(2):
                s = s + Ai[pp] * prl_row(2 * pp + qq) * Bj[qq]
        return s

    def bpllb(Bi, Bj):   # B[i,:] . Pll_k . B[j,:]
        return (Bi[0] * (pll_row(0) * Bj[0] + pll_row(1) * Bj[1])
                + Bi[1] * (pll_row(2) * Bj[0] + pll_row(3) * Bj[1]))

    phi00 = arow(0, 0) + 2.0 * aprlb(A0, B0) + bpllb(B0, B0)    # [1,TK]
    phi11 = arow(1, 1) + 2.0 * aprlb(A1, B1) + bpllb(B1, B1)
    phi01 = arow(0, 1) + aprlb(A0, B1) + aprlb(A1, B0) + bpllb(B0, B1)

    # predicted measurement: range in-kernel; bearing precomputed in XLA
    # (Mosaic has no atan2 lowering — the O(K) trig strip rides in)
    zr = sq                                                 # [1,TK]
    zphi = zphi_ref[0:1, :]

    act = act_ref[0:1, :] > 0.0
    sig = sig_ref[0:1, :]
    inv_scost = scost_ref[0, 0]

    # whole [TM, TK] block at once: measurement scalars enter as [TM, 1]
    # columns and broadcast against the [1, TK] landmark strips.
    zr_m = zs_ref[:, 0:1]
    zphi_m = zs_ref[:, 1:2]
    zsig_m = zs_ref[:, 2:3]
    r0 = rdiag_ref[:, 0:1]
    r1 = rdiag_ref[:, 1:2]

    n0 = zr_m - zr                                          # [TM,TK]
    n1 = zphi_m - zphi
    if wrap_innovation:
        n1 = n1 - jnp.floor((n1 + 180.0) / 360.0) * 360.0

    s00 = phi00 + r0
    s11 = phi11 + r1
    det = s00 * s11 - phi01 * phi01
    pos = (n0 * (s11 * n0 - phi01 * n1)
           + n1 * (-phi01 * n0 + s00 * n1)) / det
    sigc = (zsig_m - sig) * (zsig_m - sig) * inv_scost
    out_ref[:, :] = jnp.where(act, pos + sigc, jnp.inf)


@functools.partial(jax.jit,
                   static_argnames=("wrap_innovation", "interpret"))
def gate_costs_pallas(pose, prr, zs, rdiag, lm, sig, active, prl, pll,
                      s_cost, wrap_innovation: bool = True,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused [M,K] ML gating costs (position + signature).  See module doc
    for the strip layout; tile over K."""
    K = lm.shape[0]
    M = zs.shape[0]
    dt = lm.dtype
    TK = 512 if K >= 512 else _round_up(K, 128)
    Kp = _round_up(K, TK)
    # measurement-axis tile: whole batch when small, 256-row tiles beyond
    # (keeps the [TM,TK] live intermediates a few MB inside ~16 MB VMEM).
    TM = 256 if M > 256 else _round_up(M, 8)
    Mp = _round_up(M, TM)

    def padT(a, fill=0.0):
        """[K, r] -> padded transpose [r, Kp] (lane dim = landmarks)."""
        a = jnp.atleast_2d(a.astype(dt).T if a.ndim == 2 else a.astype(dt))
        out = jnp.full((a.shape[0], Kp), fill, dt)
        return out.at[:, :K].set(a)

    lm_p = padT(lm)                        # [2, Kp]
    sig_p = padT(sig)                      # [1, Kp]
    act_p = padT(active.astype(dt))        # [1, Kp]
    prl_p = padT(prl)                      # [6, Kp]
    pll_p = padT(pll)                      # [4, Kp]
    pose_p = pose.astype(dt).reshape(1, 3)
    scost = jnp.asarray(1.0 / s_cost, dt).reshape(1, 1)

    # bearing strip (wrapTo360(atan2d - theta)) computed in XLA — Mosaic
    # has no atan2 primitive.
    from ..angles import atan2d, wrap_to_360
    delta = lm.astype(dt) - pose[:2].astype(dt)
    zphi = wrap_to_360(atan2d(delta[:, 1], delta[:, 0])
                       - pose[2].astype(dt))
    zphi_p = padT(zphi)                    # [1, Kp]

    zs_p = jnp.zeros((Mp, 3), dt).at[:M].set(zs.astype(dt))
    rdiag_p = jnp.ones((Mp, 2), dt).at[:M].set(rdiag.astype(dt))

    kernel = functools.partial(_gate_kernel,
                               wrap_innovation=wrap_innovation)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // TM, Kp // TK),
        in_specs=[
            pl.BlockSpec((1, 3), lambda m, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 3), lambda m, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 3), lambda m, k: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 2), lambda m, k: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TK), lambda m, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK), lambda m, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK), lambda m, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK), lambda m, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TK), lambda m, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TK), lambda m, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda m, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TM, TK), lambda m, k: (m, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Kp), dt),
        interpret=interpret,
    )(pose_p, prr.astype(dt), zs_p, rdiag_p, lm_p,
      zphi_p, sig_p, act_p, prl_p, pll_p, scost)
    return out[:M, :K]


def strips_from_state(state):
    """Extract the kernel's strip inputs from a FilterState."""
    from ..association import _lm_diag_blocks
    P = state.P
    K = state.capacity
    end = 3 + 2 * K
    prl = P[:3, 3:end].reshape(3, K, 2).transpose(1, 0, 2).reshape(K, 6)
    pll = _lm_diag_blocks(P, K).reshape(K, 4)
    return state.landmarks, state.sig, state.active, P[:3, :3], prl, pll
