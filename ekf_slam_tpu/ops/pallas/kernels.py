"""Pallas TPU kernels for the engine's hot paths.

Two kernels carry the bandwidth/compute-critical work (BASELINE.json:
"masked Kalman gain solves and RANSAC hypothesis scoring as fused Pallas
kernels"):

* ``cov_update``: the rank-2M covariance correction ``P ← P − K·V`` — the
  single dominant data movement of the filter (P is 1.6 GB at 10k landmarks
  in f32).  Tiled over (row, col) blocks with the P buffer aliased in-place,
  so each element of P is read and written exactly once.  Measured on chip
  (experiments/chip_r2.py, BENCH r2): the full gate+update chain with this
  kernel is EQUAL to the XLA path at 1k (423k vs 417k up/s) and 12% SLOWER
  at 10k (28.5k vs 32.4k) — XLA's fused GEMM epilogue already achieves the
  one-read-one-write schedule and overlaps it with the gate.  Kept behind
  ``EKFParams.use_pallas`` as a measured experiment, not a default.
* ``score_lines``: RANSAC hypothesis scoring — point-line distance +
  threshold + masked popcount for NH candidate lines × B beams in one fused
  pass (the reference evaluates this per point, per line, in an interpreted
  loop, RANSAC.m:190-198).

Both have jnp reference implementations used as CPU fallbacks and test
oracles; ``use_pallas`` dispatches on the backend.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Rank-2M covariance update: P <- P - K @ V
# ---------------------------------------------------------------------------

def cov_update_ref(P: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray
                   ) -> jnp.ndarray:
    """jnp reference / CPU fallback."""
    return P - K @ V


def _cov_update_kernel(p_ref, k_ref, v_ref, o_ref):
    o_ref[:] = p_ref[:] - jnp.dot(k_ref[:], v_ref[:],
                                  preferred_element_type=p_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n",
                                             "interpret"))
def cov_update_pallas(P: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray,
                      tile_m: int = 256, tile_n: int = 512,
                      interpret: bool = False) -> jnp.ndarray:
    """Tiled in-place P − K·V.

    The P block is aliased to the output block, so HBM traffic is exactly
    one read + one write of P plus the (negligible) K/V tiles.  D = 3+2K
    is odd, so the grid ceil-divides and Pallas masks the ragged edge
    tiles (reads padded, out-of-bounds writes dropped)."""
    D = P.shape[0]
    R = K.shape[1]
    tile_m = min(tile_m, _round_up(D, 8))
    tile_n = min(tile_n, _round_up(D, 128))
    grid = (pl.cdiv(D, tile_m), pl.cdiv(D, tile_n))
    return pl.pallas_call(
        _cov_update_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, R), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * D * D * R,
            bytes_accessed=2 * D * D * P.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(P, K, V)


def cov_update(P: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray,
               use_pallas: bool = None) -> jnp.ndarray:
    """P − K·V with automatic backend dispatch (interpret mode off-TPU)."""
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        return cov_update_pallas(P, K, V, interpret=not _on_tpu())
    return cov_update_ref(P, K, V)


# ---------------------------------------------------------------------------
# Symmetric rank-R downdate (SYRK): P <- P - W @ W.T, half the MXU flops
# ---------------------------------------------------------------------------

def syrk_downdate_ref(P: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """jnp reference / CPU fallback: P − W·Wᵀ (accumulated in f32 when the
    storage dtype is narrower, mirroring the batched path's GEMM policy)."""
    acc = jnp.float32 if P.dtype in (jnp.bfloat16, jnp.float16) else P.dtype
    C = jnp.matmul(W, W.T, preferred_element_type=acc)
    return (P.astype(acc) - C).astype(P.dtype)


def _syrk_kernel(wi_idx, wj_idx, ss_ref, pr_idx, pc_idx,
                 p_ref, wi_ref, wj_ref, o_ref, acc_ref, *scr,
                 mirror="mxu"):
    """One grid step per (tile_i, tile_j) write of the output.

    The step list visits each lower-triangle pair (i ≥ j) with s=0, which
    computes acc = W_i·W_jᵀ on the MXU and writes block (i,j) = P_ij − acc;
    strictly-lower pairs are immediately followed by an s=1 step that
    writes the mirror block (j,i) = P_ji − accᵀ from the scratch
    accumulator WITHOUT recomputing — so the MXU does T(T+1)/2 tile
    contractions for T² tile writes: half the flops of the dense rank-R
    GEMM.  Every output block is written by exactly one step and every P
    block read by exactly one step (the s=1 read is the untouched upper
    block), so there are no revisit hazards; acc persists across the two
    consecutive steps of a pair (1-D grids execute sequentially)."""
    k = pl.program_id(0)
    s = ss_ref[k]
    acc_dt = acc_ref.dtype          # f32 on chip; f64 under x64 tests
    # the quantized-block scratch exists only under mirror='sym' (the
    # dispatcher allocates it conditionally)
    out_scr = scr[0] if scr else None

    @pl.when(s == 0)
    def _():
        # contract both operands on their last (rank) axis — W_i·W_jᵀ
        # without materializing a transpose
        acc_ref[:] = jax.lax.dot_general(
            wi_ref[:], wj_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dt)
        out = (p_ref[:].astype(acc_dt) - acc_ref[:]).astype(o_ref.dtype)
        o_ref[:] = out
        if mirror == "sym":
            out_scr[:] = out

    @pl.when(s == 1)
    def _():
        n = acc_ref.shape[0]

        def eye_of(dt_):
            return (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                    ).astype(dt_)

        # A transpose is needed for the mirror block, and the VPU has no
        # transpose unit — a lane/sublane-shuffle transpose of a (512,512)
        # f32 tile costs ~10× the equivalent MXU pass.  An identity
        # contraction on the MXU is EXACT (each output sums exactly one
        # product x·1.0 in an accumulator wide enough for x).
        if mirror == "sym":
            # Transpose the QUANTIZED s=0 output block at storage-dtype
            # MXU rate and skip the P_ji fetch/subtract entirely: the
            # mirror block is DEFINED as the lower block's transpose.
            # For bit-symmetric P this equals P_ji − accᵀ bit-for-bit
            # ((P_ij − acc)ᵀ elementwise); for asymmetric P it acts as a
            # free symmetrize (upper := lowerᵀ) — exactly the filter's
            # semantics, where P is symmetric by construction.
            acc2 = jnp.float32 if o_ref.dtype == jnp.bfloat16 else acc_dt
            o_ref[:] = jax.lax.dot_general(
                out_scr[:], eye_of(out_scr.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=acc2).astype(o_ref.dtype)
        elif mirror == "mxu":
            acc_t = jax.lax.dot_general(
                acc_ref[:], eye_of(acc_dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=acc_dt)
            o_ref[:] = (p_ref[:].astype(acc_dt) - acc_t
                        ).astype(o_ref.dtype)
        else:
            o_ref[:] = (p_ref[:].astype(acc_dt) - acc_ref[:].T
                        ).astype(o_ref.dtype)


def _syrk_kernel_wres(wi_idx, wj_idx, ss_ref, pr_idx, pc_idx,
                      p_ref, w_ref, o_ref, acc_ref, *, tile):
    """W-resident variant: the whole W stays pinned in VMEM (fetched
    once) and each step slices its two tiles from it — no per-step W
    DMA.  Only worthwhile when W fits comfortably (bf16 at 10k: 40 MB
    vs the 128 MB VMEM).  Implements the 'mxu' mirror only (the
    dispatcher asserts)."""
    k = pl.program_id(0)
    s = ss_ref[k]
    acc_dt = acc_ref.dtype

    @pl.when(s == 0)
    def _():
        wi = w_ref[pl.ds(wi_idx[k] * tile, tile), :]
        wj = w_ref[pl.ds(wj_idx[k] * tile, tile), :]
        acc_ref[:] = jax.lax.dot_general(
            wi, wj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dt)
        o_ref[:] = (p_ref[:].astype(acc_dt) - acc_ref[:]
                    ).astype(o_ref.dtype)

    @pl.when(s == 1)
    def _():
        n = acc_ref.shape[0]
        eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
               ).astype(acc_dt)
        acc_t = jax.lax.dot_general(
            acc_ref[:], eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dt)
        o_ref[:] = (p_ref[:].astype(acc_dt) - acc_t).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "mirror",
                                             "w_resident"))
def syrk_downdate_pallas(P: jnp.ndarray, W: jnp.ndarray, tile: int = 512,
                         interpret: bool = False, mirror: str = "mxu",
                         w_resident: bool = False) -> jnp.ndarray:
    """P − W·Wᵀ exploiting symmetry: the correction is computed only for
    lower-triangle tiles and mirrored, halving the dominant GEMM's flops.

    This is the filter's irreducible rank-2M covariance correction
    (models/batched.update_batch): Kg·(H·P) = PHᵀ·S⁻¹·(PHᵀ)ᵀ = W·Wᵀ with
    W = PHᵀ·L⁻ᵀ (S = L·Lᵀ), so the downdate is symmetric by construction
    — and this kernel makes the OUTPUT bit-symmetric too (the mirror
    block is written from the same accumulator), which the rows-mode
    P·Hᵀ-from-rows read depends on.

    The P buffer is aliased in-place: one read + one write of P total.
    Requires D % tile == 0 (init_state(pad_to_multiple_of=...)); the
    rank R is zero-padded to the 128-lane tile internally.

    ``mirror`` (how the (j,i) block is produced from the (i,j) work):
      'mxu' (default) — P_ji − accᵀ with the transpose as an f32/f64
            identity contraction on the MXU (general-P semantics).
            Measured fastest in-chain at 10k: 71.6k updates/s bf16.
      'sym' — the mirror block is DEFINED as the transpose of the
            quantized lower block at storage-dtype MXU rate, skipping
            the P_ji fetch and subtract.  Bit-identical to 'mxu' for
            bit-symmetric P; for asymmetric P the off-diagonal blocks
            are symmetrized (upper := lowerᵀ) while each diagonal TILE
            keeps its own asymmetry.  Measured SLOWER in-chain (68.2k
            vs 71.6k — the skipped fetch was already overlapped and the
            scratch copy costs), kept as the measured experiment.
      'vpu' — a lane/sublane shuffle transpose (slowest; measured
            experiment)."""
    D = P.shape[0]
    R = W.shape[1]
    assert D % tile == 0, "caller guards (syrk_downdate dispatch)"
    Rp = _round_up(R, 128)
    if Rp != R:
        W = jnp.zeros((D, Rp), W.dtype).at[:, :R].set(W)
    T = D // tile

    # Static step list: (wi, wj) pick the W tiles of the pair on BOTH
    # steps (so the s=1 mirror step triggers no W refetch DMA); (pr, pc)
    # are the P/output block coordinates — (i,j) at s=0, (j,i) at s=1.
    wi, wj, ss, pr, pc = [], [], [], [], []
    for i in range(T):
        for j in range(i + 1):
            wi.append(i), wj.append(j), ss.append(0)
            pr.append(i), pc.append(j)
            if i != j:
                wi.append(i), wj.append(j), ss.append(1)
                pr.append(j), pc.append(i)
    wi = jnp.asarray(wi, jnp.int32)
    wj = jnp.asarray(wj, jnp.int32)
    ss = jnp.asarray(ss, jnp.int32)
    pr = jnp.asarray(pr, jnp.int32)
    pc = jnp.asarray(pc, jnp.int32)

    def pmap_(k, wi_r, wj_r, ss_r, pr_r, pc_r):
        return (pr_r[k], pc_r[k])

    if mirror == "sym":
        # the sym mirror never reads P_ji — keep the P input block pinned
        # at (i,j) on both steps of a pair so the s=1 step fetches nothing
        def pin_(k, wi_r, wj_r, *_):
            return (wi_r[k], wj_r[k])
    else:
        pin_ = pmap_

    acc_shape = pltpu.VMEM((tile, tile),
                           jnp.float64 if P.dtype == jnp.float64
                           else jnp.float32)
    if w_resident:
        # _syrk_kernel_wres only implements the mxu identity-contraction
        # mirror — reject the other modes instead of silently running mxu
        assert mirror == "mxu", (
            f"w_resident SYRK implements mirror='mxu' only (got "
            f"{mirror!r}); use the blocked variant for 'sym'/'vpu'")
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(T * T,),
            in_specs=[
                pl.BlockSpec((tile, tile), pin_),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # whole W, once
            ],
            out_specs=pl.BlockSpec((tile, tile), pmap_),
            scratch_shapes=[acc_shape],
        )
        return pl.pallas_call(
            functools.partial(_syrk_kernel_wres, tile=tile),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
            input_output_aliases={5: 0},
            cost_estimate=pl.CostEstimate(
                flops=D * (D + tile) * Rp,
                bytes_accessed=2 * D * D * P.dtype.itemsize
                + D * Rp * W.dtype.itemsize,
                transcendentals=0),
            interpret=interpret,
        )(wi, wj, ss, pr, pc, P, W)

    # the quantized-block scratch is only read by the 'sym' mirror — the
    # default 'mxu'/'vpu' paths would otherwise pin up to 1 MB of VMEM
    # they never touch
    scratch = [acc_shape]
    if mirror == "sym":
        scratch.append(pltpu.VMEM((tile, tile), P.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T * T,),
        in_specs=[
            pl.BlockSpec((tile, tile), pin_),
            pl.BlockSpec((tile, Rp), lambda k, wi_r, *_: (wi_r[k], 0)),
            pl.BlockSpec((tile, Rp), lambda k, wi_r, wj_r, *_:
                         (wj_r[k], 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), pmap_),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_syrk_kernel, mirror=mirror),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
        input_output_aliases={5: 0},      # P (after the 5 scalar operands)
        cost_estimate=pl.CostEstimate(
            flops=D * (D + tile) * Rp,
            bytes_accessed=2 * D * D * P.dtype.itemsize
            + T * (T + 1) * tile * Rp * W.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(wi, wj, ss, pr, pc, P, W, W)


# ---------------------------------------------------------------------------
# Symmetric Gram: G = S @ S.T at half flops (lower tiles + MXU mirror)
# ---------------------------------------------------------------------------

def syrk_gram_ref(S: jnp.ndarray) -> jnp.ndarray:
    """jnp reference / CPU fallback: S·Sᵀ (f32 accumulation for narrow
    storage, as the downdate kernel)."""
    acc = jnp.float32 if S.dtype in (jnp.bfloat16, jnp.float16) else S.dtype
    return jnp.matmul(S, S.T, preferred_element_type=acc)


def _gram_kernel(si_idx, sj_idx, kk_idx, ff_idx, ll_idx, mm_idx,
                 pr_idx, pc_idx, si_ref, sj_ref, o_ref, acc_ref):
    """Gram analog of _syrk_kernel, with the contraction (k) dimension
    tiled: a pair (i,j≤i) runs R/ktile accumulate steps (acc is VMEM-
    resident across them), the last one writes out (i,j), and a mirror
    step writes (j,i) via the exact MXU identity contraction —
    T(T+1)/2 tile-pair contractions for T² writes, with only
    (tile × ktile) operand blocks ever resident (full rows of S at
    R = D were 40 MB per operand — a VMEM compile OOM at D=20480)."""
    k = pl.program_id(0)
    acc_dt = acc_ref.dtype

    @pl.when(mm_idx[k] == 0)
    def _():
        part = jax.lax.dot_general(
            si_ref[:], sj_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dt)

        @pl.when(ff_idx[k] == 1)
        def _():
            acc_ref[:] = part

        @pl.when(ff_idx[k] == 0)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(ll_idx[k] == 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @pl.when(mm_idx[k] == 1)
    def _():
        n = acc_ref.shape[0]
        eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
               ).astype(acc_dt)
        o_ref[:] = jax.lax.dot_general(
            acc_ref[:], eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dt).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "ktile", "interpret"))
def syrk_gram_pallas(S: jnp.ndarray, tile: int = 512, ktile: int = 1024,
                     interpret: bool = False) -> jnp.ndarray:
    """G = S·Sᵀ computed on lower-triangle tiles only and mirrored —
    half the MXU flops of the dense Gram, bit-symmetric output.

    This is the dominant cost of the square-root filter's factor
    recompression (models/srekf_fast.sr_recompress: the D³ Gram ran
    131 ms at D=20480 as a plain XLA matmul, vs 57-86 ms for the whole
    blocked Cholesky after it).  Output dtype is the f32/f64
    accumulation dtype — the consumer is a Cholesky, which wants the
    full-precision Gram, not a storage-rounded one.

    Requires D % tile == 0; the contraction dim is zero-padded to the
    k-tile internally."""
    D = S.shape[0]
    R = S.shape[1]
    assert D % tile == 0, "caller guards (syrk_gram dispatch)"
    ktile = min(ktile, _round_up(R, 128))
    Rp = _round_up(R, ktile)
    if Rp != R:
        S = jnp.zeros((D, Rp), S.dtype).at[:, :R].set(S)
    T = D // tile
    TK = Rp // ktile
    acc_dt = (jnp.float64 if S.dtype == jnp.float64 else jnp.float32)

    si, sj, kk, ff, ll, mm, pr, pc = ([] for _ in range(8))
    for i in range(T):
        for j in range(i + 1):
            for kb in range(TK):
                si.append(i), sj.append(j), kk.append(kb)
                ff.append(1 if kb == 0 else 0)
                ll.append(1 if kb == TK - 1 else 0)
                mm.append(0)
                pr.append(i), pc.append(j)
            if i != j:
                si.append(i), sj.append(j), kk.append(TK - 1)
                ff.append(0), ll.append(0), mm.append(1)
                pr.append(j), pc.append(i)
    args = [jnp.asarray(a, jnp.int32)
            for a in (si, sj, kk, ff, ll, mm, pr, pc)]
    n_steps = len(si)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((tile, ktile),
                         lambda k, si_r, sj_r, kk_r, *_: (si_r[k], kk_r[k])),
            pl.BlockSpec((tile, ktile),
                         lambda k, si_r, sj_r, kk_r, *_: (sj_r[k], kk_r[k])),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile),
            lambda k, si_r, sj_r, kk_r, ff_r, ll_r, mm_r, pr_r, pc_r:
            (pr_r[k], pc_r[k])),
        scratch_shapes=[pltpu.VMEM((tile, tile), acc_dt)],
    )
    return pl.pallas_call(
        _gram_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, D), acc_dt),
        cost_estimate=pl.CostEstimate(
            flops=D * (D + tile) * Rp,
            bytes_accessed=D * D * jnp.dtype(acc_dt).itemsize
            + T * (T + 1) * tile * Rp * S.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args, S, S)


def syrk_gram(S: jnp.ndarray, use_pallas: bool = None) -> jnp.ndarray:
    """S·Sᵀ with backend dispatch and shape guard.

    Measured verdict (chip, D=R=20480 f32, chip_r4 stage G): XLA's plain
    matmul runs the Gram at an effective 176 TFLOPS-dense-equivalent
    (97.3 ms) — ABOVE the measured 123 TFLOPS f32 matmul roof, i.e. the
    compiler already exploits the A·Aᵀ structure — while the half-flop
    mirror kernel lands at 108 ms (the identity-contraction mirrors and
    kernel schedule eat the 2× flop saving).  The kernel is therefore
    RETIRED from the default (r2 wire-or-retire discipline); pass
    ``use_pallas=True`` to run it as the measured experiment."""
    if not use_pallas:
        return syrk_gram_ref(S)
    tile = syrk_tile(S.shape[0])
    if not tile:
        return syrk_gram_ref(S)
    return syrk_gram_pallas(S, tile=tile, interpret=not _on_tpu())


def syrk_tile(D: int) -> int:
    """Largest supported tile dividing D (0 if none — caller falls back)."""
    for t in (512, 256, 128):
        if D % t == 0:
            return t
    return 0


def syrk_downdate(P: jnp.ndarray, W: jnp.ndarray,
                  use_pallas: bool = None) -> jnp.ndarray:
    """P − W·Wᵀ with automatic backend dispatch and shape guard."""
    if use_pallas is None:
        use_pallas = _on_tpu()
    tile = syrk_tile(P.shape[0])
    if not tile:
        import warnings
        warnings.warn(
            f"syrk_downdate falling back to the dense GEMM: D={P.shape[0]} "
            "is not a multiple of 128 — pad the state with "
            "init_state(pad_to_multiple_of=128) to engage the kernel",
            stacklevel=2)
        return syrk_downdate_ref(P, W)
    if use_pallas:
        return syrk_downdate_pallas(P, W, tile=tile,
                                    interpret=not _on_tpu())
    return syrk_downdate_ref(P, W)


# ---------------------------------------------------------------------------
# Dynamic row gather: out[i, :] = P[rows[i], :]  (scalar-prefetch DMA)
# ---------------------------------------------------------------------------

def pair_gather_ref(P: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """jnp reference / CPU fallback (XLA's take lowering):
    out[2i:2i+2] = P[starts[i]:starts[i]+2]."""
    rp = (starts[:, None] + jnp.arange(2)[None, :]).reshape(-1)
    return jnp.take(P, rp, axis=0)


def _pair_gather_kernel(rows_ref, p_ref, o_ref, scratch, sems, *,
                        pairs, tile):
    """Per pair: DMA the ``tile``-row aligned window containing the pair
    start from HBM (plus the next window when the pair straddles the
    boundary), then rotate the window so the pair lands at rows 0:2 and
    write it to the output block.  HBM slices stay tile-aligned — the
    constraint that rejects per-row DMA — while the misaligned select
    happens on VMEM vectors via tpu.dynamic_rotate."""
    i = pl.program_id(0)
    for j in range(pairs):                         # static unroll
        r = rows_ref[i * pairs + j]
        b = (r // tile) * tile
        pltpu.make_async_copy(p_ref.at[pl.ds(b, tile)],
                              scratch.at[j, pl.ds(0, tile)],
                              sems.at[2 * j]).start()

        @pl.when((r - b) == tile - 1)              # pair straddles window
        def _():
            pltpu.make_async_copy(p_ref.at[pl.ds(b + tile, tile)],
                                  scratch.at[j, pl.ds(tile, tile)],
                                  sems.at[2 * j + 1]).start()
    for j in range(pairs):
        r = rows_ref[i * pairs + j]
        b = (r // tile) * tile
        pltpu.make_async_copy(p_ref.at[pl.ds(b, tile)],
                              scratch.at[j, pl.ds(0, tile)],
                              sems.at[2 * j]).wait()

        @pl.when((r - b) == tile - 1)
        def _():
            pltpu.make_async_copy(p_ref.at[pl.ds(b + tile, tile)],
                                  scratch.at[j, pl.ds(tile, tile)],
                                  sems.at[2 * j + 1]).wait()
        rolled = pltpu.roll(scratch[j], shift=-(r - b), axis=0)
        o_ref[2 * j:2 * j + 2, :] = rolled[0:2, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pair_gather_pallas(P: jnp.ndarray, starts: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Row-pair gather as a manual DMA pipeline (out[2i:2i+2] =
    P[starts[i]:starts[i]+2]).

    ``pht_mode='rows'`` reads one contiguous row pair of P per gated
    landmark each chunk (models/batched.hp_from_rows).  XLA lowers the
    ``take`` to a gather that measured only ~25-43 GB/s on chip at 10k
    landmarks (stages D/G, experiments/chip_r3.py) — 3-5× below the
    elementwise stream rate.  Here the pair starts are scalar-prefetched
    into SMEM and the source stays in HBM; each grid step DMAs the
    tile-aligned windows covering its pairs concurrently and selects the
    pairs by dynamic rotate (single-row HBM slices are illegal — window
    slices keep every DMA tile-aligned).  Bytes moved are tile/2× the
    minimal gather, but at DMA copy rate rather than gather rate.

    Measured verdict (chip, K=10k, 512 pairs, D=20096, f32): take
    2.06 ms (40 GB/s useful) vs this kernel 2.61 ms (31 GB/s useful) —
    the 4× window-byte amplification that tile alignment forces cancels
    the copy-rate advantage, so XLA's take KEEPS the default
    (``EKFParams.rows_gather='take'``); this kernel stays as the
    measured experiment (r2 wire-or-retire discipline).  The gather is
    ~6% of the rows-mode chain anyway — stage D shows the correction
    GEMM at ~86% of the matmul roof, so the chain is within ~15% of its
    compute ceiling.

    Requirements (else callers fall back to ``take``): P's row count a
    multiple of the sublane tile (8 f32 / 16 bf16), its width a multiple
    of the 128 lane tile (both via init_state
    ``pad_to_multiple_of=128``), #pairs a multiple of tile/2, and every
    start < Dtot−1."""
    D = P.shape[1]
    Dtot = P.shape[0]
    M = starts.shape[0]
    tile = 16 if P.dtype == jnp.bfloat16 else 8
    pairs = tile // 2                              # out block = tile rows
    if M % pairs or Dtot % tile or D % 128:
        import warnings
        warnings.warn(
            f"pair_gather_pallas falling back to jnp.take: shape "
            f"({Dtot},{D})/{M} pairs violates the tile constraints "
            f"(rows%{tile}, width%128, pairs%{pairs}); pad the state "
            "with init_state(pad_to_multiple_of=128) to engage the "
            "kernel", stacklevel=2)
        return pair_gather_ref(P, starts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // pairs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2 * pairs, D), lambda i, rows_ref: (i, 0)),
        scratch_shapes=[pltpu.VMEM((pairs, 2 * tile, D), P.dtype),
                        pltpu.SemaphoreType.DMA((2 * pairs,))],
    )
    return pl.pallas_call(
        functools.partial(_pair_gather_kernel, pairs=pairs, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2 * M, D), P.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), P)


def pair_gather(P: jnp.ndarray, starts: jnp.ndarray,
                use_pallas: bool = None) -> jnp.ndarray:
    """Row-pair gather with automatic backend dispatch."""
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        return pair_gather_pallas(P, starts, interpret=not _on_tpu())
    return pair_gather_ref(P, starts)


def gather_pairs(P: jnp.ndarray, starts: jnp.ndarray, mode: str
                 ) -> jnp.ndarray:
    """The rows-mode gather dispatch shared by batched.hp_from_rows and
    srekf_fast._hs_rows: ``mode`` is ``EKFParams.rows_gather``."""
    if mode == "pallas":
        return pair_gather(P, starts)
    rp = (starts[:, None] + jnp.arange(2)[None, :]).reshape(-1)
    return jnp.take(P, rp, axis=0)


# ---------------------------------------------------------------------------
# RANSAC hypothesis scoring: inlier counts for NH lines over B beams
# ---------------------------------------------------------------------------

def score_lines_ref(points: jnp.ndarray, valid: jnp.ndarray,
                    lines: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """jnp reference: counts [NH] of valid points within `thresh` of each
    line y = m·x + b (lines [NH,2])."""
    m, b = lines[:, 0:1], lines[:, 1:2]                       # [NH,1]
    x, y = points[None, :, 0], points[None, :, 1]             # [1,B]
    d = jnp.abs(m * x - y + b) / jnp.sqrt(m * m + 1.0)
    inl = (d < thresh) & valid[None, :]
    return jnp.sum(inl, axis=1, dtype=jnp.int32)


def _score_kernel(x_ref, y_ref, w_ref, lines_ref, thresh_ref, out_ref):
    m = lines_ref[:, 0:1]                                     # [TH,1]
    b = lines_ref[:, 1:2]
    x = x_ref[:]                                              # [1,B]
    y = y_ref[:]
    w = w_ref[:]
    one = jnp.ones((), x.dtype)
    d = jnp.abs(m * x - y + b) * jax.lax.rsqrt(m * m + one)
    inl = ((d < thresh_ref[0, 0]) & (w > jnp.zeros((), x.dtype))).astype(
        x.dtype)
    out_ref[:, 0:1] = jnp.sum(inl, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def score_lines_pallas(points: jnp.ndarray, valid: jnp.ndarray,
                       lines: jnp.ndarray, thresh,
                       tile_h: int = 8, interpret: bool = False
                       ) -> jnp.ndarray:
    NH = lines.shape[0]
    B = points.shape[0]
    Bp = _round_up(B, 128)
    NHp = _round_up(NH, tile_h)
    x = jnp.zeros((1, Bp), points.dtype).at[0, :B].set(points[:, 0])
    y = jnp.zeros((1, Bp), points.dtype).at[0, :B].set(points[:, 1])
    w = jnp.zeros((1, Bp), points.dtype).at[0, :B].set(
        valid.astype(points.dtype))
    lp = jnp.zeros((NHp, 2), lines.dtype).at[:NH].set(lines)
    th = jnp.asarray(thresh, points.dtype).reshape(1, 1)
    counts = pl.pallas_call(
        _score_kernel,
        grid=(NHp // tile_h,),
        in_specs=[
            pl.BlockSpec((1, Bp), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 2), lambda h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda h: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, 1), lambda h: (h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NHp, 1), points.dtype),
        interpret=interpret,
    )(x, y, w, lp, th)
    return counts[:NH, 0].astype(jnp.int32)


def score_lines(points: jnp.ndarray, valid: jnp.ndarray,
                lines: jnp.ndarray, thresh: float,
                use_pallas: bool = None) -> jnp.ndarray:
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        return score_lines_pallas(points, valid, lines, thresh)
    return score_lines_ref(points, valid, lines, thresh)
