"""Pallas TPU kernel for the structured Viterbi with inline provenance.

One `pallas_call` with grid=(L,) runs the whole forward scan: the TPU grid
is sequential, so the DP state (M/I/D/hub/I0 value arrays and their
provenance) lives in VMEM scratch across grid steps.  The XLA version
(ops/viterbi_struct) round-trips ~60 intermediate (B, P) arrays per column
through HBM and its traceback re-derives argmaxes against the dense
eliminated transition matrix — an O(B·S) pass per column that costs about
as much as the forward itself.  Here every max carries its argmax origin
(the emitting struct state of the previous column) resolved inline in VMEM,
the kernel emits int32 origin planes, and the backward pass is a single
(B,)-gather per column.

Key precomputation: the delete-chain tropical scan
``D_j = max(D_{j-1} + dd_j, b_j)`` unrolls into log2(P) shift-max rounds
``v = max(v, shift(v, 2^r) + W_r)`` where ``W_r[j] = sum of dd over
(j-2^r, j]`` — additive window weights precomputed on host, -inf where a
window crosses a block boundary (chain reset).  Origin tracking composes
exactly through the doubling rounds because weights only accumulate, never
reorder.  The cross-unit unit_start chain uses the same trick along the
unit axis with constant decay.

Selections (hub value per position, unit-last column extraction) are
one-hot matmuls on the MXU instead of gathers; origins ride the same
one-hot products (exact for integers < 2^24 in f32).

Reference semantics: pomegranate's Viterbi recurrence
(reference pomegranate/hmm.pyx:1970-2130), silent states pre-eliminated
(models/compiler.py).  Conformance contract: the decoded path must rescore
to the optimal log-probability (tests/test_pallas_viterbi.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-1e30)
LN05 = float(np.log(0.5))

# origin planes dtype: int16 halves traceback HBM traffic (struct indices
# are < 2P+nb <= ~6700 << 32767); int32 fallback via env for debugging
ORIGIN_DTYPE = jnp.int16 if os.environ.get(
    "ADVNTR_TPU_ORIGIN32", "0") != "1" else jnp.int32

# row indices in the packed (ROWS, P) parameter matrix
(R_AMM, R_AIM, R_ADM, R_ENTM, R_I0M, R_MI, R_II, R_DI, R_MD, R_IDW,
 R_I0D, R_HUBD, R_XMU, R_XIU, R_XDU, R_XMS, R_XIS, R_XDS, R_LEM, R_LEI,
 R_MSTART, R_ISTART, R_BLKID, R_EM0, R_EM1, R_EM2, R_EM3, R_EI0, R_EI1,
 R_EI2, R_EI3) = range(31)
N_ROWS = 32

(B_I0I, B_HUBI0, B_I0START, B_LEI0, B_EI00, B_EI01, B_EI02, B_EI03) = range(8)
N_BROWS = 8


@dataclasses.dataclass
class PallasStructModel:
    """Packed device tensors for the Pallas fused kernel."""
    PM: jnp.ndarray          # (N_ROWS, P)
    PB: jnp.ndarray          # (N_BROWS, nb)
    Wd: jnp.ndarray          # (n_rounds_p, P) delete-chain window weights
    Wu: jnp.ndarray          # (n_rounds_c, C) unit-chain window weights
    blk_onehot: jnp.ndarray  # (nb, P)
    ul_onehot: jnp.ndarray   # (P, C)
    suf_onehot: jnp.ndarray  # (P, 1)
    r_unit: jnp.ndarray      # (1, 1)
    struct_to_art: jnp.ndarray  # (2P+nb,) struct index -> artifact index

    @classmethod
    def from_struct(cls, sm, art, dtype=jnp.float32) -> "PallasStructModel":
        P, C, nb = sm.P, sm.C, sm.nb

        def clean(x):
            x = np.asarray(x, dtype=np.float64)
            return np.where(np.isfinite(x), x, np.float64(NEG))

        PM = np.full((N_ROWS, P), np.float64(NEG))
        PM[R_AMM] = clean(sm.a_mm)
        PM[R_AIM] = clean(sm.a_im)
        PM[R_ADM] = clean(sm.a_dm)
        PM[R_ENTM] = clean(sm.ent_m)
        PM[R_I0M] = clean(sm.i0_m)
        PM[R_MI] = clean(sm.mi)
        PM[R_II] = clean(sm.ii)
        PM[R_DI] = clean(sm.di)
        PM[R_MD] = clean(sm.md)
        PM[R_IDW] = clean(sm.idw)
        PM[R_I0D] = clean(sm.i0_d)
        PM[R_HUBD] = clean(sm.hub_d)
        # block exits split by role: unit lasts vs the suffix last
        xm, xi, xd = clean(sm.xm), clean(sm.xi), clean(sm.xd)
        unit_mask = np.zeros(P, dtype=bool)
        unit_mask[np.asarray(sm.unit_last)] = True
        suf_mask = np.zeros(P, dtype=bool)
        if sm.suffix_last >= 0:
            suf_mask[sm.suffix_last] = True
        PM[R_XMU] = np.where(unit_mask, xm, np.float64(NEG))
        PM[R_XIU] = np.where(unit_mask, xi, np.float64(NEG))
        PM[R_XDU] = np.where(unit_mask, xd, np.float64(NEG))
        PM[R_XMS] = np.where(suf_mask, xm, np.float64(NEG))
        PM[R_XIS] = np.where(suf_mask, xi, np.float64(NEG))
        PM[R_XDS] = np.where(suf_mask, xd, np.float64(NEG))
        le = clean(sm.log_end_struct)
        PM[R_LEM] = le[:P]
        PM[R_LEI] = le[P:2 * P]
        PM[R_MSTART] = clean(sm.M_start)
        PM[R_ISTART] = clean(sm.I_start)
        PM[R_BLKID] = 2 * P + np.asarray(sm.blk_idx, dtype=np.float64)
        PM[R_EM0:R_EM0 + 4] = clean(sm.eM).T
        PM[R_EI0:R_EI0 + 4] = clean(sm.eI).T

        PB = np.full((N_BROWS, nb), np.float64(NEG))
        PB[B_I0I] = clean(sm.i0_i)
        PB[B_HUBI0] = clean(sm.hub_i0)
        PB[B_I0START] = clean(sm.I0_start)
        PB[B_LEI0] = le[2 * P:]
        PB[B_EI00:B_EI00 + 4] = clean(sm.eI0).T

        # delete-chain window weights: W_r[j] = sum dd over (j-2^r, j],
        # -inf when the window crosses a block start (dd=-inf there)
        dd = clean(sm.dd)
        n_rounds_p = max(1, int(np.ceil(np.log2(max(P, 2)))))
        Wd = np.full((n_rounds_p, P), np.float64(NEG))
        cum = dd.copy()        # W_0 window size 1
        Wd[0] = cum
        for r in range(1, n_rounds_p):
            k = 1 << (r - 1)
            shifted = np.concatenate([np.full(k, np.float64(NEG)),
                                      Wd[r - 1][:-k]])
            Wd[r] = Wd[r - 1] + shifted
        # unit chain: constant decay rho per hop
        rho = (clean(np.array(sm.r_unit)) + LN05).item()
        n_rounds_c = max(1, int(np.ceil(np.log2(max(C, 2)))))
        Wu = np.full((n_rounds_c, C), np.float64(NEG))
        for r in range(n_rounds_c):
            k = 1 << r
            w = rho * k if rho > np.float64(NEG) / 4 else np.float64(NEG)
            Wu[r, k:] = w
            Wu[r, :k] = np.float64(NEG)

        blk_onehot = np.zeros((nb, P))
        blk_onehot[np.asarray(sm.blk_idx), np.arange(P)] = 1.0
        ul_onehot = np.zeros((P, C))
        ul_onehot[np.asarray(sm.unit_last), np.arange(C)] = 1.0
        suf_onehot = np.zeros((P, 1))
        if sm.suffix_last >= 0:
            suf_onehot[sm.suffix_last, 0] = 1.0

        f32 = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            PM=f32(PM), PB=f32(PB), Wd=f32(Wd), Wu=f32(Wu),
            blk_onehot=f32(blk_onehot), ul_onehot=f32(ul_onehot),
            suf_onehot=f32(suf_onehot),
            r_unit=f32(np.array([[clean(np.array(sm.r_unit)).item()]])),
            struct_to_art=jnp.asarray(np.asarray(sm.struct_to_art)))

    def flat(self):
        return dataclasses.astuple(self)


def _roll1(x, k):
    """Shift x right by k along the last axis, filling with NEG."""
    shifted = pltpu.roll(x, k, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < k, NEG, shifted)


def _rollo(x, k):
    """Shift an origin array right by k (fill value never selected because
    the paired value is NEG)."""
    return pltpu.roll(x, k, 1)


def _pick(v1, o1, v2, o2):
    """Tropical (max, argmax-origin) combine; first argument wins ties."""
    take2 = v2 > v1
    return jnp.maximum(v1, v2), jnp.where(take2, o2, o1)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _max_first_idx(v):
    """(max, index-of-first-max) along the last axis, keepdims."""
    mx = jnp.max(v, axis=1, keepdims=True)
    ii = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1).astype(jnp.float32)
    big = jnp.float32(v.shape[1])
    idx = jnp.min(jnp.where(v == mx, ii, big), axis=1, keepdims=True)
    return mx, idx


def _fused_kernel(seq1h_ref, lengths_ref, PM_ref, PB_ref, Wd_ref, Wu_ref,
                  blk_ref, ul_ref, suf_ref, runit_ref,
                  oM_ref, oI_ref, oI0_ref, best_ref, bstate_ref,
                  M_s, I_s, D_s, I0_s, hub_s, Do_s, hubo_s,
                  best_s, bstate_s):
    t = pl.program_id(0)
    L = pl.num_programs(0)
    B = M_s.shape[0]
    P = M_s.shape[1]
    nb = I0_s.shape[1]
    C = nb - 2
    n_rounds_p = Wd_ref.shape[0]
    n_rounds_c = Wu_ref.shape[0]

    onehot = seq1h_ref[0]                    # (B, 4)
    eM_x = _dot(onehot, PM_ref[R_EM0:R_EM0 + 4, :])
    eI_x = _dot(onehot, PM_ref[R_EI0:R_EI0 + 4, :])
    eI0_x = _dot(onehot, PB_ref[B_EI00:B_EI00 + 4, :])
    lengths = lengths_ref[:]                 # (B, 1)

    # origin-id constants (struct space: M_p = p, I_p = P+p, I0_b = 2P+b)
    idxM = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1).astype(jnp.float32)
    idxI = idxM + jnp.float32(P)
    idxI0 = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1).astype(
        jnp.float32) + jnp.float32(2 * P)
    blkid = PM_ref[R_BLKID, :][None, :]      # (1, P): 2P + blk_idx[p]
    blkid = jnp.broadcast_to(blkid, (B, P))

    is_first = t == 0

    def emitting():
        M, I, D, I0, hub = M_s[...], I_s[...], D_s[...], I0_s[...], hub_s[...]
        Do, hubo = Do_s[...], hubo_s[...]
        hub_by_pos = _dot(hub, blk_ref[...])
        hubo_by_pos = _dot(hubo, blk_ref[...])
        I0_by_pos = _dot(I0, blk_ref[...])
        v, o = _pick(_roll1(M, 1) + PM_ref[R_AMM, :][None, :], _rollo(idxM, 1),
                     _roll1(I, 1) + PM_ref[R_AIM, :][None, :], _rollo(idxI, 1))
        v, o = _pick(v, o,
                     _roll1(D, 1) + PM_ref[R_ADM, :][None, :], _rollo(Do, 1))
        v, o = _pick(v, o, hub_by_pos + PM_ref[R_ENTM, :][None, :],
                     hubo_by_pos)
        v, o = _pick(v, o, I0_by_pos + PM_ref[R_I0M, :][None, :], blkid)
        Mn, OMn = eM_x + v, o
        v, o = _pick(M + PM_ref[R_MI, :][None, :], idxM,
                     I + PM_ref[R_II, :][None, :], idxI)
        v, o = _pick(v, o, D + PM_ref[R_DI, :][None, :], Do)
        In, OIn = eI_x + v, o
        v, o = _pick(I0 + PB_ref[B_I0I, :][None, :], idxI0,
                     hub + PB_ref[B_HUBI0, :][None, :], hubo)
        I0n, OI0n = eI0_x + v, o
        return Mn, In, I0n, OMn, OIn, OI0n

    Mn0 = PM_ref[R_MSTART, :][None, :] + eM_x
    In0 = PM_ref[R_ISTART, :][None, :] + eI_x
    I0n0 = PB_ref[B_I0START, :][None, :] + eI0_x
    Mns, Ins, I0ns, OMs, OIs, OI0s = emitting()
    neg1 = jnp.float32(-1.0)
    Mn = jnp.where(is_first, Mn0, Mns)
    In = jnp.where(is_first, In0, Ins)
    I0n = jnp.where(is_first, I0n0, I0ns)
    OMn = jnp.where(is_first, neg1, OMs)
    OIn = jnp.where(is_first, neg1, OIs)
    OI0n = jnp.where(is_first, neg1, OI0s)

    # length freeze (column t only exists for reads with t < length)
    act = t < lengths                        # (B, 1)
    Mn = jnp.where(act, Mn, M_s[...])
    In = jnp.where(act, In, I_s[...])
    I0n = jnp.where(act, I0n, I0_s[...])

    # ---- silent layer (within-column closure, with provenance) ----
    I0_by_pos_n = _dot(I0n, blk_ref[...])
    bv, bo = _pick(_roll1(Mn, 1) + PM_ref[R_MD, :][None, :], _rollo(idxM, 1),
                   _roll1(In, 1) + PM_ref[R_IDW, :][None, :], _rollo(idxI, 1))
    bv, bo = _pick(bv, bo, I0_by_pos_n + PM_ref[R_I0D, :][None, :], blkid)
    Din, Dino = bv, bo
    for r in range(n_rounds_p):
        k = 1 << r
        if k >= P:
            break
        Din, Dino = _pick(Din, Dino,
                          _roll1(Din, k) + Wd_ref[r, :][None, :],
                          _rollo(Dino, k))
    # block-end values (one-hot matmul = exact column selection)
    qv, qo = _pick(Mn + PM_ref[R_XMU, :][None, :], idxM,
                   In + PM_ref[R_XIU, :][None, :], idxI)
    qv, qo = _pick(qv, qo, Din + PM_ref[R_XDU, :][None, :], Dino)
    q = _dot(qv, ul_ref[...])                          # (B, C)
    qorig = _dot(qo, ul_ref[...])
    sv, so = _pick(Mn + PM_ref[R_XMS, :][None, :], idxM,
                   In + PM_ref[R_XIS, :][None, :], idxI)
    sv, so = _pick(sv, so, Din + PM_ref[R_XDS, :][None, :], Dino)
    sufq = _dot(sv, suf_ref[...])                      # (B, 1)
    sufqorig = _dot(so, suf_ref[...])
    # unit_start chain: s_0 = sufq; s_c = q_{c-1} + ln(1/2)
    ccol = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    s = jnp.where(ccol == 0, jnp.broadcast_to(sufq, q.shape),
                  _roll1(q, 1) + LN05)
    so_chain = jnp.where(ccol == 0, jnp.broadcast_to(sufqorig, q.shape),
                         _rollo(qorig, 1))
    us, uso = s, so_chain
    for r in range(n_rounds_c):
        k = 1 << r
        if k >= C:
            break
        us, uso = _pick(us, uso,
                        _roll1(us, k) + Wu_ref[r, :][None, :],
                        _rollo(uso, k))
    r_unit = runit_ref[0, 0]
    uev, ueo = _pick(q, qorig, us + r_unit, uso)
    pstart, ci = _max_first_idx(uev + LN05)            # (B, 1) each
    pstartorig = jnp.sum(
        jnp.where(jax.lax.broadcasted_iota(jnp.int32, uev.shape, 1).astype(
            jnp.float32) == ci, ueo, 0.0), axis=1, keepdims=True)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1)
    us_padded = pltpu.roll(jnp.pad(us, ((0, 0), (0, nb - C))), 1, 1)
    uso_padded = pltpu.roll(jnp.pad(uso, ((0, 0), (0, nb - C))), 1, 1)
    hubn = jnp.where(bcol == 0, NEG,
                     jnp.where(bcol <= C, us_padded,
                               jnp.broadcast_to(pstart, (B, nb))))
    hubon = jnp.where(bcol == 0, neg1,
                      jnp.where(bcol <= C, uso_padded,
                                jnp.broadcast_to(pstartorig, (B, nb))))
    hub_by_pos_n = _dot(hubn, blk_ref[...])
    hubo_by_pos_n = _dot(hubon, blk_ref[...])
    Dn, Don = _pick(Din, Dino,
                    hub_by_pos_n + PM_ref[R_HUBD, :][None, :], hubo_by_pos_n)
    Dn = jnp.where(act, Dn, D_s[...])
    Don = jnp.where(act, Don, Do_s[...])
    hubn = jnp.where(act, hubn, hub_s[...])
    hubon = jnp.where(act, hubon, hubo_s[...])

    # ---- best score + best end state (latched at each read's last column)
    vM, iM = _max_first_idx(Mn + PM_ref[R_LEM, :][None, :])
    vI, iI = _max_first_idx(In + PM_ref[R_LEI, :][None, :])
    vI0, iI0 = _max_first_idx(I0n + PB_ref[B_LEI0, :][None, :])
    fin, fo = _pick(vM, iM, vI, iI + jnp.float32(P))
    fin, fo = _pick(fin, fo, vI0, iI0 + jnp.float32(2 * P))

    @pl.when(is_first)
    def _():
        best_s[...] = jnp.full((B, 1), NEG, dtype=jnp.float32)
        bstate_s[...] = jnp.zeros((B, 1), dtype=jnp.float32)
    latch = t == lengths - 1
    best_s[...] = jnp.where(latch, fin, best_s[...])
    bstate_s[...] = jnp.where(latch, fo, bstate_s[...])

    # ---- commit state + outputs ----
    M_s[...] = Mn
    I_s[...] = In
    D_s[...] = Dn
    I0_s[...] = I0n
    hub_s[...] = hubn
    Do_s[...] = Don
    hubo_s[...] = hubon
    # round before the int cast: origins ride f32 one-hot matmuls whose
    # HIGHEST-precision result can be off by ~1e-6 relative — truncation
    # would turn 937.0-eps into 936
    oM_ref[0] = (OMn + 0.5).astype(ORIGIN_DTYPE)
    oI_ref[0] = (OIn + 0.5).astype(ORIGIN_DTYPE)
    oI0_ref[0] = (OI0n + 0.5).astype(ORIGIN_DTYPE)

    @pl.when(t == L - 1)
    def _():
        best_ref[...] = best_s[...]
        bstate_ref[...] = (bstate_s[...] + 0.5).astype(jnp.int32)


def pallas_fused_forward(pm: PallasStructModel, seqs, lengths,
                         interpret: bool = False):
    """Fused forward: returns (best (B,), best_state (B,) struct index,
    origins_M (L,B,P), origins_I (L,B,P), origins_I0 (L,B,nb)) — int32
    provenance planes for the gather-only traceback."""
    B, L = seqs.shape
    P = pm.PM.shape[1]
    nb = pm.PB.shape[1]
    seq1h = jax.nn.one_hot(jnp.clip(seqs.astype(jnp.int32), 0, 3), 4,
                           dtype=jnp.float32)               # (B, L, 4)
    seq1h = jnp.transpose(seq1h, (1, 0, 2))                 # (L, B, 4)
    lengths2 = lengths.astype(jnp.int32)[:, None]           # (B, 1)

    in_specs = [
            pl.BlockSpec((1, B, 4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lengths
            pl.BlockSpec(memory_space=pltpu.VMEM),  # PM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # PB
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wu
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blk_onehot
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ul_onehot
            pl.BlockSpec(memory_space=pltpu.VMEM),  # suf_onehot
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_unit
    ]
    out_specs = [
        pl.BlockSpec((1, B, P), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, P), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, nb), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 1), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 1), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    oM, oI, oI0, best, bstate = pl.pallas_call(
        _fused_kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, P), ORIGIN_DTYPE),
            jax.ShapeDtypeStruct((L, B, P), ORIGIN_DTYPE),
            jax.ShapeDtypeStruct((L, B, nb), ORIGIN_DTYPE),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, P), jnp.float32),   # M
            pltpu.VMEM((B, P), jnp.float32),   # I
            pltpu.VMEM((B, P), jnp.float32),   # D
            pltpu.VMEM((B, nb), jnp.float32),  # I0
            pltpu.VMEM((B, nb), jnp.float32),  # hub
            pltpu.VMEM((B, P), jnp.float32),   # D origins
            pltpu.VMEM((B, nb), jnp.float32),  # hub origins
            pltpu.VMEM((B, 1), jnp.float32),   # best
            pltpu.VMEM((B, 1), jnp.float32),   # best state
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seq1h, lengths2, pm.PM, pm.PB, pm.Wd, pm.Wu, pm.blk_onehot,
      pm.ul_onehot, pm.suf_onehot, pm.r_unit)
    return best[:, 0], bstate[:, 0], oM, oI, oI0


def _backward_kernel(lengths_ref, bstate_ref, oM_ref, oI_ref, oI0_ref,
                     path_ref, cur_s, path_s):
    """Grid step g processes column t = L-1-g: records the current state,
    then hops to its predecessor via the column's origin planes.  The
    per-column select is an iota-compare + masked row-sum — TPU-friendly,
    unlike a lane-axis gather.  The path accumulates in an (L, B) VMEM
    scratch (dynamic sublane store) and flushes once at the last step."""
    g = pl.program_id(0)
    L = pl.num_programs(0)
    B = cur_s.shape[0]
    P = oM_ref.shape[2]
    nb = oI0_ref.shape[2]
    t = L - 1 - g
    lengths = lengths_ref[:]                      # (B, 1)

    @pl.when(g == 0)
    def _():
        cur_s[...] = bstate_ref[...]

    cur = cur_s[...]                              # (B, 1) int32
    path_s[pl.ds(t, 1), :] = cur.reshape(1, B)

    iotaP = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    iotab = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1)
    selM = jnp.sum(jnp.where(iotaP == cur, oM_ref[0].astype(jnp.int32), 0),
                   axis=1, keepdims=True)
    selI = jnp.sum(jnp.where(iotaP == cur - P,
                             oI_ref[0].astype(jnp.int32), 0),
                   axis=1, keepdims=True)
    sel0 = jnp.sum(jnp.where(iotab == cur - 2 * P,
                             oI0_ref[0].astype(jnp.int32), 0),
                   axis=1, keepdims=True)
    prev = jnp.where(cur < P, selM, jnp.where(cur < 2 * P, selI, sel0))
    hop = (t <= lengths - 1) & (t >= 1)
    cur_s[...] = jnp.where(hop, prev, cur)

    @pl.when(g == L - 1)
    def _():
        path_ref[...] = path_s[...]


def pallas_backward(lengths, bstate, oM, oI, oI0, interpret: bool = False):
    """Walk the origin planes back to the path: (B, L) struct indices."""
    L, B, P = oM.shape
    nb = oI0.shape[2]
    lengths2 = lengths.astype(jnp.int32)[:, None]
    bstate2 = bstate.astype(jnp.int32)[:, None]
    path_rev = pl.pallas_call(
        _backward_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lengths
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bstate
            pl.BlockSpec((1, B, P), lambda g, L=L: (L - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, P), lambda g, L=L: (L - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, nb), lambda g, L=L: (L - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.int32),
                        pltpu.VMEM((L, B), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths2, bstate2, oM, oI, oI0)
    return path_rev.T                              # (B, L)


# per-kernel-instance batch cap: VMEM live-range pressure bounds it (the
# raised vmem limit admits 512 at P=512; measured fastest fused); tunable
CHUNK_B = int(os.environ.get("ADVNTR_TPU_CHUNK_B", "512"))


def _chunk_for(P: int) -> int:
    """Scale the per-instance batch down with P so kernel temporaries
    (~30 live (B, P) f32 arrays) stay inside the VMEM budget."""
    budget = CHUNK_B * 512
    c = 1 << max(3, (budget // max(P, 1)).bit_length() - 1)
    return min(CHUNK_B, c)


def _forward_and_traceback(pm, seqs, lengths, return_path: bool,
                           interpret: bool = False):
    """One chunk: Pallas fused forward + Pallas origin-walk backward."""
    B, L = seqs.shape
    best, end_state_s, oM, oI, oI0 = pallas_fused_forward(
        pm, seqs, lengths, interpret=interpret)
    if not return_path:
        return best, None, None
    path_s = pallas_backward(lengths, end_state_s, oM, oI, oI0,
                             interpret=interpret)
    path_s = jnp.where((lengths == 1)[:, None],
                       jnp.broadcast_to(end_state_s[:, None], path_s.shape),
                       path_s)
    path = jnp.take(pm.struct_to_art, path_s)
    end_state = jnp.take(pm.struct_to_art, end_state_s)
    return best, end_state, path


@functools.partial(jax.jit, static_argnames=("return_path", "interpret"))
def viterbi_pallas_batch(model_arrays, seqs, lengths,
                         return_path: bool = True, interpret: bool = False):
    """Pallas fused forward + gather traceback; same contract as
    viterbi_struct_batch (artifact-space path indices)."""
    pm = PallasStructModel(*model_arrays)
    B, L = seqs.shape
    chunk_b = _chunk_for(pm.PM.shape[1])
    if B <= chunk_b:
        return _forward_and_traceback(pm, seqs, lengths, return_path,
                                      interpret=interpret)
    assert B % chunk_b == 0, (B, chunk_b)
    n_chunks = B // chunk_b
    seqs_c = seqs.reshape(n_chunks, chunk_b, L)
    lengths_c = lengths.reshape(n_chunks, chunk_b)
    out = jax.vmap(lambda q, ln: _forward_and_traceback(
        pm, q, ln, return_path, interpret=interpret))(seqs_c, lengths_c)
    if not return_path:
        return out[0].reshape(B), None, None
    best, end_state, path = out
    return (best.reshape(B), end_state.reshape(B),
            path.reshape(B, L))
