"""Pallas TPU kernel for the structured Viterbi forward pass.

One `pallas_call` with grid=(L,) runs the whole forward scan: the TPU grid
is sequential, so the DP state (M/I/D/hub/I0 value arrays) lives in VMEM
scratch across grid steps and the only HBM traffic is the per-column value
planes written out for the traceback.  The XLA version (ops/viterbi_struct)
round-trips ~60 intermediate (B, P) arrays per column through HBM; here a
column is ~25 VPU ops on VMEM-resident data plus three small MXU selects.

Key precomputation: the delete-chain tropical scan
``D_j = max(D_{j-1} + dd_j, b_j)`` unrolls into log2(P) shift-max rounds
``v = max(v, shift(v, 2^r) + W_r)`` where ``W_r[j] = sum of dd over
(j-2^r, j]`` — additive window weights precomputed on host, -inf where a
window crosses a block boundary (chain reset).  The cross-unit unit_start
chain uses the same trick along the unit axis with constant decay.

Selections (hub value per position, unit-last column extraction) are
one-hot matmuls on the MXU instead of gathers.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-1e30)
LN05 = float(np.log(0.5))

# row indices in the packed (ROWS, P) parameter matrix
(R_AMM, R_AIM, R_ADM, R_ENTM, R_I0M, R_MI, R_II, R_DI, R_MD, R_IDW,
 R_I0D, R_HUBD, R_XMU, R_XIU, R_XDU, R_XMS, R_XIS, R_XDS, R_LEM, R_LEI,
 R_MSTART, R_ISTART, R_EM0, R_EM1, R_EM2, R_EM3, R_EI0, R_EI1, R_EI2,
 R_EI3) = range(30)
N_ROWS = 32

(B_I0I, B_HUBI0, B_I0START, B_LEI0, B_EI00, B_EI01, B_EI02, B_EI03) = range(8)
N_BROWS = 8


@dataclasses.dataclass
class PallasStructModel:
    """Packed device tensors for the Pallas forward kernel."""
    PM: jnp.ndarray          # (N_ROWS, P)
    PB: jnp.ndarray          # (N_BROWS, nb)
    Wd: jnp.ndarray          # (n_rounds_p, P) delete-chain window weights
    Wu: jnp.ndarray          # (n_rounds_c, C) unit-chain window weights
    blk_onehot: jnp.ndarray  # (nb, P)
    ul_onehot: jnp.ndarray   # (P, C)
    suf_onehot: jnp.ndarray  # (P, 1)
    r_unit: jnp.ndarray      # (1, 1)
    # traceback companions (XLA side)
    struct_to_art: jnp.ndarray
    log_end_struct: jnp.ndarray
    log_T_struct_t: jnp.ndarray

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
        n_struct = 2 * P + nb
        le = clean(sm.log_end_struct)
        PM[R_LEM] = le[:P]
        PM[R_LEI] = le[P:2 * P]
        PM[R_MSTART] = clean(sm.M_start)
        PM[R_ISTART] = clean(sm.I_start)
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

        log_T = np.asarray(art.log_T, dtype=np.float64)
        log_T = np.where(np.isfinite(log_T), log_T, np.float64(NEG))
        s2a = np.asarray(sm.struct_to_art)
        log_T_struct_t = log_T[np.ix_(s2a, s2a)].T

        f32 = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            PM=f32(PM), PB=f32(PB), Wd=f32(Wd), Wu=f32(Wu),
            blk_onehot=f32(blk_onehot), ul_onehot=f32(ul_onehot),
            suf_onehot=f32(suf_onehot),
            r_unit=f32(np.array([[clean(np.array(sm.r_unit)).item()]])),
            struct_to_art=jnp.asarray(s2a),
            log_end_struct=f32(le),
            log_T_struct_t=f32(log_T_struct_t))

    def flat(self):
        return dataclasses.astuple(self)


def _roll1(x, k):
    """Shift x right by k along the last axis, filling with NEG."""
    shifted = pltpu.roll(x, k, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < k, NEG, shifted)


def _forward_kernel(seq1h_ref, lengths_ref, PM_ref, PB_ref, Wd_ref, Wu_ref,
                    blk_ref, ul_ref, suf_ref, runit_ref,
                    pM_ref, pI_ref, pI0_ref, best_ref,
                    M_s, I_s, D_s, I0_s, hub_s, best_s):
    t = pl.program_id(0)
    L = pl.num_programs(0)
    B = M_s.shape[0]
    P = M_s.shape[1]
    nb = I0_s.shape[1]
    C = nb - 2
    n_rounds_p = Wd_ref.shape[0]
    n_rounds_c = Wu_ref.shape[0]

    onehot = seq1h_ref[0]                    # (B, 4)
    eM_x = jnp.dot(onehot, PM_ref[R_EM0:R_EM0 + 4, :],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    eI_x = jnp.dot(onehot, PM_ref[R_EI0:R_EI0 + 4, :],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    eI0_x = jnp.dot(onehot, PB_ref[B_EI00:B_EI00 + 4, :],
                    preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    lengths = lengths_ref[:]                 # (B, 1)

    def emitting_initial():
        Mn = PM_ref[R_MSTART, :][None, :] + eM_x
        In = PM_ref[R_ISTART, :][None, :] + eI_x
        I0n = PB_ref[B_I0START, :][None, :] + eI0_x
        return Mn, In, I0n

    def emitting_step():
        M, I, D, I0, hub = M_s[...], I_s[...], D_s[...], I0_s[...], hub_s[...]
        hub_by_pos = jnp.dot(hub, blk_ref[...],
                             preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        I0_by_pos = jnp.dot(I0, blk_ref[...],
                            preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        Mn = eM_x + jnp.maximum(
            jnp.maximum(_roll1(M, 1) + PM_ref[R_AMM, :][None, :],
                        _roll1(I, 1) + PM_ref[R_AIM, :][None, :]),
            jnp.maximum(_roll1(D, 1) + PM_ref[R_ADM, :][None, :],
                        jnp.maximum(hub_by_pos + PM_ref[R_ENTM, :][None, :],
                                    I0_by_pos + PM_ref[R_I0M, :][None, :])))
        In = eI_x + jnp.maximum(
            jnp.maximum(M + PM_ref[R_MI, :][None, :],
                        I + PM_ref[R_II, :][None, :]),
            D + PM_ref[R_DI, :][None, :])
        I0n = eI0_x + jnp.maximum(I0 + PB_ref[B_I0I, :][None, :],
                                  hub + PB_ref[B_HUBI0, :][None, :])
        return Mn, In, I0n

    is_first = t == 0
    Mn0, In0, I0n0 = emitting_initial()
    Mns, Ins, I0ns = emitting_step()
    Mn = jnp.where(is_first, Mn0, Mns)
    In = jnp.where(is_first, In0, Ins)
    I0n = jnp.where(is_first, I0n0, I0ns)

    # length freeze (column t only exists for reads with t < length)
    act = t < lengths                        # (B, 1)
    Mn = jnp.where(act, Mn, M_s[...])
    In = jnp.where(act, In, I_s[...])
    I0n = jnp.where(act, I0n, I0_s[...])

    # ---- silent layer ----
    I0_by_pos_n = jnp.dot(I0n, blk_ref[...],
                          preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    bb = jnp.maximum(
        jnp.maximum(_roll1(Mn, 1) + PM_ref[R_MD, :][None, :],
                    _roll1(In, 1) + PM_ref[R_IDW, :][None, :]),
        I0_by_pos_n + PM_ref[R_I0D, :][None, :])
    Din = bb
    for r in range(n_rounds_p):
        k = 1 << r
        if k >= P:
            break
        Din = jnp.maximum(Din, _roll1(Din, k) + Wd_ref[r, :][None, :])
    # block-end values (one-hot matmul = exact column selection)
    q = jnp.dot(jnp.maximum(
        jnp.maximum(Mn + PM_ref[R_XMU, :][None, :],
                    In + PM_ref[R_XIU, :][None, :]),
        Din + PM_ref[R_XDU, :][None, :]), ul_ref[...],
        preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    sufq = jnp.dot(jnp.maximum(
        jnp.maximum(Mn + PM_ref[R_XMS, :][None, :],
                    In + PM_ref[R_XIS, :][None, :]),
        Din + PM_ref[R_XDS, :][None, :]), suf_ref[...],
        preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)         # (B, 1)
    # unit_start chain: s_0 = sufq; s_c = q_{c-1} + ln(1/2)
    s = jnp.maximum(_roll1(q, 1) + LN05,
                    jnp.where(jax.lax.broadcasted_iota(
                        jnp.int32, q.shape, 1) == 0,
                        jnp.broadcast_to(sufq, q.shape), NEG))
    us = s
    for r in range(n_rounds_c):
        k = 1 << r
        if k >= C:
            break
        us = jnp.maximum(us, _roll1(us, k) + Wu_ref[r, :][None, :])
    r_unit = runit_ref[0, 0]
    ue = jnp.maximum(q, us + r_unit)
    pstart = jnp.max(ue + LN05, axis=1, keepdims=True)   # (B, 1)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1)
    hubn = jnp.where(bcol == 0, NEG,
                     jnp.where(bcol <= C,
                               pltpu.roll(
                                   jnp.pad(us, ((0, 0), (0, nb - C))), 1, 1),
                               jnp.broadcast_to(pstart, (B, nb))))
    hub_by_pos_n = jnp.dot(hubn, blk_ref[...],
                           preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    Dn = jnp.maximum(Din, hub_by_pos_n + PM_ref[R_HUBD, :][None, :])
    Dn = jnp.where(act, Dn, D_s[...])
    hubn = jnp.where(act, hubn, hub_s[...])

    # ---- best-score latch ----
    fin = jnp.maximum(
        jnp.max(Mn + PM_ref[R_LEM, :][None, :], axis=1, keepdims=True),
        jnp.maximum(
            jnp.max(In + PM_ref[R_LEI, :][None, :], axis=1, keepdims=True),
            jnp.max(I0n + PB_ref[B_LEI0, :][None, :], axis=1,
                    keepdims=True)))
    @pl.when(is_first)
    def _():
        best_s[...] = jnp.full((B, 1), NEG, dtype=jnp.float32)
    best_s[...] = jnp.where(t == lengths - 1, fin, best_s[...])

    # ---- commit state + outputs ----
    M_s[...] = Mn
    I_s[...] = In
    D_s[...] = Dn
    I0_s[...] = I0n
    hub_s[...] = hubn
    pM_ref[0] = Mn
    pI_ref[0] = In
    pI0_ref[0] = I0n
    @pl.when(t == L - 1)
    def _():
        best_ref[...] = best_s[...]


def pallas_forward(pm: PallasStructModel, seqs, lengths):
    """Forward pass: returns (best (B,), planes_M (L,B,P), planes_I,
    planes_I0) — column values for the XLA traceback."""
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
    ]
    planes_M, planes_I, planes_I0, best = pl.pallas_call(
        _forward_kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, P), jnp.float32),
            jax.ShapeDtypeStruct((L, B, P), jnp.float32),
            jax.ShapeDtypeStruct((L, B, nb), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, P), jnp.float32),   # M
            pltpu.VMEM((B, P), jnp.float32),   # I
            pltpu.VMEM((B, P), jnp.float32),   # D
            pltpu.VMEM((B, nb), jnp.float32),  # I0
            pltpu.VMEM((B, nb), jnp.float32),  # hub
            pltpu.VMEM((B, 1), jnp.float32),   # best
        ],
    )(seq1h, lengths2, pm.PM, pm.PB, pm.Wd, pm.Wu, pm.blk_onehot,
      pm.ul_onehot, pm.suf_onehot, pm.r_unit)
    return best[:, 0], planes_M, planes_I, planes_I0


CHUNK_B = 256  # per-kernel-instance batch (VMEM budget: ~9MB at P=512)


def _forward_and_traceback(pm, seqs, lengths, return_path: bool):
    """One chunk: Pallas forward + XLA argmax-rederivation traceback."""
    B, L = seqs.shape
    best, pM, pI, pI0 = pallas_forward(pm, seqs, lengths)
    if not return_path:
        return best, None, None
    planes = jnp.concatenate([pM, pI, pI0], axis=2)  # (L, B, S) struct order
    final = planes[jnp.minimum(lengths - 1, L - 1).astype(jnp.int32),
                   jnp.arange(B)]                    # (B, S) own last column
    end_state_s = jnp.argmax(final + pm.log_end_struct[None, :],
                             axis=1).astype(jnp.int32)

    def back_step(cur, inputs):
        v_prev, t = inputs
        prev = jnp.argmax(v_prev + jnp.take(pm.log_T_struct_t, cur, axis=0),
                          axis=1).astype(jnp.int32)
        new_cur = jnp.where(t <= lengths - 1, prev, cur)
        return new_cur, cur

    ts_rev = jnp.arange(L - 1, 0, -1, dtype=jnp.int32)
    cur_last, emitted = jax.lax.scan(back_step, end_state_s,
                                     (planes[L - 2::-1], ts_rev))
    path_s = jnp.concatenate([cur_last[:, None], emitted[::-1].T], axis=1)
    path_s = jnp.where((lengths == 1)[:, None],
                       jnp.broadcast_to(end_state_s[:, None], path_s.shape),
                       path_s)
    path = jnp.take(pm.struct_to_art, path_s)
    end_state = jnp.take(pm.struct_to_art, end_state_s)
    return best, end_state, path


@functools.partial(jax.jit, static_argnames=("return_path",))
def viterbi_pallas_batch(model_arrays, seqs, lengths,
                         return_path: bool = True):
    """Pallas forward + XLA traceback; same contract as
    viterbi_struct_batch (artifact-space path indices)."""
    pm = PallasStructModel(*model_arrays)
    B, L = seqs.shape
    if B <= CHUNK_B:
        return _forward_and_traceback(pm, seqs, lengths, return_path)
    assert B % CHUNK_B == 0, (B, CHUNK_B)
    n_chunks = B // CHUNK_B
    seqs_c = seqs.reshape(n_chunks, CHUNK_B, L)
    lengths_c = lengths.reshape(n_chunks, CHUNK_B)
    out = jax.vmap(lambda q, ln: _forward_and_traceback(pm, q, ln,
                                                        return_path))(
        seqs_c, lengths_c)
    if not return_path:
        return out[0].reshape(B), None, None
    best, end_state, path = out
    return (best.reshape(B), end_state.reshape(B),
            path.reshape(B, L))
