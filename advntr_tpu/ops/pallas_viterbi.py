"""Pallas TPU kernel for the structured Viterbi with inline provenance.

One `pallas_call` runs the whole forward scan: the TPU grid is sequential,
so the DP state (M/I/D/hub/I0 value arrays and their provenance) lives in
VMEM scratch across grid steps; each grid step processes T_BLK sequence
columns to amortize per-step pipeline overhead.  The XLA version
(ops/viterbi_struct) round-trips ~60 intermediate (B, P) arrays per column
through HBM and its traceback re-derives argmaxes against the dense
eliminated transition matrix — an O(B·S) pass per column that costs about
as much as the forward itself.  Here every max carries its argmax origin
(the emitting struct state of the previous column) resolved inline in VMEM,
the kernel emits int16 origin planes (int32 automatically when the code
space outgrows int16, or via ADVNTR_TPU_ORIGIN32), and the backward pass is
a few iota-compare selects per column.

Performance structure (why the kernel looks the way it does):

- Selection/expansion matmuls are batched: per column there are exactly
  five MXU ops — emissions (B,4)x(4,2P+nb), the prev-column hub+I0
  expansion as one (2B,nb)x(nb,P), the current-column I0 expansion, the
  block-end extraction (values and origins stacked: (2B,P)x(P,C+1)), and
  the new-hub expansion (B,nb)x(nb,P).  Small-K MXU ops are latency-bound,
  so fewer-but-taller beats many-and-short.
- Origins that a matmul would have to move are replaced by HUB sentinel
  codes (2P+nb+b): the forward writes one extra tiny (B, nb) plane per
  column (the resolved origins of the *previous* column's hub states) and
  the backward resolves sentinels through it.  This removes two of the
  three origin expansions entirely.
- Lane rolls never mask their fill: every rolled value is immediately
  added to a weight vector that is already -1e30 at roll-in lanes (block
  starts / window-crossing positions), so wraparound garbage (always <= 0:
  log-probabilities) can never win a max.
- Rolled constant origins (idxM, idxI) are computed arithmetically
  (iota - 1), not rolled.
- The delete-chain shift-max doubling stops at the longest block width
  (windows crossing a block boundary are -inf, so further rounds are
  no-ops), not at log2(P).

Key precomputation: the delete-chain tropical scan
``D_j = max(D_{j-1} + dd_j, b_j)`` unrolls into shift-max rounds
``v = max(v, shift(v, 2^r) + W_r)`` where ``W_r[j] = sum of dd over
(j-2^r, j]`` — additive window weights precomputed on host, -inf where a
window crosses a block boundary (chain reset).  Origin tracking composes
exactly through the doubling rounds because weights only accumulate, never
reorder.  The cross-unit unit_start chain uses the same trick along the
unit axis with constant decay.

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

# origin planes dtype: int16 halves traceback HBM traffic.  Selected per
# model: int16 while origin codes (< 2P+2nb including hub sentinels) fit,
# int32 otherwise; env ADVNTR_TPU_ORIGIN32 forces int32 for debugging.
_FORCE_ORIGIN32 = os.environ.get("ADVNTR_TPU_ORIGIN32", "0") == "1"


def _origin_dtype(P: int, nb: int):
    if _FORCE_ORIGIN32 or 2 * P + 2 * nb > np.iinfo(np.int16).max:
        return jnp.int32
    return jnp.int16


# row indices in the packed (N_ROWS, P) parameter matrix
(R_AMM, R_AIM, R_ADM, R_ENTM, R_I0M, R_MI, R_II, R_DI, R_MD, R_IDW,
 R_I0D, R_HUBD, R_XM, R_XI, R_XD, R_LEM, R_LEI, R_MSTART, R_ISTART,
 R_BLKID) = range(20)
N_ROWS = 20

(B_I0I, B_HUBI0, B_I0START, B_LEI0) = range(4)
N_BROWS = 4

# sequence columns per grid step (static unroll inside the kernel)
T_BLK = int(os.environ.get("ADVNTR_TPU_TBLK", "8"))


@dataclasses.dataclass
class PallasStructModel:
    """Packed device tensors for the Pallas fused kernel."""
    PM: jnp.ndarray          # (N_ROWS, P)
    PB: jnp.ndarray          # (N_BROWS, nb)
    EMB: jnp.ndarray         # (4, 2P+nb) emission tables [eM | eI | eI0]
    Wd: jnp.ndarray          # (n_rounds_p, P) delete-chain window weights
    Wu: jnp.ndarray          # (n_rounds_c, C) unit-chain window weights
    blk_onehot: jnp.ndarray  # (nb, P)
    ulsuf_onehot: jnp.ndarray  # (P, C+1): unit-last columns + suffix-last
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
        # block exits, masked to the extraction columns (unit lasts + the
        # suffix last); the ulsuf one-hot separates them again
        xm, xi, xd = clean(sm.xm), clean(sm.xi), clean(sm.xd)
        last_mask = np.zeros(P, dtype=bool)
        last_mask[np.asarray(sm.unit_last)] = True
        if sm.suffix_last >= 0:
            last_mask[sm.suffix_last] = True
        PM[R_XM] = np.where(last_mask, xm, np.float64(NEG))
        PM[R_XI] = np.where(last_mask, xi, np.float64(NEG))
        PM[R_XD] = np.where(last_mask, xd, np.float64(NEG))
        le = clean(sm.log_end_struct)
        PM[R_LEM] = le[:P]
        PM[R_LEI] = le[P:2 * P]
        PM[R_MSTART] = clean(sm.M_start)
        PM[R_ISTART] = clean(sm.I_start)
        PM[R_BLKID] = 2 * P + np.asarray(sm.blk_idx, dtype=np.float64)

        PB = np.full((N_BROWS, nb), np.float64(NEG))
        PB[B_I0I] = clean(sm.i0_i)
        PB[B_HUBI0] = clean(sm.hub_i0)
        PB[B_I0START] = clean(sm.I0_start)
        PB[B_LEI0] = le[2 * P:]

        EMB = np.concatenate([clean(sm.eM).T, clean(sm.eI).T,
                              clean(sm.eI0).T], axis=1)   # (4, 2P+nb)

        # delete-chain window weights: W_r[j] = sum dd over (j-2^r, j],
        # -inf when the window crosses a block start (dd=-inf there).
        # Rounds stop once 2^r reaches the longest block width: every
        # wider window crosses a boundary, making the whole row -inf.
        dd = clean(sm.dd)
        finite = dd > np.float64(NEG) / 2
        span = run = 0
        for f in finite:
            run = run + 1 if f else 0
            span = max(span, run)
        max_block = span + 1            # chain reaches back block-width - 1
        n_rounds_p = max(1, int(np.ceil(np.log2(max(max_block, 2)))))
        Wd = np.full((n_rounds_p, P), np.float64(NEG))
        Wd[0] = dd.copy()               # W_0 window size 1
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
        ulsuf_onehot = np.zeros((P, C + 1))
        ulsuf_onehot[np.asarray(sm.unit_last), np.arange(C)] = 1.0
        if sm.suffix_last >= 0:
            ulsuf_onehot[sm.suffix_last, C] = 1.0

        f32 = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            PM=f32(PM), PB=f32(PB), EMB=f32(EMB), Wd=f32(Wd), Wu=f32(Wu),
            blk_onehot=f32(blk_onehot), ulsuf_onehot=f32(ulsuf_onehot),
            r_unit=f32(np.array([[clean(np.array(sm.r_unit)).item()]])),
            struct_to_art=jnp.asarray(np.asarray(sm.struct_to_art)))

    def flat(self):
        return dataclasses.astuple(self)


def _roll(x, k):
    """Shift x right by k along the last axis.  Wraparound lanes are NOT
    masked: callers add a weight vector that is -1e30 at every roll-in
    lane, and rolled values are <= 0, so garbage can never win a max."""
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


def _fused_kernel(seq1h_ref, lengths_ref, PM_ref, PB_ref, EMB_ref, Wd_ref,
                  Wu_ref, blk_ref, ulsuf_ref, runit_ref,
                  oM_ref, oI_ref, oI0_ref, oHub_ref, best_ref, bstate_ref,
                  M_s, I_s, D_s, I0_s, hub_s, Do_s, hubpo_s,
                  best_s, bstate_s):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    T = seq1h_ref.shape[0]
    B, P = M_s.shape
    nb = I0_s.shape[1]
    C = ulsuf_ref.shape[1] - 1
    n_rounds_p = Wd_ref.shape[0]
    n_rounds_c = Wu_ref.shape[0]
    lengths = lengths_ref[:]                 # (B, 1)

    # origin-code constants (struct space: M_p = p, I_p = P+p, I0_b = 2P+b,
    # hub_b sentinel = 2P+nb+b, resolved by the backward via the oHub plane)
    idxM = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1).astype(jnp.float32)
    idxI = idxM + jnp.float32(P)
    idxM1 = idxM - 1.0                       # rolled-by-1 constants
    idxI1 = idxI - 1.0
    idxI0 = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1).astype(
        jnp.float32) + jnp.float32(2 * P)
    hubsent_b = idxI0 + jnp.float32(nb)      # (B, nb) hub sentinels
    blkid = jnp.broadcast_to(PM_ref[R_BLKID, :][None, :], (B, P))
    hubsent_p = blkid + jnp.float32(nb)      # (B, P) hub sentinels
    neg1 = jnp.float32(-1.0)
    r_unit = runit_ref[0, 0]

    @pl.when(i == 0)
    def _():
        M_s[...] = jnp.full((B, P), NEG, dtype=jnp.float32)
        I_s[...] = jnp.full((B, P), NEG, dtype=jnp.float32)
        D_s[...] = jnp.full((B, P), NEG, dtype=jnp.float32)
        I0_s[...] = jnp.full((B, nb), NEG, dtype=jnp.float32)
        hub_s[...] = jnp.full((B, nb), NEG, dtype=jnp.float32)
        Do_s[...] = jnp.zeros((B, P), dtype=jnp.float32)
        hubpo_s[...] = jnp.zeros((B, nb), dtype=jnp.float32)
        best_s[...] = jnp.full((B, 1), NEG, dtype=jnp.float32)
        bstate_s[...] = jnp.zeros((B, 1), dtype=jnp.float32)

    # all T_BLK columns' emissions in ONE MXU op per grid step: the
    # per-column (B,4)x(4,2P+nb) dots are K=4 latency-bound, so one
    # (T·B,4)x(4,2P+nb) beats T small dependent ones
    e_blk = _dot(seq1h_ref[...].reshape(T * B, 4), EMB_ref[...])

    for tt in range(T):
        t = i * T + tt
        e_all = e_blk[tt * B:(tt + 1) * B]   # (B, 2P+nb)
        eM_x = e_all[:, :P]
        eI_x = e_all[:, P:2 * P]
        eI0_x = e_all[:, 2 * P:2 * P + nb]
        act = t < lengths                    # (B, 1)
        # t = i*T + tt is 0 only when tt == 0 (i == 0 checked dynamically);
        # for tt > 0 the first-column selects vanish statically
        is_first = (t == 0) if tt == 0 else None

        M, I, D = M_s[...], I_s[...], D_s[...]
        I0, hub, Do = I0_s[...], hub_s[...], Do_s[...]

        # ---- emitting layer (prev-column sources) ----
        exp2 = _dot(jnp.concatenate([hub, I0], axis=0), blk_ref[...])
        hub_by_pos = exp2[:B]
        I0_by_pos = exp2[B:]
        v, o = _pick(_roll(M, 1) + PM_ref[R_AMM, :][None, :], idxM1,
                     _roll(I, 1) + PM_ref[R_AIM, :][None, :], idxI1)
        v, o = _pick(v, o, _roll(D, 1) + PM_ref[R_ADM, :][None, :],
                     _roll(Do, 1))
        v, o = _pick(v, o, hub_by_pos + PM_ref[R_ENTM, :][None, :],
                     hubsent_p)
        v, o = _pick(v, o, I0_by_pos + PM_ref[R_I0M, :][None, :], blkid)
        Mn, OMn = eM_x + v, o
        v, o = _pick(M + PM_ref[R_MI, :][None, :], idxM,
                     I + PM_ref[R_II, :][None, :], idxI)
        v, o = _pick(v, o, D + PM_ref[R_DI, :][None, :], Do)
        In, OIn = eI_x + v, o
        v, o = _pick(I0 + PB_ref[B_I0I, :][None, :], idxI0,
                     hub + PB_ref[B_HUBI0, :][None, :], hubsent_b)
        I0n, OI0n = eI0_x + v, o
        # first column: start weights
        if is_first is not None:
            Mn = jnp.where(is_first, PM_ref[R_MSTART, :][None, :] + eM_x,
                           Mn)
            In = jnp.where(is_first, PM_ref[R_ISTART, :][None, :] + eI_x,
                           In)
            I0n = jnp.where(is_first,
                            PB_ref[B_I0START, :][None, :] + eI0_x, I0n)
            OMn = jnp.where(is_first, neg1, OMn)
            OIn = jnp.where(is_first, neg1, OIn)
            OI0n = jnp.where(is_first, neg1, OI0n)
        # length freeze (column t only exists for reads with t < length)
        Mn = jnp.where(act, Mn, M)
        In = jnp.where(act, In, I)
        I0n = jnp.where(act, I0n, I0)

        # ---- silent layer (within-column closure, with provenance) ----
        I0e = _dot(I0n, blk_ref[...])
        bv, bo = _pick(_roll(Mn, 1) + PM_ref[R_MD, :][None, :], idxM1,
                       _roll(In, 1) + PM_ref[R_IDW, :][None, :], idxI1)
        bv, bo = _pick(bv, bo, I0e + PM_ref[R_I0D, :][None, :], blkid)
        Din, Dino = bv, bo
        for r in range(n_rounds_p):
            k = 1 << r
            if k >= P:
                break
            Din, Dino = _pick(Din, Dino,
                              _roll(Din, k) + Wd_ref[r, :][None, :],
                              _roll(Dino, k))
        # block-end extraction: values and origins ride ONE matmul
        qv, qo = _pick(Mn + PM_ref[R_XM, :][None, :], idxM,
                       In + PM_ref[R_XI, :][None, :], idxI)
        qv, qo = _pick(qv, qo, Din + PM_ref[R_XD, :][None, :], Dino)
        qq = _dot(jnp.concatenate([qv, qo], axis=0), ulsuf_ref[...])
        q = qq[:B, :C]                       # (B, C) unit-end values
        qorig = qq[B:, :C]
        sufq = qq[:B, C:C + 1]               # (B, 1) suffix-end value
        sufqorig = qq[B:, C:C + 1]
        # unit_start chain: s_0 = sufq; s_c = q_{c-1} + ln(1/2)
        ccol = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        s = jnp.where(ccol == 0, jnp.broadcast_to(sufq, q.shape),
                      _roll(q, 1) + LN05)
        so = jnp.where(ccol == 0, jnp.broadcast_to(sufqorig, q.shape),
                       _roll(qorig, 1))
        us, uso = s, so
        for r in range(n_rounds_c):
            k = 1 << r
            if k >= C:
                break
            us, uso = _pick(us, uso,
                            _roll(us, k) + Wu_ref[r, :][None, :],
                            _roll(uso, k))
        uev, ueo = _pick(q, qorig, us + r_unit, uso)
        pstart, ci = _max_first_idx(uev + LN05)            # (B, 1) each
        pstartorig = jnp.sum(
            jnp.where(jax.lax.broadcasted_iota(
                jnp.int32, uev.shape, 1).astype(jnp.float32) == ci,
                ueo, 0.0), axis=1, keepdims=True)
        bcol = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1)
        us_p = _roll(jnp.pad(us, ((0, 0), (0, nb - C))), 1)
        uso_p = _roll(jnp.pad(uso, ((0, 0), (0, nb - C))), 1)
        hubn = jnp.where(bcol == 0, NEG,
                         jnp.where(bcol <= C, us_p,
                                   jnp.broadcast_to(pstart, (B, nb))))
        hubon = jnp.where(bcol == 0, neg1,
                          jnp.where(bcol <= C, uso_p,
                                    jnp.broadcast_to(pstartorig, (B, nb))))
        hub_e = _dot(hubn, blk_ref[...])
        Dn, Don = _pick(Din, Dino,
                        hub_e + PM_ref[R_HUBD, :][None, :], hubsent_p)
        hubpo_old = hubpo_s[...]
        Dn = jnp.where(act, Dn, D)
        Don = jnp.where(act, Don, Do)
        hubn = jnp.where(act, hubn, hub)
        hubon = jnp.where(act, hubon, hubpo_old)

        # ---- best score + best end state (latched at the last column) ----
        fin_cat = jnp.concatenate(
            [Mn + PM_ref[R_LEM, :][None, :],
             In + PM_ref[R_LEI, :][None, :],
             I0n + PB_ref[B_LEI0, :][None, :]], axis=1)     # (B, 2P+nb)
        fin, fo = _max_first_idx(fin_cat)
        latch = t == lengths - 1
        best_s[...] = jnp.where(latch, fin, best_s[...])
        bstate_s[...] = jnp.where(latch, fo, bstate_s[...])

        # ---- outputs + state commit ----
        # round before the int cast: origins ride f32 one-hot matmuls whose
        # HIGHEST-precision result can be off by ~1e-6 relative
        oM_ref[tt] = (OMn + 0.5).astype(oM_ref.dtype)
        oI_ref[tt] = (OIn + 0.5).astype(oI_ref.dtype)
        oI0_ref[tt] = (OI0n + 0.5).astype(oI0_ref.dtype)
        # oHub[t] holds the resolved origins of the hub at column t-1 —
        # exactly what a HUB sentinel read from a column-t plane refers to
        oHub_ref[tt] = (hubpo_old + 0.5).astype(oHub_ref.dtype)
        M_s[...] = Mn
        I_s[...] = In
        D_s[...] = Dn
        I0_s[...] = I0n
        hub_s[...] = hubn
        Do_s[...] = Don
        hubpo_s[...] = hubon

    @pl.when(i == nblk - 1)
    def _():
        best_ref[...] = best_s[...]
        bstate_ref[...] = (bstate_s[...] + 0.5).astype(jnp.int32)


def pallas_fused_forward(pm: PallasStructModel, seqs, lengths,
                         interpret: bool = False):
    """Fused forward: returns (best (B,), best_state (B,) struct index,
    origins_M (L,B,P), origins_I (L,B,P), origins_I0 (L,B,nb),
    origins_Hub (L,B,nb)) — int16/int32 provenance planes for the gather
    traceback.  L must be a multiple of T_BLK (viterbi_pallas_batch pads)."""
    B, L = seqs.shape
    P = pm.PM.shape[1]
    nb = pm.PB.shape[1]
    origin_dtype = _origin_dtype(P, nb)
    assert L % T_BLK == 0, (L, T_BLK)
    seq1h = jax.nn.one_hot(jnp.clip(seqs.astype(jnp.int32), 0, 3), 4,
                           dtype=jnp.float32)               # (B, L, 4)
    seq1h = jnp.transpose(seq1h, (1, 0, 2))                 # (L, B, 4)
    lengths2 = lengths.astype(jnp.int32)[:, None]           # (B, 1)

    in_specs = [
            pl.BlockSpec((T_BLK, B, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lengths
            pl.BlockSpec(memory_space=pltpu.VMEM),  # PM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # PB
            pl.BlockSpec(memory_space=pltpu.VMEM),  # EMB
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wu
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blk_onehot
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ulsuf_onehot
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_unit
    ]
    out_specs = [
        pl.BlockSpec((T_BLK, B, P), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T_BLK, B, P), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T_BLK, B, nb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T_BLK, B, nb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    oM, oI, oI0, oHub, best, bstate = pl.pallas_call(
        _fused_kernel,
        grid=(L // T_BLK,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, P), origin_dtype),
            jax.ShapeDtypeStruct((L, B, P), origin_dtype),
            jax.ShapeDtypeStruct((L, B, nb), origin_dtype),
            jax.ShapeDtypeStruct((L, B, nb), origin_dtype),
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
            pltpu.VMEM((B, nb), jnp.float32),  # prev-column hub origins
            pltpu.VMEM((B, 1), jnp.float32),   # best
            pltpu.VMEM((B, 1), jnp.float32),   # best state
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seq1h, lengths2, pm.PM, pm.PB, pm.EMB, pm.Wd, pm.Wu, pm.blk_onehot,
      pm.ulsuf_onehot, pm.r_unit)
    return best[:, 0], bstate[:, 0], oM, oI, oI0, oHub


def _backward_kernel(lengths_ref, bstate_ref, oM_ref, oI_ref, oI0_ref,
                     oHub_ref, path_ref, cur_s, path_s):
    """Grid step g processes the T_BLK-column block L/T-1-g in reverse
    column order: records the current state, then hops to its predecessor
    via the block's origin planes; HUB sentinels resolve through the oHub
    plane of the same column (which holds the previous column's hub
    origins).  The per-column select is an iota-compare + masked row-sum —
    TPU-friendly, unlike a lane-axis gather.  The path accumulates in an
    (L, B) VMEM scratch and flushes once at the last step."""
    g = pl.program_id(0)
    nblk = pl.num_programs(0)
    T = oM_ref.shape[0]
    B = cur_s.shape[0]
    P = oM_ref.shape[2]
    nb = oI0_ref.shape[2]
    lengths = lengths_ref[:]                      # (B, 1)

    @pl.when(g == 0)
    def _():
        cur_s[...] = bstate_ref[...]

    iotaP = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    iotab = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1)
    for tt in range(T - 1, -1, -1):
        t = (nblk - 1 - g) * T + tt
        cur = cur_s[...]                          # (B, 1) int32
        path_s[pl.ds(t, 1), :] = cur.reshape(1, B)
        selM = jnp.sum(jnp.where(iotaP == cur,
                                 oM_ref[tt].astype(jnp.int32), 0),
                       axis=1, keepdims=True)
        selI = jnp.sum(jnp.where(iotaP == cur - P,
                                 oI_ref[tt].astype(jnp.int32), 0),
                       axis=1, keepdims=True)
        sel0 = jnp.sum(jnp.where(iotab == cur - 2 * P,
                                 oI0_ref[tt].astype(jnp.int32), 0),
                       axis=1, keepdims=True)
        prev = jnp.where(cur < P, selM,
                         jnp.where(cur < 2 * P, selI, sel0))
        selH = jnp.sum(jnp.where(iotab == prev - (2 * P + nb),
                                 oHub_ref[tt].astype(jnp.int32), 0),
                       axis=1, keepdims=True)
        prev = jnp.where(prev >= 2 * P + nb, selH, prev)
        hop = (t <= lengths - 1) & (t >= 1)
        cur_s[...] = jnp.where(hop, prev, cur)

    @pl.when(g == nblk - 1)
    def _():
        path_ref[...] = path_s[...]


def _backward_tblk(B: int, P: int, L: int) -> int:
    """Columns per backward grid step: largest power of two <= T_BLK whose
    double-buffered (T, B, P) int16 input blocks fit the VMEM budget.  The
    backward runs at the FULL batch (chunks merged), where its (B, P)
    selects amortize op-issue overhead 8x better than per-chunk walks."""
    budget = 80 * 1024 * 1024
    t = max(1, min(T_BLK, budget // max(1, B * P * 2 * 2 * 2)))
    t = 1 << (t.bit_length() - 1)
    while L % t:
        t >>= 1
    return max(t, 1)


def pallas_backward(lengths, bstate, oM, oI, oI0, oHub,
                    interpret: bool = False):
    """Walk the origin planes back to the path: (B, L) struct indices."""
    L, B, P = oM.shape
    nb = oI0.shape[2]
    T_BWD = _backward_tblk(B, P, L)
    nblk = L // T_BWD
    lengths2 = lengths.astype(jnp.int32)[:, None]
    bstate2 = bstate.astype(jnp.int32)[:, None]
    rev = lambda g, n=nblk: (n - 1 - g, 0, 0)
    path_rev = pl.pallas_call(
        _backward_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lengths
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bstate
            pl.BlockSpec((T_BWD, B, P), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BWD, B, P), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BWD, B, nb), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BWD, B, nb), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.int32),
                        pltpu.VMEM((L, B), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths2, bstate2, oM, oI, oI0, oHub)
    return path_rev.T                              # (B, L)


# per-kernel-instance batch cap: VMEM live-range pressure bounds it (the
# raised vmem limit admits 512 at P=512; measured fastest fused); tunable.
# Rounded down to a power of two: pad_rows pads batches to powers of two and
# the chunk loop asserts B % chunk == 0.
CHUNK_B = 1 << (int(os.environ.get("ADVNTR_TPU_CHUNK_B", "512")).bit_length()
                - 1)


def _chunk_for(P: int) -> int:
    """Scale the per-instance batch down with P so kernel temporaries
    (~30 live (B, P) f32 arrays) stay inside the VMEM budget."""
    budget = CHUNK_B * 512
    c = 1 << max(3, (budget // max(P, 1)).bit_length() - 1)
    return min(CHUNK_B, c)


def _forward_and_traceback(pm, seqs, lengths, return_path: bool,
                           interpret: bool = False):
    """One chunk: Pallas fused forward + Pallas origin-walk backward.
    (A single merged wide backward over all chunks was tried and REGRESSED
    — the (L, B, P) plane transposes cost more than the wider per-column
    selects save; drive_verify measured 38.6k vs 42.0k reads/s.)"""
    B, L = seqs.shape
    best, end_state_s, oM, oI, oI0, oHub = pallas_fused_forward(
        pm, seqs, lengths, interpret=interpret)
    if not return_path:
        return best, None, None
    path_s = pallas_backward(lengths, end_state_s, oM, oI, oI0, oHub,
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
    L_pad = ((L + T_BLK - 1) // T_BLK) * T_BLK
    if L_pad != L:
        seqs = jnp.pad(seqs, ((0, 0), (0, L_pad - L)))
    chunk_b = _chunk_for(pm.PM.shape[1])
    if B <= chunk_b:
        best, end_state, path = _forward_and_traceback(
            pm, seqs, lengths, return_path, interpret=interpret)
        if path is not None:
            path = path[:, :L]
        return best, end_state, path
    assert B % chunk_b == 0, (B, chunk_b)
    n_chunks = B // chunk_b
    seqs_c = seqs.reshape(n_chunks, chunk_b, L_pad)
    lengths_c = lengths.reshape(n_chunks, chunk_b)
    out = jax.vmap(lambda q, ln: _forward_and_traceback(
        pm, q, ln, return_path, interpret=interpret))(seqs_c, lengths_c)
    if not return_path:
        return out[0].reshape(B), None, None
    best, end_state, path = out
    return (best.reshape(B), end_state.reshape(B),
            path.reshape(B, L_pad)[:, :L])
