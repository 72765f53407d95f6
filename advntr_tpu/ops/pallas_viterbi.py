"""Pallas TPU kernel for the structured Viterbi with inline provenance and
fused per-read analytics.

One `pallas_call` runs the whole forward scan: the TPU grid is sequential,
so the DP state (the stacked M|I value plane, D/hub/I0 values and their
provenance) lives in VMEM scratch across grid steps; each grid step
processes T_BLK sequence columns to amortize per-step pipeline overhead.
A second `pallas_call` walks the emitted origin planes backward and — new
in round 3 — computes every per-read genotyping statistic inline during
the walk, so the pipeline returns only O(B) scalars (the XLA analytics
pass over (B, L) paths is gone from the hot path; it remains the
conformance oracle for the struct kernel).

Performance structure (why the kernel looks the way it is — the VPU here
is op-launch-bound, not element-bound, so the design minimizes op count):

- M and I states ride ONE stacked (B, 2P) lane axis.  The three shared
  source candidates (M/I/D of the previous column) become three stacked
  adds + picks instead of six, one roll of the stacked plane serves both
  halves (roll-in garbage lanes land on block starts whose stacked weight
  is -1e30 and can never win), and the length-freeze, emission add, and
  origin-plane write are each ONE (B, 2P) op.
- Per column there are exactly five MXU ops, and three of them carry
  their additive weights as a ones-column row (dot([x, 1], [W; w]) =
  x·W + w), removing the follow-up adds: emissions+match-bits
  (T·B,4)x(4,3P+nb), the prev-column hub/I0 expansion with ent_m/i0_m
  folded in, the current-column I0 expansion with i0_d folded in, the
  block-end extraction (values and origins stacked), and the new-hub
  expansion with hub_d folded in.
- The delete-chain shift-max rounds run on a stacked (B, 2P) value|origin
  plane: one roll + one add + one compare + one select per round (window
  weights are -inf where a window crosses a block start, so value-half
  garbage never wins and the origin half follows the value half's take
  mask exactly).
- The final score/end-state reduction runs ONCE at the last grid step
  from the length-frozen state planes (freezing makes the last column's
  values persist), not per column.
- Origin planes carry a packed MATCH BIT: the emission matmul's extra
  (4, 2P) block emits 1.5 + MBIT·[seq_t == expected_base(p)] per M lane
  (1.5 = the +1 storage offset plus round-to-int), so the backward learns
  "was this path state a base match" from the same masked row-sum that
  resolves the predecessor — no sequence input, no extra plane.
- Origins that a matmul would have to move are replaced by HUB sentinel
  codes (2P+nb+b): the forward writes one tiny (B, nb) plane per column
  (the resolved origins of the *previous* column's hub states) and the
  backward resolves sentinels through it.
- The backward runs UNCHUNKED over all forward chunks at once: the
  vmapped forward emits (n_chunks, L, chunk, 2P) planes and the backward
  block-reads that 4D layout directly (leading-axis merge is free), so
  its ~40 per-column (B, 1) scalar updates amortize over the full batch.

Key precomputation: the delete-chain tropical scan
``D_j = max(D_{j-1} + dd_j, b_j)`` unrolls into shift-max rounds
``v = max(v, shift(v, 2^r) + W_r)`` where ``W_r[j] = sum of dd over
(j-2^r, j]`` — additive window weights precomputed on host, -inf where a
window crosses a block boundary (chain reset).  Origin tracking composes
exactly through the doubling rounds because weights only accumulate,
never reorder.  The cross-unit unit_start chain uses the same trick along
the unit axis with constant decay.

Reference semantics: pomegranate's Viterbi recurrence
(reference pomegranate/hmm.pyx:1970-2130), silent states pre-eliminated
(models/compiler.py); per-read analytics per reference hmm_utils.py:155-286
semantics (see engine/device_analytics.analytics_from_path, the XLA
conformance twin).  Conformance contract: the decoded path must rescore
to the optimal log-probability and analytics must match the struct kernel
bit-exactly (tests/test_pallas_viterbi.py).
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

from advntr_tpu.models.graph import K_MATCH, R_SUFFIX, R_REPEAT, R_PREFIX

NEG = np.float32(-1e30)
LN05 = float(np.log(0.5))
BIG = np.int32(1 << 30)
MIN_BP_IN_REPEAT = 3  # reference: hmm_utils.py:165

# origin planes dtype: int16 halves traceback HBM traffic.  Selected per
# model: int16 while origin codes + the match bit fit (codes < MBIT=2^13,
# stored value < 2^14), int32 (MBIT=2^20) otherwise; env
# ADVNTR_TPU_ORIGIN32 forces int32 for debugging.
_FORCE_ORIGIN32 = os.environ.get("ADVNTR_TPU_ORIGIN32", "0") == "1"
MBIT16 = 1 << 13
MBIT32 = 1 << 20


def _origin_params(P: int, nb: int):
    """(dtype, match-bit value) for the origin planes of a (P, nb) model."""
    if _FORCE_ORIGIN32 or 2 * P + 2 * nb + 2 >= MBIT16:
        return jnp.int32, MBIT32
    return jnp.int16, MBIT16


# rows of the stacked (N2_ROWS, 2P) parameter matrix; each row is an
# [M-half | I-half] pair consumed by one (B, 2P) op
(W2_A,       # [a_mm | mi]
 W2_B,       # [a_im | ii]
 W2_C,       # [a_dm | di]
 W2_D,       # [md   | idw]
 W2_X,       # [xm   | xi]   (masked to extraction columns)
 W2_LE,      # [log_end_M | log_end_I]
 W2_START,   # [M_start | I_start]
 W2_XD,      # [xd (masked) | -inf]
 W2_BLKID,   # [2P + blk_idx | 0]
 ) = range(9)
N2_ROWS = 9

# rows of the stacked (NB2_ROWS, 2nb) block matrix ([I0-half | hub-half])
(B2_IH,      # [i0_i | hub_i0]
 B2_START,   # [I0_start | -inf]
 B2_LE,      # [log_end_I0 | -inf]
 ) = range(3)
NB2_ROWS = 3

# lanes of the (B, 16) int32 stats output
(S_NMATCH, S_REPBP, S_LBP, S_RBP, S_LMATCH, S_RMATCH,
 S_STARTS, S_ENDS, S_FS, S_LS, S_FE, S_LE) = range(12)
N_STATS = 16

# sequence columns per grid step (static unroll inside the kernel)
T_BLK = int(os.environ.get("ADVNTR_TPU_TBLK", "8"))


@dataclasses.dataclass
class PallasStructModel:
    """Packed device tensors for the Pallas fused kernel."""
    PM2: jnp.ndarray         # (N2_ROWS, 2P) stacked position rows
    PB2: jnp.ndarray         # (NB2_ROWS, 2nb) stacked block rows
    EMB: jnp.ndarray         # (4, 4P+nb): [eM | eI | eI0 | 1.5+MBIT·exp1h | 1.5]
    Wd2: jnp.ndarray         # (n_rounds_p, 2P) delete-chain windows [W | 0]
    Wu: jnp.ndarray          # (n_rounds_c, C) unit-chain window weights
    W_hio: jnp.ndarray       # (2nb+1, 2P): [hub->pos | 0; 0 | I0->pos; ent_m | i0_m]
    W_i0e: jnp.ndarray       # (nb+1, P): [blk_onehot; i0_d]
    W_hube: jnp.ndarray      # (nb+1, P): [blk_onehot; hub_d]
    ulsuf: jnp.ndarray       # (P, C+1): unit-last columns + suffix-last
    r_unit: jnp.ndarray      # (1, 1)
    packMI: jnp.ndarray      # (1, 2P) int32: (region<<20) | (unit+1)
    packB: jnp.ndarray       # (1, 2nb) int32 (hub half zero)
    struct_to_art: jnp.ndarray  # (2P+nb,) struct index -> artifact index

    @classmethod
    def from_struct(cls, sm, art, dtype=jnp.float32) -> "PallasStructModel":
        P, C, nb = sm.P, sm.C, sm.nb
        _, mbit = _origin_params(P, nb)

        def clean(x):
            x = np.asarray(x, dtype=np.float64)
            return np.where(np.isfinite(x), x, np.float64(NEG))

        def stack(m_half, i_half):
            return np.concatenate([clean(m_half), clean(i_half)])

        le = clean(sm.log_end_struct)
        last_mask = np.zeros(P, dtype=bool)
        last_mask[np.asarray(sm.unit_last)] = True
        if sm.suffix_last >= 0:
            last_mask[sm.suffix_last] = True
        xm = np.where(last_mask, clean(sm.xm), np.float64(NEG))
        xi = np.where(last_mask, clean(sm.xi), np.float64(NEG))
        xd = np.where(last_mask, clean(sm.xd), np.float64(NEG))

        PM2 = np.full((N2_ROWS, 2 * P), np.float64(NEG))
        PM2[W2_A] = stack(sm.a_mm, sm.mi)
        PM2[W2_B] = stack(sm.a_im, sm.ii)
        PM2[W2_C] = stack(sm.a_dm, sm.di)
        PM2[W2_D] = stack(sm.md, sm.idw)
        PM2[W2_X] = np.concatenate([xm, xi])
        PM2[W2_LE] = np.concatenate([le[:P], le[P:2 * P]])
        PM2[W2_START] = stack(sm.M_start, sm.I_start)
        PM2[W2_XD, :P] = xd
        PM2[W2_BLKID] = 0.0
        PM2[W2_BLKID, :P] = 2 * P + np.asarray(sm.blk_idx, dtype=np.float64)

        PB2 = np.full((NB2_ROWS, 2 * nb), np.float64(NEG))
        PB2[B2_IH] = stack(sm.i0_i, sm.hub_i0)
        PB2[B2_START, :nb] = clean(sm.I0_start)
        PB2[B2_LE, :nb] = le[2 * P:]

        # emissions + the match-bit block: column p of the last 2P columns
        # yields 1.5 + MBIT when the symbol equals position p's expected
        # base (M half; the 1.5 covers the +1 origin-storage offset and the
        # round-to-int), constant 1.5 on the I half
        s2a = np.asarray(sm.struct_to_art)
        exp_struct = np.asarray(art.exp_base)[s2a[:P]]
        exp1h = np.zeros((4, P))
        for b in range(4):
            exp1h[b] = np.where(exp_struct == b, float(mbit), 0.0)
        EMB = np.concatenate(
            [clean(sm.eM).T, clean(sm.eI).T, clean(sm.eI0).T,
             1.5 + exp1h, np.full((4, P), 1.5)], axis=1)  # (4, 3P+nb+... )

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
        Wd2 = np.concatenate([Wd, np.zeros((n_rounds_p, P))], axis=1)
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
        # expansion matrices with the additive row folded in via a trailing
        # ones input column: dot([x, 1], [O; w]) = x_by_pos + w
        W_hio = np.zeros((2 * nb + 1, 2 * P))
        # input lanes follow the XH layout [I0 | hub]; output halves are
        # [hub_by_pos + ent_m | I0_by_pos + i0_m]
        W_hio[:nb, P:] = blk_onehot              # I0 input -> second half
        W_hio[nb:2 * nb, :P] = blk_onehot        # hub input -> first half
        W_hio[2 * nb] = np.concatenate([clean(sm.ent_m), clean(sm.i0_m)])
        W_i0e = np.concatenate([blk_onehot, clean(sm.i0_d)[None, :]])
        W_hube = np.concatenate([blk_onehot, clean(sm.hub_d)[None, :]])

        ulsuf_onehot = np.zeros((P, C + 1))
        ulsuf_onehot[np.asarray(sm.unit_last), np.arange(C)] = 1.0
        if sm.suffix_last >= 0:
            ulsuf_onehot[sm.suffix_last, C] = 1.0

        # struct-space metadata for the in-walk analytics, packed int16 to
        # halve the masked-lookup VMEM footprint: (region << 12) | (unit+1);
        # -1 units encode as 0.  unit+1 < 4096 always holds on the pallas
        # path (it serves L <= 2048 lattices; longer reads route to the
        # checkpointed kernel).
        region_s = np.asarray(art.region)[s2a].astype(np.int64)
        unit_s = np.asarray(art.unit)[s2a].astype(np.int64)
        assert int(unit_s.max()) + 1 < (1 << 12), int(unit_s.max())
        pack = (region_s << 12) | ((unit_s + 1) & 0xFFF)
        packMI = pack[:2 * P].astype(np.int16)[None, :]
        packB = np.zeros((1, 2 * nb), dtype=np.int16)
        packB[0, :nb] = pack[2 * P:].astype(np.int16)

        f32 = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            PM2=f32(PM2), PB2=f32(PB2), EMB=f32(EMB), Wd2=f32(Wd2),
            Wu=f32(Wu), W_hio=f32(W_hio), W_i0e=f32(W_i0e),
            W_hube=f32(W_hube), ulsuf=f32(ulsuf_onehot),
            r_unit=f32(np.array([[clean(np.array(sm.r_unit)).item()]])),
            packMI=jnp.asarray(packMI), packB=jnp.asarray(packB),
            struct_to_art=jnp.asarray(np.asarray(sm.struct_to_art)))

    def flat(self):
        return dataclasses.astuple(self)


def _roll(x, k):
    """Shift x right by k along the last axis.  Wraparound lanes are NOT
    masked: callers arrange for the weight added to every roll-in lane
    (block starts / window-crossing positions) to be -1e30, so garbage can
    never win a max."""
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


def _fused_kernel(seq1h_ref, lengths_ref, PM2_ref, PB2_ref, EMB_ref,
                  Wd2_ref, Wu_ref, Whio_ref, Wi0e_ref, Whube_ref,
                  ulsuf_ref, runit_ref,
                  oMI_ref, oXH_ref, best_ref, bstate_ref,
                  MI_s, D_s, Do_s, XH_s, hubpo_s):
    # grid = (n_chunks, L // T_BLK): one kernel instance runs EVERY chunk
    # (chunk-major order), so the per-chunk DP state re-initializes at each
    # chunk's first column block and there is no per-chunk dispatch gap
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    T = seq1h_ref.shape[1]
    B, P2 = MI_s.shape
    P = P2 // 2
    nb2 = XH_s.shape[1]
    nb = nb2 // 2
    C = ulsuf_ref.shape[1] - 1
    n_rounds_p = Wd2_ref.shape[0]
    n_rounds_c = Wu_ref.shape[0]
    lengths = lengths_ref[...].reshape(B, 1)

    # loop-invariant constants (origin codes in struct space: M_p = p,
    # I_p = P+p, I0_b = 2P+b, hub_b sentinel = 2P+nb+b)
    idxM = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1).astype(jnp.float32)
    idxI = idxM + jnp.float32(P)
    idxM1 = idxM - 1.0                       # rolled-by-1 constants
    idxI1 = idxI - 1.0
    ORIG_A = jnp.concatenate([idxM1, idxM], axis=1)       # (B, 2P)
    ORIG_B = jnp.concatenate([idxI1, idxI], axis=1)
    idxI0 = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1).astype(
        jnp.float32) + jnp.float32(2 * P)
    hubsent_b = idxI0 + jnp.float32(nb)      # (B, nb) hub sentinels
    blkid = jnp.broadcast_to(PM2_ref[W2_BLKID, :P][None, :], (B, P))
    hubsent_p = blkid + jnp.float32(nb)      # (B, P) hub sentinels
    NEGrow = jnp.full((B, P), NEG, dtype=jnp.float32)
    ones = jnp.ones((B, 1), dtype=jnp.float32)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1)
    neg1 = jnp.float32(-1.0)
    r_unit = runit_ref[0, 0]

    @pl.when(i == 0)
    def _():
        MI_s[...] = jnp.full((B, P2), NEG, dtype=jnp.float32)
        D_s[...] = jnp.full((B, P), NEG, dtype=jnp.float32)
        Do_s[...] = jnp.zeros((B, P), dtype=jnp.float32)
        XH_s[...] = jnp.full((B, nb2), NEG, dtype=jnp.float32)
        hubpo_s[...] = jnp.zeros((B, nb), dtype=jnp.float32)

    # all T_BLK columns' emissions + match bits in ONE MXU op per grid
    # step: the per-column (B,4)x(4,3P+nb) dots are K=4 latency-bound, so
    # one (T·B,4)x(4,3P+nb) beats T small dependent ones
    e_blk = _dot(seq1h_ref[...].reshape(T * B, 4), EMB_ref[...])

    # the delete-chain shift-max rounds run on SEPARATE value/origin
    # (B, P) planes: the stacked (B, 2P) form spends an add on the origin
    # half (its window weights are all zero) and a concat per round to
    # broadcast the take mask — 9P element-touches per round vs 6P here,
    # and the rounds dominate the per-column op budget at flank-sized
    # blocks (n_rounds_p = 8 at 150bp flanks)
    Wd_rows = [Wd2_ref[r, :P][None, :] for r in range(n_rounds_p)]

    # DP state as loop locals: scratch is read/written once per grid step
    MI, D, Do = MI_s[...], D_s[...], Do_s[...]
    XH, hubpo = XH_s[...], hubpo_s[...]

    for tt in range(T):
        t = i * T + tt
        e_all = e_blk[tt * B:(tt + 1) * B]   # (B, 3P+nb)
        eMI_x = e_all[:, :2 * P]
        eI0_x = e_all[:, 2 * P:2 * P + nb]
        mm2 = e_all[:, 2 * P + nb:]          # (B, 2P): 1.5 + MBIT·match
        act = t < lengths                    # (B, 1)
        # t = i*T + tt is 0 only when tt == 0 (i == 0 checked dynamically);
        # for tt > 0 the first-column selects vanish statically
        is_first = (t == 0) if tt == 0 else None

        # ---- emitting layer (prev-column sources, stacked M|I lanes) ----
        # hub/I0 expansion with ent_m/i0_m folded in via the ones column
        hio = _dot(jnp.concatenate([XH, ones], axis=1), Whio_ref[...])
        v5, o5 = _pick(hio[:, :P], hubsent_p, hio[:, P:], blkid)
        rollMI = _roll(MI, 1)
        # roll-in lanes: M half lane 0 and I half lane 0 carry wrapped
        # values, but a_mm/a_im are -1e30 at block starts, masking them
        candA = jnp.concatenate([rollMI[:, :P], MI[:, :P]], axis=1) \
            + PM2_ref[W2_A, :][None, :]
        candB = jnp.concatenate([rollMI[:, P:], MI[:, P:]], axis=1) \
            + PM2_ref[W2_B, :][None, :]
        candC = jnp.concatenate([_roll(D, 1), D], axis=1) \
            + PM2_ref[W2_C, :][None, :]
        origC = jnp.concatenate([_roll(Do, 1), Do], axis=1)
        v, o = _pick(candA, ORIG_A, candB, ORIG_B)
        v, o = _pick(v, o, candC, origC)
        v, o = _pick(v, o, jnp.concatenate([v5, NEGrow], axis=1),
                     jnp.concatenate([o5, o5], axis=1))
        MIn = eMI_x + v
        OMIn = o
        cand0 = XH + PB2_ref[B2_IH, :][None, :]
        v0, o0 = _pick(cand0[:, :nb], idxI0, cand0[:, nb:], hubsent_b)
        I0n = eI0_x + v0
        OI0n = o0
        # first column: start weights
        if is_first is not None:
            MIn = jnp.where(is_first,
                            PM2_ref[W2_START, :][None, :] + eMI_x, MIn)
            I0n = jnp.where(is_first,
                            PB2_ref[B2_START, :nb][None, :] + eI0_x, I0n)
            OMIn = jnp.where(is_first, neg1, OMIn)
            OI0n = jnp.where(is_first, neg1, OI0n)
        # length freeze (column t only exists for reads with t < length)
        MIn = jnp.where(act, MIn, MI)
        I0n = jnp.where(act, I0n, XH[:, :nb])

        # ---- silent layer (within-column closure, with provenance) ----
        i0e = _dot(jnp.concatenate([I0n, ones], axis=1), Wi0e_ref[...])
        bcand = _roll(MIn, 1) + PM2_ref[W2_D, :][None, :]
        bv, bo = _pick(bcand[:, :P], idxM1, bcand[:, P:], idxI1)
        bv, bo = _pick(bv, bo, i0e, blkid)
        Din, Dino = bv, bo
        for r in range(n_rounds_p):
            k = 1 << r
            if k >= P:
                break
            rv = _roll(Din, k) + Wd_rows[r]
            ro = _roll(Dino, k)
            take = rv > Din
            Din = jnp.where(take, rv, Din)
            Dino = jnp.where(take, ro, Dino)
        # block-end extraction: values and origins ride ONE matmul
        q2 = MIn + PM2_ref[W2_X, :][None, :]
        qv, qo = _pick(q2[:, :P], idxM, q2[:, P:], idxI)
        qv, qo = _pick(qv, qo, Din + PM2_ref[W2_XD, :P][None, :], Dino)
        qq = _dot(jnp.concatenate([qv, qo], axis=0), ulsuf_ref[...])
        q = qq[:B, :C]                       # (B, C) unit-end values
        qorig = qq[B:, :C]
        sufq = qq[:B, C:C + 1]               # (B, 1) suffix-end value
        sufqorig = qq[B:, C:C + 1]
        # unit_start chain: s_0 = sufq; s_c = q_{c-1} + ln(1/2)
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
        us_p = _roll(jnp.pad(us, ((0, 0), (0, nb - C))), 1)
        uso_p = _roll(jnp.pad(uso, ((0, 0), (0, nb - C))), 1)
        hubn = jnp.where(bcol == 0, NEG,
                         jnp.where(bcol <= C, us_p,
                                   jnp.broadcast_to(pstart, (B, nb))))
        hubon = jnp.where(bcol == 0, neg1,
                          jnp.where(bcol <= C, uso_p,
                                    jnp.broadcast_to(pstartorig, (B, nb))))
        hube = _dot(jnp.concatenate([hubn, ones], axis=1), Whube_ref[...])
        Dn, Don = _pick(Din, Dino, hube, hubsent_p)
        Dn = jnp.where(act, Dn, D)
        Don = jnp.where(act, Don, Do)
        hubn = jnp.where(act, hubn, XH[:, nb:])
        hubon = jnp.where(act, hubon, hubpo)

        # ---- plane writes + state commit ----
        # origins store +1 (so the first-column sentinel -1 lands on 0 and
        # every code stays positive under the packed match bit); mm2
        # already carries the +1.5 storage offset from the emission matmul
        oMI_ref[0, tt] = (OMIn + mm2).astype(oMI_ref.dtype)
        # oXH[t] = [I0 origins of column t | resolved origins of the hub at
        # column t-1 — exactly what a HUB sentinel read from a column-t
        # plane refers to]
        oXH_ref[0, tt] = (jnp.concatenate([OI0n, hubpo], axis=1) + 1.5) \
            .astype(oXH_ref.dtype)
        MI, D, Do = MIn, Dn, Don
        XH = jnp.concatenate([I0n, hubn], axis=1)
        hubpo = hubon

    MI_s[...] = MI
    D_s[...] = D
    Do_s[...] = Do
    XH_s[...] = XH
    hubpo_s[...] = hubpo

    # final best score + end state, ONCE from the length-frozen planes
    # (freezing pins each read's column length-1 values)
    @pl.when(i == nblk - 1)
    def _():
        fin_cat = jnp.concatenate(
            [MI + PM2_ref[W2_LE, :][None, :],
             XH[:, :nb] + PB2_ref[B2_LE, :nb][None, :]], axis=1)
        fin, fo = _max_first_idx(fin_cat)
        best_ref[0] = fin
        bstate_ref[0] = (fo + 0.5).astype(jnp.int32)


def pallas_fused_forward(pm: PallasStructModel, seqs, lengths,
                         interpret: bool = False):
    """Fused forward over ALL chunks in one kernel: seqs (nc, cb, L),
    lengths (nc, cb).  Returns (best (nc, cb), best_state (nc, cb) struct
    index, origins_MI (nc, L, cb, 2P), origins_XH (nc, L, cb, 2nb)) —
    int16/int32 provenance planes (+1-offset codes, match bit packed on
    the M half) in exactly the 4D layout the backward consumes.  The grid
    is (nc, L // T_BLK) chunk-major, so per-chunk DP state re-initializes
    at each chunk's first block and chunks run back-to-back with no
    dispatch gap.  L must be a multiple of T_BLK (viterbi_pallas_batch
    pads)."""
    nc, cb, L = seqs.shape
    P2 = pm.PM2.shape[1]
    nb2 = pm.PB2.shape[1]
    origin_dtype, _ = _origin_params(P2 // 2, nb2 // 2)
    assert L % T_BLK == 0, (L, T_BLK)
    seq1h = jax.nn.one_hot(jnp.clip(seqs.astype(jnp.int32), 0, 3), 4,
                           dtype=jnp.float32)               # (nc, cb, L, 4)
    seq1h = jnp.transpose(seq1h, (0, 2, 1, 3))              # (nc, L, cb, 4)
    lengths2 = lengths.astype(jnp.int32)[:, :, None]        # (nc, cb, 1)

    in_specs = [
            pl.BlockSpec((1, T_BLK, cb, 4), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, 1), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),  # lengths
            pl.BlockSpec(memory_space=pltpu.VMEM),  # PM2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # PB2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # EMB
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wd2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wu
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_hio
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_i0e
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_hube
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ulsuf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_unit
    ]
    out_specs = [
        pl.BlockSpec((1, T_BLK, cb, P2), lambda c, i: (c, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T_BLK, cb, nb2), lambda c, i: (c, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cb, 1), lambda c, i: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cb, 1), lambda c, i: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    oMI, oXH, best, bstate = pl.pallas_call(
        _fused_kernel,
        grid=(nc, L // T_BLK),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nc, L, cb, P2), origin_dtype),
            jax.ShapeDtypeStruct((nc, L, cb, nb2), origin_dtype),
            jax.ShapeDtypeStruct((nc, cb, 1), jnp.float32),
            jax.ShapeDtypeStruct((nc, cb, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cb, P2), jnp.float32),   # MI
            pltpu.VMEM((cb, P2 // 2), jnp.float32),   # D
            pltpu.VMEM((cb, P2 // 2), jnp.float32),   # D origins
            pltpu.VMEM((cb, nb2), jnp.float32),  # XH = [I0 | hub]
            pltpu.VMEM((cb, nb2 // 2), jnp.float32),  # prev hub origins
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(seq1h, lengths2, pm.PM2, pm.PB2, pm.EMB, pm.Wd2, pm.Wu, pm.W_hio,
      pm.W_i0e, pm.W_hube, pm.ulsuf, pm.r_unit)
    return best[:, :, 0], bstate[:, :, 0], oMI, oXH


def _make_backward_kernel(P: int, nb: int, mbit: int):
    """Backward origin walk with fused per-read analytics.

    Grid step g processes the T-column block L/T-1-g in reverse column
    order: records the current state, resolves its predecessor through the
    merged origin planes (ONE (B, 2P) masked row-sum; HUB sentinels via
    the hub half of the oXH plane), looks up the state's packed
    region/unit metadata through the same masks, and applies the
    reference's per-column statistics and unit-boundary-crossing rules
    (hmm_utils.py:155-286 semantics, verbatim from
    device_analytics.analytics_from_path) as (B, 1) scalar updates.
    Accumulators live in VMEM scratch; the walk ends with one (B, 16)
    stats write.  The hop-h crossing needs the metadata of BOTH endpoint
    states; the walk carries the next column's (region, unit) across
    iterations (and grid steps, via scratch)."""
    code_mask = mbit - 1

    def kernel(lengths_ref, bstate_ref, packMI_ref, packB_ref,
               oMI_ref, oXH_ref, path_ref, stats_ref,
               cur_s, path_s, rn_s, un_s, acc_s):
        g = pl.program_id(0)
        nblk = pl.num_programs(0)
        nc, T, cb = oMI_ref.shape[0], oMI_ref.shape[1], oMI_ref.shape[2]
        B = nc * cb
        lengths = lengths_ref[:]                      # (B, 1)

        @pl.when(g == 0)
        def _():
            cur_s[...] = bstate_ref[...]
            rn_s[...] = jnp.zeros((B, 1), jnp.int32)
            un_s[...] = jnp.zeros((B, 1), jnp.int32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, N_STATS), 1)
            init = jnp.where((lane == S_FS) | (lane == S_FE), BIG,
                             jnp.where((lane == S_LS) | (lane == S_LE),
                                       -BIG, 0))
            acc_s[...] = init

        iota2P = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * P), 1)
        iota2b = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * nb), 1)
        packMI32 = packMI_ref[...].astype(jnp.int32)
        packB32 = packB_ref[...].astype(jnp.int32)
        zero = jnp.zeros((B, 1), jnp.int32)

        cur = cur_s[...]
        rnext = rn_s[...]
        unext = un_s[...]
        acc = acc_s[...]
        nm, repbp = acc[:, S_NMATCH:S_NMATCH + 1], acc[:, S_REPBP:S_REPBP + 1]
        lbp, rbp = acc[:, S_LBP:S_LBP + 1], acc[:, S_RBP:S_RBP + 1]
        lmt, rmt = acc[:, S_LMATCH:S_LMATCH + 1], acc[:, S_RMATCH:S_RMATCH + 1]
        starts, ends = acc[:, S_STARTS:S_STARTS + 1], acc[:, S_ENDS:S_ENDS + 1]
        fs, ls = acc[:, S_FS:S_FS + 1], acc[:, S_LS:S_LS + 1]
        fe, le = acc[:, S_FE:S_FE + 1], acc[:, S_LE:S_LE + 1]

        for tt in range(T - 1, -1, -1):
            t = (nblk - 1 - g) * T + tt
            path_s[pl.ds(t, 1), :] = cur.reshape(1, B)
            # masked row-sums run in int32: Mosaic rejects both int16
            # compares and mixing an int32-compare mask (8,128-layout i1)
            # into int16 selects (16,128 layout) — the int32 convert is the
            # round-2-proven pattern
            oMIt = oMI_ref[:, tt].reshape(B, 2 * P).astype(jnp.int32)
            oXHt = oXH_ref[:, tt].reshape(B, 2 * nb).astype(jnp.int32)
            maskA = iota2P == cur
            selA = jnp.sum(jnp.where(maskA, oMIt, 0), axis=1, keepdims=True)
            metaA = jnp.sum(jnp.where(maskA, packMI32, 0), axis=1,
                            keepdims=True)
            maskB = iota2b == cur - 2 * P
            selB = jnp.sum(jnp.where(maskB, oXHt, 0), axis=1, keepdims=True)
            metaB = jnp.sum(jnp.where(maskB, packB32, 0), axis=1,
                            keepdims=True)
            sel = jnp.where(cur < 2 * P, selA, selB)
            m_bit = sel >= mbit
            prev = (sel & code_mask) - 1
            meta = metaA + metaB
            maskH = iota2b == prev - 2 * P
            selH = jnp.sum(jnp.where(maskH, oXHt, 0), axis=1,
                           keepdims=True) - 1
            prev = jnp.where(prev >= 2 * P + nb, selH, prev)

            region = meta >> 12
            unit = (meta & 0xFFF) - 1
            valid = t < lengths
            is_m = (cur < P) & valid
            in_suf = region == R_SUFFIX
            in_rep = region == R_REPEAT
            in_pre = region == R_PREFIX
            nm = nm + is_m.astype(jnp.int32)
            repbp = repbp + (in_rep & valid).astype(jnp.int32)
            lbp = lbp + (in_suf & valid).astype(jnp.int32)
            rbp = rbp + (in_pre & valid).astype(jnp.int32)
            bm = is_m & m_bit
            lmt = lmt + (bm & in_suf).astype(jnp.int32)
            rmt = rmt + (bm & in_pre).astype(jnp.int32)

            # end hop (at bp = length, applied at the column t = length-1)
            at_end = t == lengths - 1
            end_ue = (in_rep & (cur >= P)) | in_suf
            egg = at_end & (lengths >= MIN_BP_IN_REPEAT) & end_ue
            ends = ends + egg.astype(jnp.int32)
            fe = jnp.minimum(fe, jnp.where(egg, lengths, BIG))
            le = jnp.maximum(le, jnp.where(egg, lengths, -BIG))

            # hop h = t+1 (path[t] -> path[t+1]; next meta carried over)
            h = t + 1
            hop_ok = h < lengths
            base = jnp.where(in_rep, unit, -1)
            sr = unext - base
            er = sr - in_suf.astype(jnp.int32)
            nrep = rnext == R_REPEAT
            npre = rnext == R_PREFIX
            hop_us = jnp.maximum(jnp.where(
                nrep, sr, jnp.where(npre & in_suf, 1, 0)), 0)
            hop_ue = jnp.maximum(jnp.where(
                nrep, er, jnp.where(npre & (in_rep | in_suf), 1, 0)), 0)
            gs = (lengths - h) >= MIN_BP_IN_REPEAT
            ge = h >= MIN_BP_IN_REPEAT
            cs = jnp.where(hop_ok & gs, hop_us, zero)
            ce = jnp.where(hop_ok & ge, hop_ue, zero)
            starts = starts + cs
            ends = ends + ce
            fs = jnp.minimum(fs, jnp.where(cs > 0, h, BIG))
            ls = jnp.maximum(ls, jnp.where(cs > 0, h, -BIG))
            fe = jnp.minimum(fe, jnp.where(ce > 0, h, BIG))
            le = jnp.maximum(le, jnp.where(ce > 0, h, -BIG))

            # start hop (hop 0, applied at column 0): guard_end is always
            # false at bp 0, so only the starts side contributes
            j0u0m = in_rep & (unit == 0) & (cur < P)
            s_us = jnp.where(in_rep & ~j0u0m, unit + 1,
                             jnp.where(in_pre, 1, 0))
            cs0 = jnp.where((t == 0) & (lengths >= MIN_BP_IN_REPEAT),
                            s_us, zero)
            starts = starts + cs0
            fs = jnp.minimum(fs, jnp.where(cs0 > 0, 0, BIG))
            ls = jnp.maximum(ls, jnp.where(cs0 > 0, 0, -BIG))

            rnext, unext = region, unit
            hop = (t <= lengths - 1) & (t >= 1)
            cur = jnp.where(hop, prev, cur)

        cur_s[...] = cur
        rn_s[...] = rnext
        un_s[...] = unext
        acc_s[...] = jnp.concatenate(
            [nm, repbp, lbp, rbp, lmt, rmt, starts, ends, fs, ls, fe, le,
             jnp.zeros((B, N_STATS - 12), jnp.int32)], axis=1)

        @pl.when(g == nblk - 1)
        def _():
            path_ref[...] = path_s[...]
            stats_ref[...] = acc_s[...]

    return kernel


def _backward_tblk(B: int, P: int, L: int) -> int:
    """Columns per backward grid step: largest power of two <= T_BLK whose
    double-buffered (nc, T, cb, 2P) int16 input blocks fit the VMEM
    budget.  The backward runs at the FULL batch (all forward chunks at
    once), where its (B, 1) scalar updates amortize 8x better than
    per-chunk walks."""
    budget = 40 * 1024 * 1024
    t = max(1, min(T_BLK, budget // max(1, B * 2 * P * 2 * 2 * 2)))
    t = 1 << (t.bit_length() - 1)
    while L % t:
        t >>= 1
    return max(t, 1)


def pallas_backward_stats(pm: PallasStructModel, lengths, bstate,
                          oMI4, oXH4, interpret: bool = False):
    """Walk the 4D origin planes (nc, L, cb, ·) back to the path and the
    fused per-read statistics.

    Returns (path (B, L) struct indices, stats (B, N_STATS) int32)."""
    nc, L, cb, P2 = oMI4.shape
    P = P2 // 2
    nb = oXH4.shape[3] // 2
    B = nc * cb
    _, mbit = _origin_params(P, nb)
    T_BWD = _backward_tblk(B, P, L)
    nblk = L // T_BWD
    lengths2 = lengths.astype(jnp.int32).reshape(B, 1)
    bstate2 = bstate.astype(jnp.int32).reshape(B, 1)
    rev = lambda g, n=nblk: (0, n - 1 - g, 0, 0)
    path_rev, stats = pl.pallas_call(
        _make_backward_kernel(P, nb, mbit),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lengths
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bstate
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packMI
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packB
            pl.BlockSpec((nc, T_BWD, cb, P2), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, T_BWD, cb, 2 * nb), rev,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, B), jnp.int32),
            jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.int32),
                        pltpu.VMEM((L, B), jnp.int32),
                        pltpu.VMEM((B, 1), jnp.int32),
                        pltpu.VMEM((B, 1), jnp.int32),
                        pltpu.VMEM((B, N_STATS), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(lengths2, bstate2, pm.packMI, pm.packB, oMI4, oXH4)
    return path_rev.T, stats                       # (B, L), (B, N_STATS)


# per-kernel-instance batch cap: VMEM live-range pressure bounds it (the
# raised vmem limit admits 512 at P=512; measured fastest fused); tunable.
# Rounded down to a power of two: pad_rows pads batches to powers of two and
# the chunk loop asserts B % chunk == 0.
CHUNK_B = 1 << (int(os.environ.get("ADVNTR_TPU_CHUNK_B", "512")).bit_length()
                - 1)


def _chunk_for(P: int) -> int:
    """Scale the per-instance batch down with P so kernel temporaries
    (~15 live (B, 2P) f32 arrays) stay inside the VMEM budget."""
    budget = CHUNK_B * 512
    c = 1 << max(3, (budget // max(P, 1)).bit_length() - 1)
    return min(CHUNK_B, c)


def _pallas_pipeline(pm: PallasStructModel, seqs, lengths,
                     interpret: bool = False):
    """Chunked fused forward + full-batch analytics backward.

    Returns (best (B,), end_state (B,) struct, path (B, L) struct,
    stats (B, N_STATS))."""
    B, L = seqs.shape
    P2 = pm.PM2.shape[1]
    chunk_b = _chunk_for(P2 // 2)
    if B <= chunk_b:
        nc, cb = 1, B
    else:
        assert B % chunk_b == 0, (B, chunk_b)
        nc, cb = B // chunk_b, chunk_b
    seqs_c = seqs.reshape(nc, cb, L)
    lengths_c = lengths.reshape(nc, cb)
    best, bstate, oMI, oXH = pallas_fused_forward(
        pm, seqs_c, lengths_c, interpret=interpret)
    path, stats = pallas_backward_stats(
        pm, lengths, bstate.reshape(B), oMI, oXH, interpret=interpret)
    best = best.reshape(B)
    bstate = bstate.reshape(B)
    path = jnp.where((lengths == 1)[:, None],
                     jnp.broadcast_to(bstate[:, None], path.shape), path)
    return best, bstate, path, stats


def _pad_batch_floor(seqs, lengths, floor: int = 8):
    """Pad the batch axis up to one sublane tile: Mosaic cannot lower the
    kernel's lane concats for sublane-1 blocks (B=1 singleton length
    buckets from spanning-read scoring fail with 'result/input offset
    mismatch on non-concat dimension'); padded rows carry length 1 and
    are sliced off by the caller."""
    B = seqs.shape[0]
    if B >= floor:
        return seqs, lengths, B
    seqs = jnp.pad(seqs, ((0, floor - B), (0, 0)))
    lengths = jnp.pad(lengths, (0, floor - B), constant_values=1)
    return seqs, lengths, B


@functools.partial(jax.jit, static_argnames=("return_path", "interpret"))
def viterbi_pallas_batch(model_arrays, seqs, lengths,
                         return_path: bool = True, interpret: bool = False):
    """Pallas fused forward + gather traceback; same contract as
    viterbi_struct_batch (artifact-space path indices)."""
    pm = PallasStructModel(*model_arrays)
    seqs, lengths, B_out = _pad_batch_floor(seqs, lengths)
    B, L = seqs.shape
    L_pad = ((L + T_BLK - 1) // T_BLK) * T_BLK
    if L_pad != L:
        seqs = jnp.pad(seqs, ((0, 0), (0, L_pad - L)))
    best, bstate, path_s, _ = _pallas_pipeline(pm, seqs, lengths,
                                               interpret=interpret)
    best, bstate, path_s = (best[:B_out], bstate[:B_out], path_s[:B_out])
    end_state = jnp.take(pm.struct_to_art, bstate)
    if not return_path:
        return best, end_state, None
    path = jnp.take(pm.struct_to_art, path_s)[:, :L]
    return best, end_state, path


def finish_stats(best, stats, return_path=False, path=None):
    """Assemble the analytics dict from the kernel's (B, N_STATS) output
    (the repeats formula tail of analytics_from_path, on O(B) scalars)."""
    starts = stats[:, S_STARTS]
    ends = stats[:, S_ENDS]
    fs, ls = stats[:, S_FS], stats[:, S_LS]
    fe, le = stats[:, S_FE], stats[:, S_LE]
    have_all = (fs != BIG) & (ls != -BIG) & (fe != BIG) & (le != -BIG)
    delta = (have_all & (fe < fs) & (ls > le)).astype(jnp.int32)
    out = {
        "logp": best,
        "repeats": jnp.maximum(starts, ends) + delta,
        "n_matches": stats[:, S_NMATCH],
        "repeat_bp": stats[:, S_REPBP],
        "left_flank_bp": stats[:, S_LBP],
        "right_flank_bp": stats[:, S_RBP],
        "left_flank_matches": stats[:, S_LMATCH],
        "right_flank_matches": stats[:, S_RMATCH],
    }
    if return_path:
        out["path"] = path
    return out


@functools.partial(jax.jit, static_argnames=("return_path", "interpret"))
def viterbi_pallas_stats(model_arrays, seqs, lengths,
                         return_path: bool = False,
                         interpret: bool = False):
    """Fully-fused production pipeline: Viterbi + traceback + per-read
    analytics on device, returning the analytics dict of (B,) arrays."""
    pm = PallasStructModel(*model_arrays)
    seqs, lengths, B_out = _pad_batch_floor(seqs, lengths)
    B, L = seqs.shape
    L_pad = ((L + T_BLK - 1) // T_BLK) * T_BLK
    if L_pad != L:
        seqs = jnp.pad(seqs, ((0, 0), (0, L_pad - L)))
    best, bstate, path_s, stats = _pallas_pipeline(pm, seqs, lengths,
                                                   interpret=interpret)
    best, path_s, stats = best[:B_out], path_s[:B_out], stats[:B_out]
    path = None
    if return_path:
        path = jnp.take(pm.struct_to_art, path_s)[:, :L]
    return finish_stats(best, stats, return_path=return_path, path=path)
