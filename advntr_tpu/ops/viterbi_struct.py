"""Structured Viterbi: O(n) work per symbol instead of O(n^2).

Forward recurrence over the banded profile-chain layout produced by
models/struct_compiler.py.  Per symbol:

1. emitting update — shifts + elementwise maxes over the position axis
2. silent layer — the within-column delete chains collapse into one
   tropical affine scan (the map x -> max(x + d, b) is associative under
   composition: (d1,b1)*(d2,b2) = (d1+d2, max(b1+d2, b2))), with a -inf
   decay resetting the chain at block boundaries; the cross-unit
   unit_start chain is a second, C-length tropical scan; hubs
   (suffix_end, unit_ends, end_repeats, prefix_start) are small reductions

Exactness: identical max-plus semantics to the silent-state elimination in
models/compiler.py, so emitting-state values match the dense kernel up to
float op order.  The traceback reuses the dense eliminated matrix for
argmax re-derivation on stored value planes (O(n) per visited state).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

NEG32 = np.float32(-1e30)
LN05 = float(np.log(0.5))


def _clean(x, dtype=jnp.float32):
    x = np.asarray(x, dtype=np.float64)
    x = np.where(np.isfinite(x), x, np.float64(NEG32))
    return jnp.asarray(x, dtype=dtype)


@dataclasses.dataclass
class StructDeviceModel:
    """Device tensors for the structured kernel + dense decode tensors.

    Geometry (P positions, C units, nb blocks) is implied by array shapes:
    P = blk_idx.shape[0], C = unit_last.shape[0], nb = i0_i.shape[0].
    """
    blk_idx: jnp.ndarray
    eM: jnp.ndarray
    eI: jnp.ndarray
    eI0: jnp.ndarray
    a_mm: jnp.ndarray
    a_im: jnp.ndarray
    a_dm: jnp.ndarray
    ent_m: jnp.ndarray
    i0_m: jnp.ndarray
    mi: jnp.ndarray
    ii: jnp.ndarray
    di: jnp.ndarray
    md: jnp.ndarray
    idw: jnp.ndarray
    dd: jnp.ndarray
    i0_d: jnp.ndarray
    hub_d: jnp.ndarray
    i0_i: jnp.ndarray
    hub_i0: jnp.ndarray
    xm: jnp.ndarray
    xi: jnp.ndarray
    xd: jnp.ndarray
    r_unit: jnp.ndarray      # scalar
    unit_last: jnp.ndarray
    M_start: jnp.ndarray
    I_start: jnp.ndarray
    I0_start: jnp.ndarray
    struct_to_art: jnp.ndarray
    log_end_struct: jnp.ndarray
    Wd: jnp.ndarray               # (rounds_p, P) delete-chain shift-decay
    Wu: jnp.ndarray               # (rounds_c, C) unit-chain shift-decay

    @classmethod
    def from_struct(cls, sm, art, dtype=jnp.float32) -> "StructDeviceModel":
        import numpy as _np
        s2a = _np.asarray(sm.struct_to_art)
        # shift-decay window tables: the tropical scan y_p = max(y_{p-1}+d_p,
        # b_p) unrolls into log2 rounds v = max(v, shift(v, 2^r) + W_r) with
        # W_r[j] = sum of d over (j-2^r, j] (-inf across chain resets)
        P, C = sm.P, sm.C
        dd = _np.asarray(sm.dd, dtype=_np.float64)
        dd = _np.where(_np.isfinite(dd), dd, _np.float64(NEG32))
        rounds_p = max(1, int(_np.ceil(_np.log2(max(P, 2)))))
        Wd = _np.zeros((rounds_p, P))
        Wd[0] = dd
        for r in range(1, rounds_p):
            k = 1 << (r - 1)
            shifted = _np.concatenate(
                [_np.full(k, _np.float64(NEG32)), Wd[r - 1][:-k]])
            Wd[r] = _np.maximum(Wd[r - 1] + shifted, _np.float64(-1e32))
        rho = float(_np.where(_np.isfinite(sm.r_unit),
                              sm.r_unit, NEG32)) + LN05
        rounds_c = max(1, int(_np.ceil(_np.log2(max(C, 2)))))
        Wu = _np.full((rounds_c, C), _np.float64(NEG32))
        for r in range(rounds_c):
            k = 1 << r
            Wu[r, k:] = max(rho * k, float(NEG32))
        return cls(
            blk_idx=jnp.asarray(sm.blk_idx),
            eM=_clean(sm.eM, dtype), eI=_clean(sm.eI, dtype),
            eI0=_clean(sm.eI0, dtype),
            a_mm=_clean(sm.a_mm, dtype), a_im=_clean(sm.a_im, dtype),
            a_dm=_clean(sm.a_dm, dtype), ent_m=_clean(sm.ent_m, dtype),
            i0_m=_clean(sm.i0_m, dtype),
            mi=_clean(sm.mi, dtype), ii=_clean(sm.ii, dtype),
            di=_clean(sm.di, dtype),
            md=_clean(sm.md, dtype), idw=_clean(sm.idw, dtype),
            dd=_clean(sm.dd, dtype), i0_d=_clean(sm.i0_d, dtype),
            hub_d=_clean(sm.hub_d, dtype),
            i0_i=_clean(sm.i0_i, dtype), hub_i0=_clean(sm.hub_i0, dtype),
            xm=_clean(sm.xm, dtype), xi=_clean(sm.xi, dtype),
            xd=_clean(sm.xd, dtype),
            r_unit=_clean(np.array(sm.r_unit), dtype),
            unit_last=jnp.asarray(sm.unit_last),
            M_start=_clean(sm.M_start, dtype),
            I_start=_clean(sm.I_start, dtype),
            I0_start=_clean(sm.I0_start, dtype),
            struct_to_art=jnp.asarray(s2a),
            log_end_struct=_clean(sm.log_end_struct, dtype),
            Wd=jnp.asarray(Wd, dtype=dtype), Wu=jnp.asarray(Wu, dtype=dtype))

    def flat(self):
        return dataclasses.astuple(self)


def _shift1(x):
    """Right-shift along the last axis, filling with -1e30."""
    pad = jnp.full(x.shape[:-1] + (1,), NEG32, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _shiftk(x, k):
    """Right-shift along the last axis by k, filling with -1e30."""
    pad = jnp.full(x.shape[:-1] + (k,), NEG32, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _shift_decay_scan(W, b):
    """Tropical scan y_p = max_{k<=p}(b_k + window(k, p)) via precomputed
    shift-decay rounds W (rounds, P)."""
    v = b
    P = b.shape[-1]
    for r in range(W.shape[0]):
        k = 1 << r
        if k >= P:
            break
        v = jnp.maximum(v, _shiftk(v, k) + W[r][None, :])
    return v


def _shiftk_i(o, k):
    """Right-shift an int origin array by k, filling with 0."""
    pad = jnp.zeros(o.shape[:-1] + (k,), dtype=o.dtype)
    return jnp.concatenate([pad, o[..., :-k]], axis=-1)


def _shift_decay_scan_org(W, b, borg):
    """Shift-decay tropical scan carrying the origin of each maximum."""
    v, o = b, borg
    P = b.shape[-1]
    for r in range(W.shape[0]):
        k = 1 << r
        if k >= P:
            break
        sv = _shiftk(v, k) + W[r][None, :]
        so = _shiftk_i(o, k)
        better = sv > v
        v = jnp.where(better, sv, v)
        o = jnp.where(better, so, o)
    return v, o


def _argmax_terms(terms):
    """max + origin over [(value, origin), ...]; first term wins ties."""
    v, o = terms[0]
    o = jnp.broadcast_to(o, v.shape).astype(jnp.int32)
    for val, org in terms[1:]:
        better = val > v
        v = jnp.where(better, val, v)
        o = jnp.where(better, jnp.broadcast_to(org, val.shape), o)
    return v, o


@functools.partial(jax.jit, static_argnames=("return_path",))
def viterbi_struct_batch(model_arrays, seqs, lengths, suffix_last,
                         return_path: bool = True):
    """Structured forward with provenance traceback.

    The forward pass resolves, for every emitting slot in every column, the
    emitting predecessor its maximum came from (delete chains and hub
    routes resolve inline through origin-carrying scans).  The traceback is
    then a single (B,)-gather per column over the stored origin planes —
    no value planes, no dense matrix.

    Returns (logp (B,), end_state (B,), path (B, L) or None) with states
    indexed in the eliminated artifact's flat space.
    """
    m = StructDeviceModel(*model_arrays)
    B, L = seqs.shape
    P = m.blk_idx.shape[0]
    nb = m.i0_i.shape[0]
    S = 2 * P + nb
    seqs = seqs.astype(jnp.int32)

    eM_x = jnp.transpose(jnp.take(m.eM, seqs.T, axis=1), (1, 2, 0))   # (L,B,P)
    eI_x = jnp.transpose(jnp.take(m.eI, seqs.T, axis=1), (1, 2, 0))
    eI0_x = jnp.transpose(jnp.take(m.eI0, seqs.T, axis=1), (1, 2, 0))  # (L,B,nb)

    # constant origin rows (structured slot ids)
    posM = jnp.arange(P, dtype=jnp.int32)
    posI = P + posM
    posI0 = 2 * P + jnp.arange(nb, dtype=jnp.int32)
    posM_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), posM[:-1]])[None, :]
    posI_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), posI[:-1]])[None, :]
    posI0_by_pos = jnp.take(posI0, m.blk_idx)[None, :]                # (1,P)
    sl = jnp.asarray(suffix_last, dtype=jnp.int32)

    def silent_layer(Mn, In, I0n):
        """Delete chains + hubs with inline origin resolution."""
        I0_by_pos = jnp.take(I0n, m.blk_idx, axis=1)
        bb, bborg = _argmax_terms([
            (_shift1(Mn) + m.md[None, :], posM_prev),
            (_shift1(In) + m.idw[None, :], posI_prev),
            (I0_by_pos + m.i0_d[None, :], posI0_by_pos)])
        Dinner, Dorg_in = _shift_decay_scan_org(m.Wd, bb, bborg)
        ul = m.unit_last
        q, qorg = _argmax_terms([
            (jnp.take(Mn, ul, axis=1) + jnp.take(m.xm, ul)[None, :],
             jnp.take(posM, ul)[None, :]),
            (jnp.take(In, ul, axis=1) + jnp.take(m.xi, ul)[None, :],
             jnp.take(posI, ul)[None, :]),
            (jnp.take(Dinner, ul, axis=1) + jnp.take(m.xd, ul)[None, :],
             jnp.take(Dorg_in, ul, axis=1))])
        sufq, suforg = _argmax_terms([
            (jnp.take(Mn, sl, axis=1)[:, None] + jnp.take(m.xm, sl),
             jnp.take(posM, sl)),
            (jnp.take(In, sl, axis=1)[:, None] + jnp.take(m.xi, sl),
             jnp.take(posI, sl)),
            (jnp.take(Dinner, sl, axis=1)[:, None] + jnp.take(m.xd, sl),
             jnp.take(Dorg_in, sl, axis=1)[:, None])])
        # unit_start chain: us_c = max(s_c, us_{c-1} + r_unit + ln(1/2))
        s = jnp.concatenate([sufq, q[:, :-1] + LN05], axis=1)
        sorg = jnp.concatenate([suforg, qorg[:, :-1]], axis=1)
        us, usorg = _shift_decay_scan_org(m.Wu, s, sorg)
        ue, ueorg = _argmax_terms([(q, qorg), (us + m.r_unit, usorg)])
        er = ue + LN05
        c_best = jnp.argmax(er, axis=1)
        pstart = jnp.take_along_axis(er, c_best[:, None], axis=1)
        pstartorg = jnp.take_along_axis(ueorg, c_best[:, None], axis=1)
        hub = jnp.concatenate(
            [jnp.full((B, 1), NEG32), us, pstart], axis=1)
        huborg = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), usorg, pstartorg], axis=1)
        hub_by_pos = jnp.take(hub, m.blk_idx, axis=1)
        huborg_by_pos = jnp.take(huborg, m.blk_idx, axis=1)
        hub_term = hub_by_pos + m.hub_d[None, :]
        better = hub_term > Dinner
        Dn = jnp.where(better, hub_term, Dinner)
        Dorg = jnp.where(better, huborg_by_pos, Dorg_in)
        return Dn, Dorg, hub, huborg

    def fin_of(Mn, In, I0n):
        le = m.log_end_struct
        return jnp.maximum(
            jnp.max(Mn + le[None, :P], axis=1),
            jnp.maximum(jnp.max(In + le[None, P:2 * P], axis=1),
                        jnp.max(I0n + le[None, 2 * P:], axis=1)))

    # ---- initial column ---------------------------------------------------
    M0 = m.M_start[None, :] + eM_x[0]
    Iv0 = m.I_start[None, :] + eI_x[0]
    I00 = m.I0_start[None, :] + eI0_x[0]
    D0, Dorg0, hub0, huborg0 = silent_layer(M0, Iv0, I00)
    finals0 = fin_of(M0, Iv0, I00)

    def step(carry, inputs):
        M, I, I0, D, Dorg, hub, huborg, best = carry
        eM_t, eI_t, eI0_t, t = inputs
        hub_by_pos = jnp.take(hub, m.blk_idx, axis=1)
        huborg_by_pos = jnp.take(huborg, m.blk_idx, axis=1)
        I0_by_pos = jnp.take(I0, m.blk_idx, axis=1)
        Mn_base, Morg = _argmax_terms([
            (_shift1(M) + m.a_mm[None, :], posM_prev),
            (_shift1(I) + m.a_im[None, :], posI_prev),
            (_shift1(D) + m.a_dm[None, :], _shiftk_i(Dorg, 1)),
            (hub_by_pos + m.ent_m[None, :], huborg_by_pos),
            (I0_by_pos + m.i0_m[None, :], posI0_by_pos)])
        Mn = eM_t + Mn_base
        In_base, Iorg = _argmax_terms([
            (M + m.mi[None, :], posM[None, :]),
            (I + m.ii[None, :], posI[None, :]),
            (D + m.di[None, :], Dorg)])
        In = eI_t + In_base
        I0n_base, I0org = _argmax_terms([
            (I0 + m.i0_i[None, :], posI0[None, :]),
            (hub + m.hub_i0[None, :], huborg)])
        I0n = eI0_t + I0n_base
        act = (t < lengths)[:, None]
        Mn = jnp.where(act, Mn, M)
        In = jnp.where(act, In, I)
        I0n = jnp.where(act, I0n, I0)
        Dn, Dorgn, hubn, huborgn = silent_layer(Mn, In, I0n)
        Dn = jnp.where(act, Dn, D)
        Dorgn = jnp.where(act, Dorgn, Dorg)
        hubn = jnp.where(act, hubn, hub)
        huborgn = jnp.where(act, huborgn, huborg)
        best = jnp.where(t == lengths - 1, fin_of(Mn, In, I0n), best)
        org_plane = jnp.concatenate([Morg, Iorg, I0org],
                                    axis=1).astype(jnp.int16)
        return (Mn, In, I0n, Dn, Dorgn, hubn, huborgn, best), org_plane

    ts = jnp.arange(1, L, dtype=jnp.int32)
    (Mf, If, I0f, _, _, _, _, best), org_planes = jax.lax.scan(
        step, (M0, Iv0, I00, D0, Dorg0, hub0, huborg0, finals0),
        (eM_x[1:], eI_x[1:], eI0_x[1:], ts))
    # org_planes[k] = predecessor slots for column k+1 (k = 0..L-2)

    if not return_path:
        return best, None, None

    le = m.log_end_struct
    final_plane = jnp.concatenate([Mf, If, I0f], axis=1)
    end_state_s = jnp.argmax(final_plane + le[None, :],
                             axis=1).astype(jnp.int32)

    def back_step(cur, inputs):
        org_t, t = inputs
        prev = jnp.take_along_axis(
            org_t, cur[:, None], axis=1)[:, 0].astype(jnp.int32)
        new_cur = jnp.where(t <= lengths - 1, prev, cur)
        return new_cur, cur

    ts_rev = jnp.arange(L - 1, 0, -1, dtype=jnp.int32)
    cur_last, emitted = jax.lax.scan(back_step, end_state_s,
                                     (org_planes[::-1], ts_rev))
    path_s = jnp.concatenate([cur_last[:, None], emitted[::-1].T], axis=1)
    path_s = jnp.where((lengths == 1)[:, None],
                       jnp.broadcast_to(end_state_s[:, None], path_s.shape),
                       path_s)
    # convert structured indices to artifact flat indices
    path = jnp.take(m.struct_to_art, path_s)
    end_state = jnp.take(m.struct_to_art, end_state_s)
    return best, end_state, path
