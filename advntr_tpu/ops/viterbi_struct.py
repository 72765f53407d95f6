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
    log_T_struct_t: jnp.ndarray   # (n, n): row s = in-edge weights of s,
                                  # both axes in structured coordinates
    Wd: jnp.ndarray               # (rounds_p, P) delete-chain shift-decay
    Wu: jnp.ndarray               # (rounds_c, C) unit-chain shift-decay

    @classmethod
    def from_struct(cls, sm, art, dtype=jnp.float32) -> "StructDeviceModel":
        import numpy as _np
        log_T = _np.asarray(art.log_T, dtype=_np.float64)
        log_T = _np.where(_np.isfinite(log_T), log_T, _np.float64(NEG32))
        s2a = _np.asarray(sm.struct_to_art)
        log_T_struct_t = log_T[_np.ix_(s2a, s2a)].T
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
            struct_to_art=jnp.asarray(sm.struct_to_art),
            log_end_struct=_clean(sm.log_end_struct, dtype),
            log_T_struct_t=jnp.asarray(log_T_struct_t, dtype=dtype),
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


def silent_layer(m, suffix_last, Mn, In, I0n):
    """D chains + hub values for one column of emitting values."""
    B = Mn.shape[0]
    I0_by_pos = jnp.take(I0n, m.blk_idx, axis=1)
    bb = jnp.maximum(
        jnp.maximum(_shift1(Mn) + m.md[None, :],
                    _shift1(In) + m.idw[None, :]),
        I0_by_pos + m.i0_d[None, :])
    Dinner = _shift_decay_scan(m.Wd, bb)
    ul = m.unit_last
    q = jnp.maximum(
        jnp.maximum(jnp.take(Mn, ul, axis=1) + jnp.take(m.xm, ul)[None, :],
                    jnp.take(In, ul, axis=1) + jnp.take(m.xi, ul)[None, :]),
        jnp.take(Dinner, ul, axis=1) + jnp.take(m.xd, ul)[None, :])
    sl = jnp.asarray(suffix_last, dtype=jnp.int32)
    sufq = jnp.maximum(
        jnp.maximum(jnp.take(Mn, sl, axis=1) + jnp.take(m.xm, sl),
                    jnp.take(In, sl, axis=1) + jnp.take(m.xi, sl)),
        jnp.take(Dinner, sl, axis=1) + jnp.take(m.xd, sl))
    # unit_start chain: us_c = max(s_c, us_{c-1} + r_unit + ln(1/2))
    s = jnp.concatenate([sufq[:, None], q[:, :-1] + LN05], axis=1)
    us = _shift_decay_scan(m.Wu, s)                               # (B,C)
    ue = jnp.maximum(q, us + m.r_unit)
    pstart = jnp.max(ue + LN05, axis=1)    # end_repeats -> prefix_start
    hub = jnp.concatenate(
        [jnp.full((B, 1), NEG32), us, pstart[:, None]], axis=1)
    hub_by_pos = jnp.take(hub, m.blk_idx, axis=1)
    Dn = jnp.maximum(Dinner, hub_by_pos + m.hub_d[None, :])
    return Dn, hub


def struct_plane(M, I, I0):
    return jnp.concatenate([M, I, I0], axis=1)


def initial_column(m, suffix_last, eM0, eI0_, eI00):
    """Column-0 carry (M, I, I0, D, hub, best)."""
    M0 = m.M_start[None, :] + eM0
    Iv0 = m.I_start[None, :] + eI0_
    I00 = m.I0_start[None, :] + eI00
    D0, hub0 = silent_layer(m, suffix_last, M0, Iv0, I00)
    finals0 = jnp.max(struct_plane(M0, Iv0, I00)
                      + m.log_end_struct[None, :], axis=1)
    return (M0, Iv0, I00, D0, hub0, finals0)


def forward_step(m, suffix_last, lengths, carry, inputs):
    """One forward column (t >= 1).  Emits the PREVIOUS column's value
    plane — what the argmax-rederivation traceback walks."""
    M, I, I0, D, hub, best = carry
    eM_t, eI_t, eI0_t, t = inputs
    hub_by_pos = jnp.take(hub, m.blk_idx, axis=1)
    I0_by_pos = jnp.take(I0, m.blk_idx, axis=1)
    Mn = eM_t + jnp.maximum(
        jnp.maximum(_shift1(M) + m.a_mm[None, :],
                    _shift1(I) + m.a_im[None, :]),
        jnp.maximum(_shift1(D) + m.a_dm[None, :],
                    jnp.maximum(hub_by_pos + m.ent_m[None, :],
                                I0_by_pos + m.i0_m[None, :])))
    In = eI_t + jnp.maximum(
        jnp.maximum(M + m.mi[None, :], I + m.ii[None, :]),
        D + m.di[None, :])
    I0n = eI0_t + jnp.maximum(I0 + m.i0_i[None, :],
                              hub + m.hub_i0[None, :])
    act = (t < lengths)[:, None]
    Mn = jnp.where(act, Mn, M)
    In = jnp.where(act, In, I)
    I0n = jnp.where(act, I0n, I0)
    Dn, hubn = silent_layer(m, suffix_last, Mn, In, I0n)
    Dn = jnp.where(act, Dn, D)
    hubn = jnp.where(act, hubn, hub)
    fin = jnp.max(struct_plane(Mn, In, I0n)
                  + m.log_end_struct[None, :], axis=1)
    best = jnp.where(t == lengths - 1, fin, best)
    prev_plane = struct_plane(M, I, I0)
    return (Mn, In, I0n, Dn, hubn, best), prev_plane


@functools.partial(jax.jit, static_argnames=("return_path",))
def viterbi_struct_batch(model_arrays, seqs, lengths, suffix_last,
                         return_path: bool = True):
    """Structured forward + dense-assisted traceback.

    Returns (logp (B,), end_state (B,), path (B, L) or None) with states
    indexed in the eliminated artifact's flat space.
    """
    m = StructDeviceModel(*model_arrays)
    B, L = seqs.shape
    seqs = seqs.astype(jnp.int32)

    eM_x = jnp.transpose(jnp.take(m.eM, seqs.T, axis=1), (1, 2, 0))   # (L,B,P)
    eI_x = jnp.transpose(jnp.take(m.eI, seqs.T, axis=1), (1, 2, 0))
    eI0_x = jnp.transpose(jnp.take(m.eI0, seqs.T, axis=1), (1, 2, 0))  # (L,B,nb)

    carry0 = initial_column(m, suffix_last, eM_x[0], eI_x[0], eI0_x[0])
    step = functools.partial(forward_step, m, suffix_last, lengths)

    ts = jnp.arange(1, L, dtype=jnp.int32)
    (Mf, If, I0f, _, _, best), v_planes = jax.lax.scan(
        step, carry0, (eM_x[1:], eI_x[1:], eI0_x[1:], ts))

    if not return_path:
        return best, None, None

    final_plane = struct_plane(Mf, If, I0f)
    end_state_s = jnp.argmax(final_plane + m.log_end_struct[None, :],
                             axis=1).astype(jnp.int32)

    def back_step(cur, inputs):
        v_prev, t = inputs
        prev = jnp.argmax(v_prev + jnp.take(m.log_T_struct_t, cur, axis=0),
                          axis=1).astype(jnp.int32)
        new_cur = jnp.where(t <= lengths - 1, prev, cur)
        return new_cur, cur

    ts_rev = jnp.arange(L - 1, 0, -1, dtype=jnp.int32)
    cur_last, emitted = jax.lax.scan(back_step, end_state_s,
                                     (v_planes[::-1], ts_rev))
    path_s = jnp.concatenate([cur_last[:, None], emitted[::-1].T], axis=1)
    path_s = jnp.where((lengths == 1)[:, None],
                       jnp.broadcast_to(end_state_s[:, None], path_s.shape),
                       path_s)
    # convert structured indices to artifact flat indices
    path = jnp.take(m.struct_to_art, path_s)
    end_state = jnp.take(m.struct_to_art, end_state_s)
    return best, end_state, path
