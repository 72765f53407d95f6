"""Batched log-space Viterbi over compiled (silent-free) HMMs.

Replaces the reference's per-read sparse-graph Cython DP
(pomegranate/hmm.pyx:1970-2130) with dense max-plus dynamic programming:

- ``viterbi_numpy``: float64 host implementation (conformance oracle and
  small-scale fallback).
- ``viterbi_batch``: JAX implementation — ``lax.scan`` over sequence
  positions, batched over reads; traceback from stored argmax planes.
  All shapes static; variable read lengths handled by masking/latching, so
  one compiled executable serves a whole (n_states, max_len) bucket.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

NEG32 = np.float32(-1e30)


def viterbi_numpy(art, codes: np.ndarray):
    """Single-read float64 Viterbi over a compiled artifact.

    Returns (logp, path) where path is the emitting-state index sequence.
    """
    log_T, log_E = art.log_T, art.log_E
    n = art.n_states
    L = len(codes)
    v = art.log_start + log_E[:, codes[0]]
    args = np.zeros((L, n), dtype=np.int32)
    for t in range(1, L):
        scores = v[:, None] + log_T
        args[t] = np.argmax(scores, axis=0)
        v = scores[args[t], np.arange(n)] + log_E[:, codes[t]]
    final = v + art.log_end
    end_state = int(np.argmax(final))
    logp = final[end_state]
    if not np.isfinite(logp):
        return float(logp), None
    path = np.zeros(L, dtype=np.int32)
    cur = end_state
    for t in range(L - 1, -1, -1):
        path[t] = cur
        if t > 0:
            cur = args[t][cur]
    return float(logp), path


# ---------------------------------------------------------------------------
# JAX batched kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("return_path",))
def viterbi_batch(log_T, log_E, log_start, log_end, seqs, lengths,
                  return_path: bool = True):
    """Batched Viterbi.

    Args:
      log_T: (n, n) float32 effective transitions (log), -inf -> use ~-1e30
      log_E: (n, 4) float32 emissions (log)
      log_start, log_end: (n,) float32
      seqs: (B, L) int32 in [0,4) (padding value arbitrary in [0,4))
      lengths: (B,) int32 true read lengths (>=1)
      return_path: also run traceback and return (B, L) int32 state paths

    Returns: (logp (B,), end_state (B,), path (B, L) or None)
    """
    B, L = seqs.shape
    n = log_T.shape[0]
    seqs = seqs.astype(jnp.int32)

    emis = jnp.take(log_E, seqs.T, axis=1)          # (n, L, B) -> per-t below
    emis = jnp.transpose(emis, (1, 2, 0))           # (L, B, n)

    v0 = log_start[None, :] + emis[0]               # (B, n)
    finals0 = jnp.max(v0 + log_end[None, :], axis=1)
    ends0 = jnp.argmax(v0 + log_end[None, :], axis=1).astype(jnp.int32)

    def step(carry, inputs):
        v, best, end_state = carry
        emis_t, t = inputs
        # new_v[b, j] = max_i v[b, i] + T[i, j]
        scores = v[:, :, None] + log_T[None, :, :]          # (B, n, n)
        arg = jnp.argmax(scores, axis=1).astype(jnp.int32)  # (B, n)
        mx = jnp.take_along_axis(scores, arg[:, None, :], axis=1)[:, 0, :]
        new_v = mx + emis_t
        # freeze the lattice past each read's end
        active = (t < lengths)[:, None]
        new_v = jnp.where(active, new_v, v)
        # latch the final score at each read's last position
        fin = jnp.max(new_v + log_end[None, :], axis=1)
        es = jnp.argmax(new_v + log_end[None, :], axis=1).astype(jnp.int32)
        is_last = (t == lengths - 1)
        best = jnp.where(is_last, fin, best)
        end_state = jnp.where(is_last, es, end_state)
        return (new_v, best, end_state), arg

    ts = jnp.arange(1, L, dtype=jnp.int32)
    (vF, best, end_state), args = jax.lax.scan(
        step, (v0, finals0, ends0), (emis[1:], ts))
    # reads of length L never latched inside the scan for t == L-1? They did:
    # t runs to L-1 and lengths-1 <= L-1.  Reads of length 1 latched at t=0
    # via finals0/ends0 initialization.

    if not return_path:
        return best, end_state, None

    # ---- traceback ----
    def back_step(cur, inputs):
        arg_t, t = inputs
        # reset the cursor at each read's last position
        cur = jnp.where(t == lengths - 1, end_state, cur)
        emit = cur
        prev = jnp.take_along_axis(arg_t, cur[:, None], axis=1)[:, 0]
        return prev, emit

    ts_rev = jnp.arange(L - 1, 0, -1, dtype=jnp.int32)
    cur0 = jnp.where(lengths == L, end_state, jnp.zeros_like(end_state))
    cur_last, emits = jax.lax.scan(back_step, cur0, (args[::-1], ts_rev))
    # emits[k] = path at position L-1-k for k=0..L-2; cur_last = path[0]
    path = jnp.concatenate([cur_last[:, None], emits[::-1].T], axis=1)
    # for reads shorter than L, positions >= length are garbage; also a
    # length-1 read's path[0] must be its end state
    path = jnp.where((lengths == 1)[:, None],
                     jnp.broadcast_to(end_state[:, None], path.shape), path)
    return best, end_state, path


def prepare_model_tensors(art, dtype=jnp.float32):
    """Convert a ModelArtifact's -inf entries to a large negative finite value
    (f32-safe) and upload as device arrays."""
    def clean(x):
        x = np.asarray(x, dtype=np.float64)
        x = np.where(np.isfinite(x), x, np.float64(NEG32))
        return jnp.asarray(x, dtype=dtype)
    return (clean(art.log_T), clean(art.log_E),
            clean(art.log_start), clean(art.log_end))
