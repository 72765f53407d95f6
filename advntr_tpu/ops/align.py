"""Pairwise local alignment (Smith-Waterman) for flank anchoring.

Replaces Bio.pairwise2.align.localms(read, flank, 1, -1, -1, -1)
(reference: vntr_finder.py:324-365) for PacBio spanning-read extraction:
find where a 100bp flank best aligns inside a long read.

Host implementation is numpy, vectorized over the flank axis (the flank is
short; the read provides the long loop).  Scores: match +1, mismatch -1,
gap open/extend -1 (linear gaps, matching the reference's localms call).
"""

from __future__ import annotations

import numpy as np


def local_align(read: str, probe: str):
    """Best local alignment of probe inside read.

    Returns (score, read_start, read_end): read coordinates of the aligned
    window (end exclusive).  Score semantics match localms(1,-1,-1,-1).
    """
    n, m = len(read), len(probe)
    if n == 0 or m == 0:
        return 0, 0, 0
    a = np.frombuffer(read.upper().encode(), dtype=np.uint8)
    b = np.frombuffer(probe.upper().encode(), dtype=np.uint8)

    prev = np.zeros(m + 1, dtype=np.int32)
    # traceback-free: track the best cell and recover the start by a
    # second, bounded backward pass
    best_score = 0
    best_i = best_j = 0
    H = np.zeros((n + 1, m + 1), dtype=np.int32)
    for i in range(1, n + 1):
        sub = np.where(b == a[i - 1], 1, -1).astype(np.int32)
        row = np.zeros(m + 1, dtype=np.int32)
        diag = prev[:-1] + sub
        up = prev[1:] - 1
        cand = np.maximum(np.maximum(diag, up), 0)
        # left-gap chains collapse into a running max:
        # H[i][j] = max_{k<=j-1}(cand[k] - (j-1-k))
        ar = np.arange(m, dtype=np.int32)
        row[1:] = np.maximum.accumulate(cand + ar) - ar
        H[i] = row
        mx = int(row.max())
        if mx > best_score:
            best_score = mx
            best_i = i
            best_j = int(row.argmax())
        prev = row

    if best_score == 0:
        return 0, 0, 0
    # backward walk to the start of the local alignment
    i, j = best_i, best_j
    while i > 0 and j > 0 and H[i][j] > 0:
        diag = H[i - 1][j - 1]
        sub = 1 if read[i - 1].upper() == probe[j - 1].upper() else -1
        if H[i][j] == diag + sub:
            i, j = i - 1, j - 1
        elif H[i][j] == H[i - 1][j] - 1:
            i -= 1
        elif H[i][j] == H[i][j - 1] - 1:
            j -= 1
        else:
            break
    return best_score, i, best_i


def local_align_batch(reads, lengths, probe):
    """Batched Smith-Waterman of one probe against many reads (device).

    reads: (B, L) int8 codes; lengths: (B,); probe: (m,) int8.
    Returns (score (B,), end (B,)): best local-alignment score and the
    end position (exclusive) of the aligned window in each read.  The start
    position comes from a second pass on reversed reads (local alignment is
    reversal-symmetric): start = length - end_reversed.

    Scores match ``local_align`` / Bio.pairwise2 localms(1,-1,-1,-1).
    The within-row left-gap dependency collapses into a cummax with linear
    decay, so each row is O(m) vector work.
    """
    import jax
    import jax.numpy as jnp
    B, L = reads.shape
    m = probe.shape[0]
    reads = jnp.asarray(reads).astype(jnp.int32)
    probe = jnp.asarray(probe).astype(jnp.int32)
    lengths = jnp.asarray(lengths).astype(jnp.int32)
    ar = jnp.arange(m, dtype=jnp.int32)

    def step(carry, inputs):
        H, best, best_end = carry           # H: (B, m+1) int32
        base_t, t = inputs                  # (B,), scalar
        sub = jnp.where(probe[None, :] == base_t[:, None], 1, -1)
        cand = jnp.maximum(
            jnp.maximum(H[:, :-1] + sub, H[:, 1:] - 1), 0)
        row_tail = jax.lax.cummax(cand + ar[None, :], axis=1) - ar[None, :]
        new_H = jnp.concatenate(
            [jnp.zeros((B, 1), dtype=jnp.int32), row_tail], axis=1)
        active = (t < lengths)[:, None]
        new_H = jnp.where(active, new_H, H)
        mx = jnp.max(new_H, axis=1)
        better = active[:, 0] & (mx > best)
        best = jnp.where(better, mx, best)
        best_end = jnp.where(better, t + 1, best_end)
        return (new_H, best, best_end), None

    H0 = jnp.zeros((B, m + 1), dtype=jnp.int32)
    best0 = jnp.zeros(B, dtype=jnp.int32)
    end0 = jnp.zeros(B, dtype=jnp.int32)
    ts = jnp.arange(L, dtype=jnp.int32)
    (_, best, best_end), _ = jax.lax.scan(step, (H0, best0, end0),
                                          (reads.T, ts))
    return best, best_end


def anchor_probe_batch(read_codes_list, probe_codes):
    """Host wrapper: for each encoded read, the best (score, start, end) of
    the probe's local alignment — two batched passes (forward + reversed)."""
    import jax.numpy as jnp
    from advntr_tpu import dna
    if not read_codes_list:
        return []
    batch, lengths = dna.pad_batch(read_codes_list, multiple=32)
    rev_rows = [r[::-1].copy() for r in read_codes_list]
    rev_batch, _ = dna.pad_batch(rev_rows, pad_to=batch.shape[1], multiple=1)
    probe = np.asarray(probe_codes, dtype=np.int8)
    rev_probe = probe[::-1].copy()
    score, end = local_align_batch(jnp.asarray(batch), jnp.asarray(lengths),
                                   jnp.asarray(probe))
    score_r, end_r = local_align_batch(jnp.asarray(rev_batch),
                                       jnp.asarray(lengths),
                                       jnp.asarray(rev_probe))
    score = np.asarray(score)
    end = np.asarray(end)
    start = lengths - np.asarray(end_r)
    return [(int(score[i]), int(start[i]), int(end[i]))
            for i in range(len(read_codes_list))]


def global_align_score(a: str, b: str) -> int:
    """Needleman-Wunsch score with (1,-1,-1,-1) — used for unique-flank
    estimation (reference: vntr_finder.py:78-96)."""
    from advntr_tpu.models.msa import needleman_wunsch
    return needleman_wunsch(a, b)[2]
