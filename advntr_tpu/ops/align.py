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


def global_align_score(a: str, b: str) -> int:
    """Needleman-Wunsch score with (1,-1,-1,-1) — used for unique-flank
    estimation (reference: vntr_finder.py:78-96)."""
    from advntr_tpu.models.msa import needleman_wunsch
    return needleman_wunsch(a, b)[2]
