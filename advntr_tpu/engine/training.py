"""Model training for ``addmodel``: recruitment-score threshold estimation.

Reference semantics: vntr_finder.py:901-1021 — simulate recruitment-positive
reads from the locus and decoy reads from keyword-sharing regions of the
reference genome, Viterbi-score both sets, then fit a logistic decision
boundary on the scores; the scaled threshold (score / read_length) is stored
in the model DB.

The genome decoy scan is vectorized with numpy rolling k-mer codes instead
of the reference's per-base Python rolling hash (vntr_finder.py:924-971).
"""

from __future__ import annotations

import logging
import random

import numpy as np

from advntr_tpu import dna
from advntr_tpu.config import Config, DEFAULT_CONFIG
from advntr_tpu.engine.recruitment import keywords_for_locus
from advntr_tpu.engine.simulate import simulate_true_reads


def rolling_kmer_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """Exact 2-bit k-mer codes per position; -1 where the window has non-ACGT."""
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    ok = np.ones(n, dtype=bool)
    c = codes.astype(np.int64)
    for j in range(k):
        win = c[j:j + n]
        out = out * 4 + np.where(win < 4, win, 0)
        ok &= win < 4
    out[~ok] = -1
    return out


def simulate_false_filtered_reads(ref_vntr, chromosome_seq: str,
                                  read_size: int = 150, keyword_size: int = 11,
                                  min_match: int = 3,
                                  max_false_reads: int = 10000) -> list[str]:
    """Decoy reads: windows of the chromosome sharing >= min_match 11-mers
    with the locus keywords within one read length, excluding the locus
    itself (reference semantics: vntr_finder.py:924-971)."""
    keywords = keywords_for_locus(ref_vntr, True, keyword_size)
    kw_codes = {c for c in
                (np.array([dna.encode(k) for k in keywords])
                 .astype(np.int64) @
                 (4 ** np.arange(keyword_size - 1, -1, -1, dtype=np.int64)))
                }
    seq = chromosome_seq.upper()
    codes = dna.encode(seq)
    pos_codes = rolling_kmer_codes(codes, keyword_size)
    kw_arr = np.fromiter(kw_codes, dtype=np.int64)
    hits = np.isin(pos_codes, kw_arr) & (pos_codes >= 0)
    vntr_start = ref_vntr.start_point
    vntr_end = vntr_start + ref_vntr.get_length()
    positions = np.nonzero(hits)[0]
    in_locus = (positions > vntr_start - read_size) & (positions < vntr_end)
    positions = positions[~in_locus]

    false_reads: list[str] = []
    match_positions: list[int] = []
    for i in positions:
        match_positions.append(int(i))
        if len(match_positions) >= min_match and \
                match_positions[-1] - match_positions[-min_match] < read_size:
            for j in range(match_positions[-1] - read_size,
                           match_positions[-min_match], 5):
                if j < 0:
                    continue
                window = seq[j:j + read_size]
                if "N" not in window and len(window) == read_size:
                    false_reads.append(window)
        if len(false_reads) > max_false_reads:
            break
    return false_reads


def find_recruitment_score_threshold(true_scores, false_scores):
    """Logistic decision boundary over Viterbi scores
    (reference semantics: vntr_finder.py:1006-1021)."""
    from sklearn.linear_model import LogisticRegression
    if len(false_scores) == 0:
        false_scores = [min(true_scores) - 2]
    clf = LogisticRegression()
    x = [[s] for s in list(true_scores) + list(false_scores)]
    y = [1] * len(true_scores) + [0] * len(false_scores)
    clf.fit(x, y)
    recruitment_score = max(true_scores)
    for i in range(-1, -300, -1):
        if int(clf.predict([[i]])[0]) == 0:
            recruitment_score = i
            break
    return recruitment_score


def train_classifier_threshold(ref_vntr, chromosome_seq: str,
                               read_length: int = 150,
                               config: Config = DEFAULT_CONFIG) -> float:
    """Scaled recruitment threshold for one locus
    (reference semantics: vntr_finder.py:901-911)."""
    from advntr_tpu.engine.finder import VNTRFinder
    finder = VNTRFinder(ref_vntr, config)
    true_reads = simulate_true_reads(ref_vntr, read_length,
                                     random.Random(0))
    false_reads = simulate_false_filtered_reads(ref_vntr, chromosome_seq,
                                                read_size=read_length)
    logging.info("training threshold: %d true, %d decoy reads",
                 len(true_reads), len(false_reads))

    def scores(reads):
        out = []
        chunk = 512
        for i in range(0, len(reads), chunk):
            scored, _ = finder.score_reads(
                [], [(str(j), r) for j, r in enumerate(reads[i:i + chunk])],
                read_length)
            out.extend(r.logp for r in scored if np.isfinite(r.logp)
                       and r.repeat_bp > finder.min_repeat_bp_to_add_read
                       and finder.recruit_read(r, -10000))
        return out

    true_scores = scores(true_reads)
    false_scores = scores(false_reads)
    if not true_scores:
        return 0.0
    threshold = find_recruitment_score_threshold(true_scores, false_scores)
    return threshold / float(read_length)


def train_and_add_model(reference_file: str, chromosome: str, pattern: str,
                        start: int, end: int, gene=None, annotation=None,
                        db_file: str = "vntr_data/models.db",
                        config: Config = DEFAULT_CONFIG) -> int:
    """Full addmodel flow (reference: advntr_commands.py:179-215)."""
    import os
    from advntr_tpu.io.fasta import load_chromosome
    from advntr_tpu.models.db import (create_vntrs_database,
                                      get_largest_id_in_database,
                                      save_reference_vntr_to_database)
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    chr_sequence = load_chromosome(reference_file, chromosome)
    if not chr_sequence:
        raise ValueError(f"chromosome {chromosome} not found in "
                         f"{reference_file}")
    if not os.path.exists(db_file):
        create_vntrs_database(db_file)
    vntr_id = get_largest_id_in_database(db_file) + 1
    estimated_repeats = int((end - start) / len(pattern) + 5)
    ref_vntr = ReferenceVNTR(vntr_id, pattern, start, chromosome, gene,
                             annotation, estimated_repeats, chr_sequence)
    ref_vntr.init_from_vntrseek_data()
    ref_vntr.scaled_score = train_classifier_threshold(ref_vntr, chr_sequence,
                                                       config=config)
    save_reference_vntr_to_database(ref_vntr, db_file)
    return vntr_id
