"""The vectorized counts_from_stats fast lane must reproduce the
ScoredRead-object path exactly (same covered/flanking repeat multisets and
selection counts) on realistic read pools."""

import random

import pytest

from advntr_tpu.config import Config
from advntr_tpu.engine.finder import VNTRFinder
from advntr_tpu.engine.simulate import simulate_diploid_reads
from advntr_tpu.models.reference_vntr import ReferenceVNTR


def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


@pytest.mark.parametrize("seed,scaled_score", [(1, 0), (2, -0.8)])
def test_paths_agree(seed, scaled_score):
    pattern = "CCGTAGATCGGA"
    ref = ReferenceVNTR(5, pattern, 1000, "chr1",
                        scaled_score=scaled_score)
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = _rand_seq(41 + seed, 200)
    ref.right_flanking_region = _rand_seq(42 + seed, 200)
    finder = VNTRFinder(ref, Config())
    reads, _, _ = simulate_diploid_reads(
        ref.left_flanking_region, pattern, 2, 4, ref.right_flanking_region,
        read_length=100, coverage=25, error_rate=0.01, seed=seed)
    # add junk reads that must be rejected
    rng = random.Random(seed + 99)
    reads += [(f"junk{i}", _rand_seq(seed * 100 + i, 100)) for i in range(8)]

    read_length = 100
    lm = finder.get_model(read_length)
    prepped = finder.prepare_rows([], reads)
    r, rows, row_info = prepped
    batch, lengths = finder.pad_rows(rows)
    stats = finder.run_device(lm, batch, lengths)

    scored = finder.collect_scored(r, row_info, stats)
    selected = finder.select_from_scored(scored, read_length)
    covered_obj = sorted(x.repeats for x in selected
                         if finder.spans_with_confidence(x))
    flanking_obj = sorted(x.repeats for x in selected
                          if not finder.spans_with_confidence(x))

    covered_vec, flanking_vec, n_sel, total_bp = finder.counts_from_stats(
        r, row_info, stats, read_length)
    assert sorted(covered_vec) == covered_obj
    assert sorted(flanking_vec) == flanking_obj
    assert n_sel == len(selected)
    assert total_bp == sum(x.repeat_bp for x in selected)

    # accuracy-filter mode drops flanking reads entirely
    cov_af, fl_af, _, _ = finder.counts_from_stats(
        r, row_info, stats, read_length, accuracy_filter=True)
    assert sorted(cov_af) == covered_obj
    assert fl_af == []
