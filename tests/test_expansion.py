"""Expansion/coverage workload: the GC coverage-bias model and the
coverage-division RU estimate (reference: advntr/coverage_bias.py:12-125,
vntr_finder.py:783-786, advntr_commands.py --expansion/--coverage)."""

import io
import random

import numpy as np
import pytest

from advntr_tpu.config import Config
from advntr_tpu.engine.analyzer import GenomeAnalyzer
from advntr_tpu.engine.coverage_bias import (
    CoverageBiasDetector, CoverageCorrector, get_gc_content,
    GC_CONTENT_WINDOW_SIZE)
from advntr_tpu.engine.simulate import simulate_diploid_reads
from advntr_tpu.io.bam import BamRead, BamWriter
from advntr_tpu.models.reference_vntr import ReferenceVNTR


def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_gc_content():
    assert get_gc_content("GGCC") == 1.0
    assert get_gc_content("AATT") == 0.0
    assert get_gc_content("ACGT") == 0.5


def test_detector_bins_windows_by_gc(tmp_path):
    # reference: two windows, GC 0.0 then 1.0; coverage 2x on the AT
    # window, 1x on the GC window
    chrom = "A" * GC_CONTENT_WINDOW_SIZE + "G" * GC_CONTENT_WINDOW_SIZE
    bam_path = str(tmp_path / "cov.bam")
    with BamWriter(bam_path, ["chr9"], [len(chrom)]) as w:
        for start in (0, 0, GC_CONTENT_WINDOW_SIZE):
            seq = chrom[start:start + GC_CONTENT_WINDOW_SIZE]
            w.write(BamRead("r%d" % start, 0, 0, start, 60,
                            [(0, len(seq))], seq, [38] * len(seq), "chr9"))
    det = CoverageBiasDetector(bam_path,
                               reference_sequences={"chr9": chrom})
    gc_map = det.get_gc_content_coverage_map()
    assert gc_map[0] == [2.0]       # AT window: two reads
    # pure-GC window lands in bin int(1.0*10) = 10, matching the
    # reference's detector arithmetic (coverage_bias.py:80)
    assert gc_map[10] == [1.0]


def test_corrector_scaling():
    # global mean = (4 + 2) / 2 = 3; the GC ~0.83 bin saw coverage 2
    gc_map = {0: [4.0], 8: [2.0]}
    corr = CoverageCorrector(gc_map)
    assert corr.get_sequencing_mean_coverage() == 3.0
    ref = ReferenceVNTR(1, "GGGCGA", 100, "chr1")     # gc 5/6 -> bin 8
    ref.repeat_segments = ["GGGCGA"] * 3
    # occurrences observed under 2x get rescaled to the 3x global scale
    assert corr.get_scaled_coverage(ref, 10.0) == pytest.approx(15.0)


def _expansion_setup(tmp_path, copies=8, coverage=30):
    pattern = "GATCGATTCGAA"
    ref = ReferenceVNTR(77, pattern, 1000, "chr1")
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = _rand_seq(41, 200)
    ref.right_flanking_region = _rand_seq(42, 200)
    reads, _, _ = simulate_diploid_reads(
        ref.left_flanking_region, pattern, copies, copies,
        ref.right_flanking_region, read_length=100, coverage=coverage,
        error_rate=0.0, seed=5)
    bam_path = str(tmp_path / "exp.bam")
    with BamWriter(bam_path, ["chr1"], [100000]) as w:
        for name, seq in reads:
            w.write(BamRead(name, 4, -1, -1, 0, [], seq, [38] * len(seq)))
    return ref, bam_path


def _run_expansion(ref, bam_path, tmp_path, coverage, tag):
    out = io.StringIO()
    analyzer = GenomeAnalyzer([ref], [ref.id], str(tmp_path / tag) + "/",
                              "text", config=Config(), out=out,
                              input_file=bam_path)
    analyzer.find_repeat_counts_from_alignment_file(
        bam_path, average_coverage=coverage)
    return analyzer, out.getvalue().strip().splitlines()


def test_expansion_coverage_estimate(tmp_path):
    """--expansion end-to-end: RU estimate = occurrences/(coverage*2).

    The estimator (reference vntr_finder.py:783-786) is a crude occurrence
    division with edge-effect bias (units at read boundaries are partially
    observed), so the contract is: a homozygous-estimate row, the right
    order of magnitude, and exact inverse scaling in the coverage input."""
    coverage = 30
    ref, bam_path = _expansion_setup(tmp_path, copies=8, coverage=coverage)
    analyzer, lines = _run_expansion(ref, bam_path, tmp_path, coverage, "a")
    assert lines[0] == "77"
    a, b = lines[1].split("/")
    assert a == b, "expansion estimate must be homozygous"
    est = int(a)
    assert 4 <= est <= 9, lines
    # exact arithmetic: claiming double the coverage halves the estimate
    _, lines2 = _run_expansion(ref, bam_path, tmp_path, 2 * coverage, "a2")
    assert int(lines2[1].split("/")[0]) == est // 2, (lines, lines2)


def test_expansion_gc_correction_applied(tmp_path, monkeypatch):
    """A GC-bias corrector rescales the occurrence mass before division."""
    coverage = 30
    ref, bam_path = _expansion_setup(tmp_path, copies=8, coverage=coverage)

    class Doubler:
        def get_scaled_coverage(self, ref_vntr, observed):
            return observed * 2.0

    out = io.StringIO()
    analyzer = GenomeAnalyzer([ref], [77], str(tmp_path / "b") + "/",
                              "text", config=Config(), out=out,
                              input_file=bam_path)
    for finder in analyzer.vntr_finder.values():
        finder.coverage_corrector = Doubler()
    # bypass _attach (no reference FASTA): corrector pre-attached survives
    analyzer.find_repeat_counts_from_alignment_file(
        bam_path, average_coverage=coverage)
    lines = out.getvalue().strip().splitlines()
    est2 = int(lines[1].split("/")[0])
    _, base_lines = _run_expansion(ref, bam_path, tmp_path, coverage, "c")
    base = int(base_lines[1].split("/")[0])
    assert est2 == pytest.approx(2 * base, abs=1), (est2, base)


def test_attach_coverage_corrector_from_fasta(tmp_path):
    """Analyzer builds the corrector from a reference FASTA + mapped BAM."""
    chrom = ("A" * GC_CONTENT_WINDOW_SIZE + "G" * GC_CONTENT_WINDOW_SIZE) * 3
    fasta_path = tmp_path / "ref.fa"
    fasta_path.write_text(">chr1\n" + chrom + "\n")
    bam_path = str(tmp_path / "m.bam")
    with BamWriter(bam_path, ["chr1"], [len(chrom)]) as w:
        for start in range(0, len(chrom) - 100, 50):
            seq = chrom[start:start + 100]
            w.write(BamRead("r%d" % start, 0, 0, start, 60,
                            [(0, 100)], seq, [38] * 100, "chr1"))
    ref = ReferenceVNTR(5, "GATC", 100, "chr1")
    ref.repeat_segments = ["GATC"] * 3
    ref.left_flanking_region = _rand_seq(1, 120)
    ref.right_flanking_region = _rand_seq(2, 120)
    analyzer = GenomeAnalyzer([ref], [5], str(tmp_path) + "/", "text",
                              config=Config(), out=io.StringIO(),
                              ref_filename=str(fasta_path),
                              input_file=bam_path)
    analyzer._attach_coverage_corrector(bam_path)
    finder = analyzer.vntr_finder[5]
    assert finder.coverage_corrector is not None
    mean = finder.coverage_corrector.get_sequencing_mean_coverage()
    assert mean > 0
