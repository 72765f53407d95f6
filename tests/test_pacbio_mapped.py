"""PacBio aligned-read spanning extraction (reference-position walk) and the
full PacBio-BAM analyzer flow."""

import io
import random

import pytest

from advntr_tpu.config import Config
from advntr_tpu.engine.analyzer import GenomeAnalyzer
from advntr_tpu.engine.finder import VNTRFinder
from advntr_tpu.engine.simulate import haplotype_sequence, mutate
from advntr_tpu.io.bam import BamRead, BamWriter, build_bai
from advntr_tpu.models.db import (create_vntrs_database,
                                  save_reference_vntr_to_database)
from advntr_tpu.models.reference_vntr import ReferenceVNTR


def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


PATTERN = "GATCCGTTAC"
LEFT = _rand_seq(31, 400)
RIGHT = _rand_seq(32, 400)
VNTR_START = 2000
REF_COPIES = 5


def make_ref():
    ref = ReferenceVNTR(70186, PATTERN, VNTR_START, "chr1")
    ref.repeat_segments = [PATTERN] * REF_COPIES
    ref.left_flanking_region = LEFT
    ref.right_flanking_region = RIGHT
    ref.estimated_repeats = REF_COPIES
    return ref


def make_mapped_long_reads(alleles=(4, 7), n_per_hap=5, error=0.005, seed=3):
    """Long reads mapped over the locus; reference_start/CIGAR are laid out
    as if the donor matched the reference length (M-runs), which is accurate
    enough for the spanning walk when the allele equals the reference and a
    realistic approximation otherwise (aligners put indels inside the
    repeat; here we use one I/D op at the repeat midpoint)."""
    rng = random.Random(seed)
    reads = []
    ref_len = REF_COPIES * len(PATTERN)
    for h, copies in enumerate(alleles):
        hap = haplotype_sequence(LEFT, PATTERN, copies, RIGHT)
        allele_len = copies * len(PATTERN)
        for k in range(n_per_hap):
            lead = rng.randint(150, 250)   # flank bases before the VNTR
            tail = rng.randint(150, 250)
            start_in_hap = len(LEFT) - lead
            end_in_hap = len(LEFT) + allele_len + tail
            seq = mutate(hap[start_in_hap:end_in_hap], error, rng)
            ref_start = VNTR_START - lead
            # CIGAR: lead M, then allele vs reference repeat length
            if allele_len == ref_len:
                cigar = [(0, len(seq))]
            elif allele_len > ref_len:
                mid = lead + ref_len // 2
                cigar = [(0, mid), (1, allele_len - ref_len),
                         (0, len(seq) - mid - (allele_len - ref_len))]
            else:
                mid = lead + allele_len // 2
                cigar = [(0, mid), (2, ref_len - allele_len),
                         (0, len(seq) - mid)]
            reads.append(BamRead(f"h{h}r{k}", 0, 0, ref_start, 60, cigar,
                                 seq, [30] * len(seq)))
    reads.sort(key=lambda r: r.reference_start)
    return reads


def test_mapped_spanning_walk(tmp_path):
    bam_path = str(tmp_path / "pb.bam")
    reads = make_mapped_long_reads()
    with BamWriter(bam_path, ["chr1"], [100000]) as w:
        for r in reads:
            w.write(r)
    build_bai(bam_path)
    from advntr_tpu.io.bam import BamReader
    finder = VNTRFinder(make_ref(), Config().with_platform(pacbio=True))
    with BamReader(bam_path) as bam:
        spanning = finder.get_spanning_reads_of_aligned_pacbio_reads(bam)
    assert len(spanning) == len(reads)
    # every window covers the allele plus ~100bp flanks
    for name, seq in spanning:
        assert len(seq) >= 100 + 4 * len(PATTERN)


def test_pacbio_bam_genotype_end_to_end(tmp_path):
    db_file = str(tmp_path / "pb.db")
    create_vntrs_database(db_file)
    save_reference_vntr_to_database(make_ref(), db_file)
    bam_path = str(tmp_path / "pb.bam")
    with BamWriter(bam_path, ["chr1"], [100000]) as w:
        for r in make_mapped_long_reads():
            w.write(r)
    build_bai(bam_path)

    from advntr_tpu.models.db import load_unique_vntrs_data
    refs = load_unique_vntrs_data(db_file)
    out = io.StringIO()
    analyzer = GenomeAnalyzer(refs, [70186], str(tmp_path) + "/", "text",
                              config=Config().with_platform(pacbio=True),
                              out=out, input_file=bam_path)
    analyzer.find_repeat_counts_from_pacbio_alignment_file(bam_path)
    lines = out.getvalue().strip().splitlines()
    assert lines[0] == "70186"
    assert lines[1] == "4/7"
