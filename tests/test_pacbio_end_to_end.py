"""PacBio path end-to-end: spanning-read extraction from long reads by
flank anchoring, max-copies model, dominant-copy genotyping."""

import random

import pytest

from advntr_tpu.config import Config
from advntr_tpu.engine.finder import VNTRFinder
from advntr_tpu.engine.simulate import haplotype_sequence, mutate
from advntr_tpu.models.reference_vntr import ReferenceVNTR

PATTERN = "CATCAGTTGA"

def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))

LEFT = _rand_seq(3, 300)
RIGHT = _rand_seq(4, 300)


def make_ref():
    ref = ReferenceVNTR(70186, PATTERN, 5000, "chr1")
    ref.repeat_segments = [PATTERN] * 5
    ref.left_flanking_region = LEFT
    ref.right_flanking_region = RIGHT
    ref.estimated_repeats = 5
    return ref


def simulate_long_reads(alleles, n_per_hap=6, error=0.01, seed=0):
    rng = random.Random(seed)
    reads = []
    for h, copies in enumerate(alleles):
        hap = haplotype_sequence(LEFT, PATTERN, copies, RIGHT)
        for k in range(n_per_hap):
            # long read spanning the whole VNTR with generous flanks
            start = rng.randint(0, 80)
            end = len(hap) - rng.randint(0, 80)
            seq = mutate(hap[start:end], error, rng)
            reads.append((f"h{h}r{k}", seq))
    rng.shuffle(reads)
    return reads


def test_pacbio_spanning_extraction():
    finder = VNTRFinder(make_ref(), Config().with_platform(pacbio=True))
    reads = simulate_long_reads((4, 7))
    spanning, length_dist = \
        finder.get_spanning_reads_of_unaligned_pacbio_reads(reads)
    assert len(spanning) == len(reads)
    # trimmed windows should be flank(100) + VNTR + flank(100) sized
    lengths = sorted(len(s) for _, s in spanning)
    assert abs(lengths[0] - (200 + 4 * len(PATTERN))) <= 12
    assert abs(lengths[-1] - (200 + 7 * len(PATTERN))) <= 12


def test_pacbio_genotype():
    finder = VNTRFinder(make_ref(), Config().with_platform(pacbio=True))
    reads = simulate_long_reads((4, 7))
    result = finder.find_repeat_count_pacbio(None, reads)
    assert result.copy_numbers is not None
    assert tuple(sorted(result.copy_numbers)) == (4, 7)


def test_pacbio_naive_homozygous():
    finder = VNTRFinder(make_ref(), Config().with_platform(pacbio=True))
    reads = simulate_long_reads((6, 6), error=0.0)
    result = finder.find_repeat_count_pacbio(None, reads, naive=True)
    assert result.copy_numbers == (6, 6)


def test_pacbio_reverse_complement_reads():
    from advntr_tpu import dna
    finder = VNTRFinder(make_ref(), Config().with_platform(pacbio=True))
    reads = [(n, dna.revcomp(s)) for n, s in simulate_long_reads((5, 5))]
    result = finder.find_repeat_count_pacbio(None, reads)
    assert result.copy_numbers is not None
    assert tuple(sorted(result.copy_numbers)) == (5, 5)
