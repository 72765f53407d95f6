"""End-to-end genotyping on simulated diploid data.

The reference's quickstart conformance target is a 2/5 genotype at the CSTB
locus (docs/quickstart.rst).  The BAM is not redistributable, so this test
reproduces the scenario synthetically: a CSTB-like dodecamer VNTR with a 2-
and a 5-copy haplotype, 30x reads, expecting genotype (2, 5).
"""

import random

import pytest

from advntr_tpu.config import Config
from advntr_tpu.engine.finder import VNTRFinder
from advntr_tpu.engine.simulate import simulate_diploid_reads
from advntr_tpu.models.reference_vntr import ReferenceVNTR

# CSTB-like locus: 12bp GC-rich motif
PATTERN = "CGCGGGGCGGGG"
random.seed(7)

def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))

LEFT = _rand_seq(1, 200)
RIGHT = _rand_seq(2, 200)


def make_ref(copies_ref=3):
    ref = ReferenceVNTR(301645, PATTERN, 1000, "chr21")
    ref.repeat_segments = [PATTERN] * copies_ref
    ref.left_flanking_region = LEFT
    ref.right_flanking_region = RIGHT
    ref.estimated_repeats = copies_ref
    return ref


@pytest.mark.parametrize("alleles", [(2, 5), (3, 3), (2, 2)])
def test_diploid_genotype(alleles):
    ref = make_ref()
    finder = VNTRFinder(ref, Config())
    reads, _, _ = simulate_diploid_reads(
        LEFT, PATTERN, alleles[0], alleles[1], RIGHT,
        read_length=100, coverage=35, error_rate=0.003, seed=11)
    result = finder.find_repeat_count([], reads, read_length=100)
    assert result.copy_numbers is not None
    assert tuple(sorted(result.copy_numbers)) == tuple(sorted(alleles))


def test_spanning_read_counts_positive():
    ref = make_ref()
    finder = VNTRFinder(ref, Config())
    reads, _, _ = simulate_diploid_reads(
        LEFT, PATTERN, 2, 5, RIGHT, read_length=100, coverage=35,
        error_rate=0.003, seed=3)
    result = finder.find_repeat_count([], reads, read_length=100)
    assert result.spanning_reads_count > 0
    assert result.recruited_reads_count >= result.spanning_reads_count
