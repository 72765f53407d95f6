"""Frameshift mode end-to-end: a heterozygous 1bp deletion inside the
tandem array must be detected from decoded indel states."""

import random

import pytest

from advntr_tpu.config import Config
from advntr_tpu.engine.finder import VNTRFinder
from advntr_tpu.engine.simulate import mutate
from advntr_tpu.models.reference_vntr import ReferenceVNTR

PATTERN = "ACGGTCAGT"  # 9bp

def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))

LEFT = _rand_seq(5, 200)
RIGHT = _rand_seq(6, 200)
COPIES = 8


def make_ref():
    ref = ReferenceVNTR(25561, PATTERN, 3000, "chr1")
    ref.repeat_segments = [PATTERN] * COPIES
    ref.left_flanking_region = LEFT
    ref.right_flanking_region = RIGHT
    ref.estimated_repeats = COPIES
    return ref


def simulate(frameshift: bool, read_length=100, coverage=30, seed=2):
    rng = random.Random(seed)
    hap_a = LEFT + PATTERN * COPIES + RIGHT
    # haplotype B carries a deletion of one base inside copy 3
    vntr_b = PATTERN * 3 + PATTERN[:4] + PATTERN[5:] + PATTERN * (COPIES - 4)
    hap_b = LEFT + (vntr_b if frameshift else PATTERN * COPIES) + RIGHT
    reads = []
    for h, hap in enumerate((hap_a, hap_b)):
        n_reads = int(len(hap) * coverage / 2 / read_length)
        for k in range(n_reads):
            start = rng.randint(0, len(hap) - read_length)
            reads.append((f"h{h}r{k}",
                          mutate(hap[start:start + read_length], 0.001, rng)))
    return reads


def test_frameshift_detected():
    finder = VNTRFinder(make_ref(), Config())
    reads = simulate(frameshift=True)
    result = finder.find_frameshift([], reads, read_length=100)
    assert result is not None
    assert result.startswith("D")


def test_no_frameshift_on_clean_data():
    finder = VNTRFinder(make_ref(), Config())
    reads = simulate(frameshift=False)
    result = finder.find_frameshift([], reads, read_length=100)
    assert result is None
