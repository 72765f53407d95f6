"""Genotype-model conformance: golden vectors from the reference unit tests
(reference tests/test_genotyping.py:13-44 and
tests/test_frameshift_identification.py:19-80)."""

from advntr_tpu.engine.genotype import find_genotype, identify_frameshift


def ordered(gt):
    return tuple(sorted(gt)) if gt is not None else None


def test_haploid_case():
    assert find_genotype([3, 3, 3, 3, 3])[0] == (3, 3)


def test_haploid_organism():
    assert find_genotype([2, 3, 3, 3, 3], is_haploid=True)[0] == (3, 3)


def test_diploid_case():
    assert ordered(find_genotype([2, 2, 3, 3, 3])[0]) == (2, 3)


def test_erroneous_diploid_case():
    assert ordered(find_genotype([4, 5, 5, 5, 7, 8, 8, 8, 9])[0]) == (5, 8)


def test_empty_observations():
    gt, prob = find_genotype([])
    assert gt is None


def test_frameshift_vectors():
    cov = 14.0
    expected = 1 / cov
    for obs, want in [(14, True), (18, True), (7, True), (3, True),
                      (2, False), (1, False), (0, False)]:
        assert identify_frameshift(cov, obs, expected) is want, obs


# ---------------------------------------------------------------------------
# homology-aware spanning guard (round-3 accuracy fix: locus-5013 class)
# ---------------------------------------------------------------------------

def test_flank_pattern_homology_runs():
    from advntr_tpu.engine.finder import flank_pattern_homology
    # right flank continues the pattern's first 6bp (any rotation counts)
    l, r = flank_pattern_homology("TCGTCCAAGT", "AAAAGCGAAC",
                                  "TCGTCCGGGA")
    assert r == 6
    assert l <= 2
    # rotation: flank continues from mid-pattern
    l, r = flank_pattern_homology("TCGTCCAAGT", "CCCCCCCCCC",
                                  "AAGTTCGTAA")
    assert r == 8  # AAGT + TCGT = rotation starting at offset 6
    # no homology -> zero (guard is a no-op)
    l, r = flank_pattern_homology("ACAT", "GGGG", "GGGG")
    assert (l, r) == (0, 0)
    # left side: flank suffix precedes the tract
    l, r = flank_pattern_homology("TCGTCCAAGT", "GGGGTCGTCCAAGT", "GGGG")
    assert l == 10


def test_spanning_homology_guard_raises_minima():
    from advntr_tpu.config import Config
    from advntr_tpu.engine.finder import VNTRFinder
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    ref = ReferenceVNTR(9001, "TCGTCCAAGT", 1000, "chr1")
    ref.repeat_segments = ["TCGTCCAAGT"] * 4
    ref.left_flanking_region = "A" * 20 + "GCGAAC"
    ref.right_flanking_region = "TCGTCCGG" + "A" * 20
    f = VNTRFinder(ref, Config())
    assert f.minimum_right_flanking_size == 6   # homology run
    assert f.minimum_left_flanking_size == 5    # unchanged default
    f2 = VNTRFinder(ref, Config(spanning_homology_guard=False))
    assert f2.minimum_right_flanking_size == 5  # strict reference parity
