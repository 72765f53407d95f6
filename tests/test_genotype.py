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
