"""Evaluation utilities tests."""

from advntr_tpu.engine.evaluation import (
    compare_genotypes, recruitment_metrics, consensus_of_units,
    pairwise_alignment_report)


def test_compare_genotypes():
    truth = {1: (2, 3), 2: (4, 4), 3: (1, 5), 4: (2, 2)}
    called = {1: (3, 2), 2: (4, 5), 4: "Error"}
    cmp = compare_genotypes(called, truth)
    assert cmp.correct == 1
    assert cmp.incorrect == 1
    assert cmp.missing == 1
    assert cmp.errors == 1
    assert cmp.accuracy == 0.25


def test_recruitment_metrics():
    m = recruitment_metrics(["a", "b", "c"], ["b", "c", "d"],
                            ["a", "b", "c", "d", "e"])
    assert m["tp"] == 2 and m["fp"] == 1 and m["fn"] == 1
    assert abs(m["precision"] - 2 / 3) < 1e-9
    assert abs(m["recall"] - 2 / 3) < 1e-9


def test_consensus_and_report():
    units = ["ACGTAC", "ACGTAC", "ACCTAC", "ACGTAC"]
    cons = consensus_of_units(units)
    assert cons == "ACGTAC"
    report = pairwise_alignment_report("ACCTAC", cons)
    assert "||" in report and "score:" in report


def test_compare_recruitment_methods():
    from advntr_tpu.engine.evaluation import compare_recruitment_methods
    from advntr_tpu.models.reference_vntr import ReferenceVNTR
    import random
    rng = random.Random(3)
    ref = ReferenceVNTR(1, "CAGCAGCAG", 100, "chr1")
    ref.repeat_segments = ["CAGCAGCAG"] * 4
    ref.left_flanking_region = "".join(rng.choice("ACGT") for _ in range(200))
    ref.right_flanking_region = "".join(rng.choice("ACGT") for _ in range(200))

    def kmer_recruiter(reads):
        # toy recruiter: any read sharing a 15-mer with the haplotype
        hap = (ref.left_flanking_region + ref.pattern * 4
               + ref.right_flanking_region)
        kmers = {hap[i:i + 15] for i in range(len(hap) - 14)}
        return [i for i, r in enumerate(reads)
                if any(r[j:j + 15] in kmers for j in range(0, len(r) - 14, 5))]

    def recruit_nothing(reads):
        return []

    out = compare_recruitment_methods(
        ref, {"kmer": kmer_recruiter, "null": recruit_nothing},
        n_true=40, read_length=100, seed=7)
    assert out["kmer"]["recall"] > 0.9
    assert out["kmer"]["precision"] > 0.9
    assert out["null"]["recall"] == 0.0


def test_per_locus_accuracy_sweep():
    from advntr_tpu.engine.evaluation import per_locus_accuracy_sweep
    from advntr_tpu.models.reference_vntr import ReferenceVNTR
    loci = [ReferenceVNTR(i, "CAG", 0, "chr1") for i in range(1, 4)]
    truth = {1: (2, 3), 2: (4, 4), 3: (5, 6)}

    def run_locus(ref):
        if ref.id == 3:
            raise RuntimeError("boom")
        return {1: (3, 2), 2: (4, 5)}[ref.id]

    sweep = per_locus_accuracy_sweep(run_locus, loci, truth)
    statuses = {r["vid"]: r["status"] for r in sweep["rows"]}
    assert statuses[1] == "ok"
    assert statuses[2] == "mismatch"
    assert statuses[3].startswith("error")
    assert abs(sweep["accuracy"] - 1 / 3) < 1e-9


def test_mutated_reference_sweep_end_to_end():
    """Edit reference -> simulate -> genotype -> compare, connected
    (reference workflow: reference_editor.py:66-97 + plot.py sweeps)."""
    import random

    from advntr_tpu.engine.evaluation import mutated_reference_sweep
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    rng = random.Random(3)
    pattern = "ACGGTCAGT"
    left = "".join(rng.choice("ACGT") for _ in range(400))
    right = "".join(rng.choice("ACGT") for _ in range(400))
    ref = ReferenceVNTR(77, pattern, len(left), "chr1")
    ref.repeat_segments = [pattern] * 5
    ref.left_flanking_region = left
    ref.right_flanking_region = right
    ref.estimated_repeats = 5
    chromosome = left + pattern * 5 + right

    sweep = mutated_reference_sweep(
        ref, chromosome, desired_counts=[3, 4, 6],
        coverage=30, read_length=100, seed=5)
    assert sweep["comparison"].accuracy == 1.0, sweep["rows"]
    for row in sweep["rows"]:
        assert row["called"] == (row["desired"], row["desired"])
        assert row["spanning"] > 0
