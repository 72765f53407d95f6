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
