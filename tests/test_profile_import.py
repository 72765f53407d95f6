"""Alignment-import conformance for the profile-HMM estimator.

tests/data/profile_fixture.json records the EXACT outputs of the reference's
pure-Python pseudocount estimator
(advntr/profile_hmm.py:13-161, build_profile_hmm_pseudocounts_for_alignment)
on four alignments spanning: gapped/ungapped rows, both error rates
(Illumina 0.05, PacBio 0.30), insert columns, and flank gaps.  With an
imported alignment our estimator must reproduce every transition and
emission probability bit-for-bit — this is the conformance path for
pre-trained-DB loci whose parameters came from a MUSCLE MSA (SURVEY §7
design note 5).
"""

import json
import os

import pytest

from advntr_tpu.models.profile import (profile_for_repeats,
                                       profile_from_alignment,
                                       read_alignment_fasta)

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "profile_fixture.json")

with open(FIXTURE) as fh:
    CASES = json.load(fh)


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"er{c['error_rate']}")
def test_estimator_matches_reference_bitwise(case):
    trans, emis = profile_from_alignment(case["error_rate"],
                                         case["alignment"])
    assert trans == case["transitions"]   # exact float equality
    assert emis == case["emissions"]


def test_import_alignment_list():
    case = CASES[0]
    trans, emis = profile_for_repeats(
        ["IGNORED"], case["error_rate"], alignment=case["alignment"])
    assert trans == case["transitions"]
    assert emis == case["emissions"]


def test_import_alignment_fasta(tmp_path):
    case = CASES[0]
    path = tmp_path / "aln.fa"
    path.write_text("".join(f">seq{i}\n{row}\n"
                            for i, row in enumerate(case["alignment"])))
    assert read_alignment_fasta(str(path)) == case["alignment"]
    trans, emis = profile_for_repeats(
        [], case["error_rate"], alignment=str(path))
    assert trans == case["transitions"]
    assert emis == case["emissions"]


def test_import_alignment_fasta_multiline_and_errors(tmp_path):
    path = tmp_path / "multi.fa"
    path.write_text(">a\nAC\nG-T\n>b\nACGGT\n")
    assert read_alignment_fasta(str(path)) == ["ACG-T", "ACGGT"]
    bad = tmp_path / "bad.fa"
    bad.write_text(">a\nACGT\n>b\nAC\n")
    with pytest.raises(ValueError, match="unequal"):
        read_alignment_fasta(str(bad))
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    with pytest.raises(ValueError, match="no sequences"):
        read_alignment_fasta(str(empty))
