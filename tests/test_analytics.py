"""Path-analytics conformance against the reference's recorded fixture
(tests/data/hmm_utils.json is the recorded Viterbi-path data fixture from the
reference repository: a real visited-state sequence with expected repeat
segments and MSA)."""

import json
import os

import pytest

from advntr_tpu.engine import analytics
from advntr_tpu.models.msa import msa_from_viterbi_paths


@pytest.fixture(scope="module")
def fixture():
    path = os.path.join(os.path.dirname(__file__), "data", "hmm_utils.json")
    with open(path) as fh:
        return json.load(fh)


def test_extract_repeating_segments(fixture):
    visited = fixture["visited_states"].split(",")
    repeats, _ = analytics.extract_repeating_segments(fixture["sequence"],
                                                      visited)
    assert repeats == fixture["correct_repeats"]


def test_msa_of_viterbi_paths_real_data(fixture):
    visited = fixture["visited_states"].split(",")
    repeats, states = analytics.extract_repeating_segments(
        fixture["sequence"], visited)
    alignment = msa_from_viterbi_paths(repeats, states)
    assert alignment == fixture["alignment"]


def test_msa_of_viterbi_paths_two_sequences():
    repeats = ["ACTTA", "ATTGA"]
    states = [["M1", "M2", "M3", "M4", "M5"],
              ["M1", "D2", "M3", "M4", "I4", "M5"]]
    assert msa_from_viterbi_paths(repeats, states) == ["ACTT-A", "A-TTGA"]


def test_count_repeats_on_fixture(fixture):
    visited = fixture["visited_states"].split(",")
    # the fixture path spans 8 complete units plus a truncated leading one
    assert analytics.count_repeats(visited) == 9


def test_flank_sizes_on_fixture(fixture):
    visited = fixture["visited_states"].split(",")
    # read starts at M11_0 (no suffix flank states) and ends after 131
    # prefix match states
    assert analytics.left_flank_size(visited) == 0
    assert analytics.right_flank_size(visited) == 131
