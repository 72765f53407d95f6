"""Compiler conformance: compiled dense HMM == full-graph reference recurrence.

The oracle (viterbi_full_graph) implements the exact silent-state Viterbi
passes of the reference kernel (pomegranate/hmm.pyx:2002-2130); the compiled
artifact must reproduce its log-probabilities and (tie-free) paths.
"""

import numpy as np
import pytest

from advntr_tpu import dna
from advntr_tpu.models.graph import build_read_matcher, build_repeat_finder
from advntr_tpu.models.compiler import (
    compile_graph, viterbi_full_graph, expand_path, score_visited_path)
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.ops.viterbi import viterbi_numpy


def small_read_matcher(copies=3, err=0.05):
    left = "ACGTTGCA"
    right = "TTACGGAT"
    repeats = ["CAGCAG", "CAGCAG", "CAACAG"]
    trans, emis = profile_for_repeats(repeats, err)
    return build_read_matcher(left, right, trans, emis, copies, err)


@pytest.fixture(scope="module")
def model():
    g = small_read_matcher()
    return g, compile_graph(g)


READS = [
    "ACGTTGCACAGCAGCAGCAGCAACAGTTACGGAT",   # flank + 3 units + flank
    "TTGCACAGCAGCAGCAGTTACG",               # partial flanks, 2 units
    "CAGCAGCAGCAGCAACAG",                   # repeats only
    "ACGTTGCACAGCTGCAGCAGTTACGGAT",         # one SNP inside a unit
    "ACGTTGCACAGAGCAGCAGTTACGGAT",          # one deleted base
    "ACGTTGCACAGGCAGCAGCAGTTACGGAT",        # one inserted base
    "GGGGGGGGGGGGGGGG",                     # junk
    "ACGT",                                 # very short
]


def test_logp_matches_oracle(model):
    g, art = model
    for read in READS:
        codes = dna.encode(read)
        ref_logp, _ = viterbi_full_graph(g, codes)
        logp, _ = viterbi_numpy(art, codes)
        assert logp == pytest.approx(ref_logp, abs=1e-9), read


def test_paths_match_oracle(model):
    g, art = model
    for read in READS:
        codes = dna.encode(read)
        ref_logp, ref_path = viterbi_full_graph(g, codes)
        logp, path = viterbi_numpy(art, codes)
        if ref_path is None:
            assert path is None or not np.isfinite(logp)
            continue
        expanded = expand_path(art, path)
        if expanded != ref_path[1:-1]:
            # tie-broken differently: both must be optimal under the graph
            s1 = score_visited_path(g, expanded, codes)
            s2 = score_visited_path(g, ref_path[1:-1], codes)
            assert s1 == pytest.approx(ref_logp, abs=1e-9), read
            assert s2 == pytest.approx(ref_logp, abs=1e-9), read


def test_repeat_finder_against_oracle():
    g = build_repeat_finder("CAGT", copies=4)
    art = compile_graph(g)
    region = "TTCAGTCAGTCAGTCAGTGG"
    codes = dna.encode(region)
    ref_logp, ref_path = viterbi_full_graph(g, codes)
    logp, path = viterbi_numpy(art, codes)
    assert logp == pytest.approx(ref_logp, abs=1e-9)
    assert expand_path(art, path) == ref_path[1:-1]


def test_effective_start_mass(model):
    g, art = model
    # a read can begin mid-flank or directly inside the first repeat copy
    finite = np.isfinite(art.log_start)
    start_names = {art.names[i] for i in np.nonzero(finite)[0]}
    assert any(n.endswith("_suffix") and n.startswith("M") for n in start_names)
    assert any(n.endswith("_0") and n.startswith("M") for n in start_names)


def test_match_states_have_exit(model):
    g, art = model
    # every repeat match state can exit straight to END (0.7/k mass)
    from advntr_tpu.models.graph import K_MATCH, R_REPEAT
    for i in range(art.n_states):
        if art.kind[i] == K_MATCH and art.region[i] == R_REPEAT:
            assert np.isfinite(art.log_end[i])
