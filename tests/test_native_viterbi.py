"""Native C++ sparse Viterbi vs the Python oracle and the compiled artifact."""

import numpy as np
import pytest

from advntr_tpu import dna
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.compiler import compile_graph, viterbi_full_graph
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.native_bridge import SparseViterbiModel
from advntr_tpu.ops.viterbi import viterbi_numpy


@pytest.fixture(scope="module")
def graph():
    trans, emis = profile_for_repeats(["CAGCAG", "CAGCAG", "CAACAG"], 0.05)
    return build_read_matcher("ACGTTGCA", "TTACGGAT", trans, emis, 3, 0.05)


READS = [
    "ACGTTGCACAGCAGCAGCAGCAACAGTTACGGAT",
    "TTGCACAGCAGCAGCAGTTACG",
    "CAGCAGCAGCAGCAACAG",
    "ACGTTGCACAGCTGCAGCAGTTACGGAT",
]


def test_native_matches_oracle(graph):
    model = SparseViterbiModel(graph)
    art = compile_graph(graph)
    for read in READS:
        codes = dna.encode(read)
        ref_logp, ref_path = viterbi_full_graph(graph, codes)
        logp, names = model.viterbi(codes)
        assert logp == pytest.approx(ref_logp, abs=1e-9), read
        art_logp, _ = viterbi_numpy(art, codes)
        assert art_logp == pytest.approx(logp, abs=1e-9)
        # full path including model start/end bracket
        assert names[0].endswith("-start") and names[-1].endswith("-end")
