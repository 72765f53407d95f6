"""JAX batched Viterbi vs the float64 numpy implementation."""

import numpy as np
import pytest

from advntr_tpu import dna
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.compiler import compile_graph
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.ops.viterbi import (
    viterbi_numpy, viterbi_batch, prepare_model_tensors)


@pytest.fixture(scope="module")
def art():
    trans, emis = profile_for_repeats(["CAGCAG", "CAGCAG", "CAACAG"], 0.05)
    g = build_read_matcher("ACGTTGCA", "TTACGGAT", trans, emis, 3, 0.05)
    return compile_graph(g)


READS = [
    "ACGTTGCACAGCAGCAGCAGCAACAGTTACGGAT",
    "TTGCACAGCAGCAGCAGTTACG",
    "CAGCAGCAGCAGCAACAG",
    "ACGTTGCACAGCTGCAGCAGTTACGGAT",
    "ACGT",
    "A",
]


def test_batch_matches_numpy(art):
    codes = [dna.encode(r) for r in READS]
    batch, lengths = dna.pad_batch(codes, multiple=8)
    tensors = prepare_model_tensors(art)
    logp, end_state, path = viterbi_batch(*tensors, batch, lengths)
    logp = np.asarray(logp)
    path = np.asarray(path)
    for b, c in enumerate(codes):
        ref_logp, ref_path = viterbi_numpy(art, c)
        assert logp[b] == pytest.approx(ref_logp, rel=1e-5, abs=1e-3), READS[b]
        # paths must be identical when scores are far from ties; verify by
        # re-scoring the device path in float64
        dev_path = path[b, : len(c)]
        s = float(art.log_start[dev_path[0]] + art.log_E[dev_path[0], c[0]])
        for t in range(1, len(c)):
            s += art.log_T[dev_path[t - 1], dev_path[t]]
            s += art.log_E[dev_path[t], c[t]]
        s += art.log_end[dev_path[-1]]
        assert s == pytest.approx(ref_logp, rel=1e-5, abs=1e-3), READS[b]


def test_batch_handles_unmatchable_read(art):
    # a read that cannot reach END keeps -inf-ish logp
    codes = [dna.encode("ACGTTGCACAGCAGTTACGGAT"), dna.encode("T" * 30)]
    batch, lengths = dna.pad_batch(codes, multiple=8)
    tensors = prepare_model_tensors(art)
    logp, _, _ = viterbi_batch(*tensors, batch, lengths)
    assert np.isfinite(np.asarray(logp)[0])
