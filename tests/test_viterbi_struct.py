"""Structured kernel vs dense eliminated kernel: identical scores + paths."""

import numpy as np
import pytest
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.models.compiler import compile_graph
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.models.struct_compiler import build_structured
from advntr_tpu.ops.viterbi import viterbi_numpy
from advntr_tpu.ops.viterbi_struct import (
    StructDeviceModel, viterbi_struct_batch)


def make(pattern_units, left, right, copies, err=0.05):
    trans, emis = profile_for_repeats(pattern_units, err)
    g = build_read_matcher(left, right, trans, emis, copies, err)
    art = compile_graph(g)
    sm = build_structured(g, art)
    dev = StructDeviceModel.from_struct(sm, art)
    return art, sm, dev


CASES = [
    (["CAGCAG", "CAGCAG", "CAACAG"], "ACGTTGCA", "TTACGGAT", 3),
    (["CGCGGGGCGGGG"] * 3, "ACGTACTGACGATCGATT", "TTACGGATGCAGTACGTA", 5),
]

READS = [
    "ACGTTGCACAGCAGCAGCAGCAACAGTTACGGAT",
    "TTGCACAGCAGCAGCAGTTACG",
    "CAGCAGCAGCAGCAACAG",
    "ACGTTGCACAGCTGCAGCAGTTACGGAT",
    "ACGTTGCACAGAGCAGCAGTTACGGAT",
    "ACGTTGCACAGGCAGCAGCAGTTACGGAT",
    "ACGTACTGACGATCGATTCGCGGGGCGGGGCGCGGGGCGGGGTTACGGATGCAGTACGTA",
    "GGGGCGGGGCGCGGGGCG",
    "ACGT",
    "TTTTTTTTTTTTTTTTTT",
]


@pytest.mark.parametrize("case", CASES)
def test_struct_matches_dense(case):
    art, sm, dev = make(*case)
    rows = [dna.encode(r) for r in READS]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    logp, end_state, path = viterbi_struct_batch(
        dev.flat(), jnp.asarray(batch), jnp.asarray(lengths),
        suffix_last=sm.suffix_last)
    logp = np.asarray(logp)
    path = np.asarray(path)
    for b, codes in enumerate(rows):
        ref_logp, ref_path = viterbi_numpy(art, codes)
        assert logp[b] == pytest.approx(ref_logp, rel=1e-4, abs=1e-2), READS[b]
        if ref_path is None or not np.isfinite(ref_logp):
            continue
        # device path must rescore (in f64) to the optimal value
        p = path[b][: len(codes)]
        s = float(art.log_start[p[0]] + art.log_E[p[0], codes[0]])
        for t in range(1, len(codes)):
            s += art.log_T[p[t - 1], p[t]] + art.log_E[p[t], codes[t]]
        s += art.log_end[p[-1]]
        assert s == pytest.approx(ref_logp, rel=1e-4, abs=1e-2), READS[b]
