"""Forward algorithm: sum-closure elimination vs the full-graph oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.models.compiler import compile_graph_sum, forward_full_graph
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.ops.viterbi import forward_batch

READS = [
    "ACGTTGCACAGCAGCAGCAGCAACAGTTACGGAT",
    "TTGCACAGCAGCAGCAGTTACG",
    "CAGCAGCAGCAGCAACAG",
    "ACGTTGCACAGCTGCAGCAGTTACGGAT",
]


def test_forward_matches_oracle():
    trans, emis = profile_for_repeats(["CAGCAG", "CAGCAG", "CAACAG"], 0.05)
    g = build_read_matcher("ACGTTGCA", "TTACGGAT", trans, emis, 3, 0.05)
    log_T, log_E, log_start, log_end = compile_graph_sum(g)

    def clean(x):
        return jnp.asarray(np.where(np.isfinite(x), x, -1e30),
                           dtype=jnp.float32)

    rows = [dna.encode(r) for r in READS]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    loglik = np.asarray(forward_batch(
        clean(log_T), clean(log_E), clean(log_start), clean(log_end),
        jnp.asarray(batch), jnp.asarray(lengths)))
    for b, codes in enumerate(rows):
        ref = forward_full_graph(g, codes)
        assert loglik[b] == pytest.approx(ref, rel=1e-4, abs=1e-2), READS[b]
        # forward likelihood upper-bounds the Viterbi path score
        from advntr_tpu.models.compiler import compile_graph
        from advntr_tpu.ops.viterbi import viterbi_numpy
    art = compile_graph(g)
    from advntr_tpu.ops.viterbi import viterbi_numpy
    for b, codes in enumerate(rows):
        vit, _ = viterbi_numpy(art, codes)
        assert loglik[b] >= vit - 1e-3
