"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from advntr_tpu import dna
from advntr_tpu.engine import device_analytics as da
from advntr_tpu.engine.finder import _pad_artifact
from advntr_tpu.models.compiler import compile_graph
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.parallel.mesh import (
    make_mesh, stack_models, multi_locus_read_stats, data_parallel_read_stats)


def make_model(pattern, copies=3, n_pad=256):
    trans, emis = profile_for_repeats([pattern] * 3, 0.05)
    g = build_read_matcher("ACGTTGCAGT", "TTACGGATCC", trans, emis, copies,
                           0.05)
    art = _pad_artifact(compile_graph(g), n_pad)
    return art, da.DeviceModel.from_artifact(art)


@pytest.fixture(scope="module")
def models():
    return [make_model("CAGCAG"), make_model("TTGGCC")]


def _read_batch(patterns, B=8, L=64):
    seqs, lengths = [], []
    for pattern in patterns:
        rows = []
        for i in range(B):
            s = ("ACGTTGCAGT" + pattern * 4 + "TTACGGATCC")[: L]
            rows.append(dna.encode(s))
        b, ln = dna.pad_batch(rows, pad_to=L, multiple=1)
        seqs.append(b)
        lengths.append(ln)
    return np.stack(seqs), np.stack(lengths)


def test_multi_locus_sharded(models):
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_loci=2, n_reads=4)
    stacked = stack_models([m for _, m in models])
    seqs, lengths = _read_batch(["CAGCAG", "TTGGCC"], B=8)
    out = multi_locus_read_stats(mesh, stacked, seqs, lengths)
    assert out["logp"].shape == (2, 8)
    # cross-check against per-locus unsharded runs
    for gi, (_, model) in enumerate(models):
        ref = da.read_stats(model.flat(), seqs[gi], lengths[gi])
        np.testing.assert_allclose(np.asarray(out["logp"][gi]),
                                   np.asarray(ref["logp"]), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["repeats"][gi]),
                                      np.asarray(ref["repeats"]))


def test_data_parallel_single_locus(models):
    mesh = make_mesh(n_loci=1, n_reads=8)
    _, model = models[0]
    seqs, lengths = _read_batch(["CAGCAG"], B=16)
    out = data_parallel_read_stats(mesh, model.flat(), seqs[0], lengths[0])
    ref = da.read_stats(model.flat(), seqs[0], lengths[0])
    np.testing.assert_allclose(np.asarray(out["logp"]),
                               np.asarray(ref["logp"]), rtol=1e-5)
