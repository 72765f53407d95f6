"""Pomegranate trained-HMM JSON interchange: round-trip equality of the
compiled model, Viterbi parity, and the finder's trained-cache wiring
(reference format hmm.pyx:3023-3145, consumed at vntr_finder.py:117-138)."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.models.compiler import compile_graph
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.hmm_json import (graph_from_pomegranate_json,
                                        graph_to_pomegranate_json)
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.ops.viterbi import viterbi_numpy

LEFT, RIGHT = "ACGTTGCA", "TTACGGAT"
UNITS = ["CAGCAG", "CAGCAG", "CAACAG"]
READS = [
    "ACGTTGCACAGCAGCAGCAGCAACAGTTACGGAT",
    "TTGCACAGCAGCAGCAGTTACG",
    "ACGTTGCACAGCTGCAGCAGTTACGGAT",
]


def _build():
    trans, emis = profile_for_repeats(UNITS, 0.05)
    return build_read_matcher(LEFT, RIGHT, trans, emis, 3, 0.05)


def test_round_trip_graph_and_viterbi():
    g = _build()
    doc = graph_to_pomegranate_json(g)
    parsed = json.loads(doc)
    assert parsed["class"] == "HiddenMarkovModel"
    g2 = graph_from_pomegranate_json(doc)

    # states carry identical names, emissions and analytics metadata
    by_name = {s.name: s for s in g.states}
    by_name2 = {s.name: s for s in g2.states}
    assert set(by_name) == set(by_name2)
    for name, s in by_name.items():
        s2 = by_name2[name]
        assert (s.kind, s.region, s.unit) == (s2.kind, s2.region, s2.unit), \
            name
        if s.emission is None:
            assert s2.emission is None
        else:
            assert s.emission == s2.emission
    # identical edge set (probability space)
    def edge_names(graph):
        return {(graph.states[a].name, graph.states[b].name): p
                for (a, b), p in graph.edges.items()}
    assert edge_names(g) == edge_names(g2)

    # identical Viterbi results through the compiler
    art1, art2 = compile_graph(g), compile_graph(g2)
    for read in READS:
        codes = dna.encode(read)
        logp1, path1 = viterbi_numpy(art1, codes)
        logp2, path2 = viterbi_numpy(art2, codes)
        assert logp1 == pytest.approx(logp2, rel=1e-12, abs=1e-12)


def test_finder_uses_trained_hmm_cache(tmp_path):
    import dataclasses
    from advntr_tpu.config import Config
    from advntr_tpu.engine.finder import VNTRFinder, LocusModelCache
    from advntr_tpu.models.hmm_json import save_trained_hmm
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    ref = ReferenceVNTR(77, "CAGCAG", 100, "chr1")
    ref.repeat_segments = UNITS
    ref.left_flanking_region = LEFT
    ref.right_flanking_region = RIGHT

    g = _build()
    save_trained_hmm(g, str(tmp_path / "77_34.json"))

    config = dataclasses.replace(Config(),
                                 trained_hmms_dir=str(tmp_path))
    f = VNTRFinder(ref, config, False, model_cache=LocusModelCache())
    lm = f.get_model(34)
    assert lm is not None
    # the imported model scores reads through the normal device path
    scored, _ = f.score_reads([], [(f"r{i}", r)
                                   for i, r in enumerate(READS)],
                              34, model=lm)
    assert len(scored) == len(READS)
    art = compile_graph(g)
    for s, read in zip(scored, READS):
        want, _ = viterbi_numpy(art, dna.encode(read))
        # unmapped reads score both orientations; forward wins here
        assert s.logp == pytest.approx(want, rel=1e-3, abs=0.05)

    # no file for this read length -> falls back to the built model
    f2 = VNTRFinder(ref, config, False, model_cache=LocusModelCache())
    assert f2._load_trained_hmm(99) is None
