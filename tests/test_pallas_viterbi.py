"""Pallas fused kernel (interpret mode) vs the structured kernel and the
float64 full-graph oracle: scores, path optimality, and analytics parity.

The provenance traceback may pick a different optimal path on exact float
ties, so the contract is: identical logp, path rescores (in f64) to the
optimal value, and identical genotyping analytics (RU counts are
tie-invariant — deletion always costs probability)."""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.engine.device_analytics import analytics_from_path
from advntr_tpu.models.compiler import compile_graph
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.models.struct_compiler import build_structured, pad_structured
from advntr_tpu.ops.pallas_viterbi import (
    PallasStructModel, viterbi_pallas_batch)
from advntr_tpu.ops.viterbi_struct import (
    StructDeviceModel, viterbi_struct_batch)


def make(pattern_units, left, right, copies, err=0.05):
    trans, emis = profile_for_repeats(pattern_units, err)
    g = build_read_matcher(left, right, trans, emis, copies, err)
    art = compile_graph(g)
    sm = build_structured(g, art)
    sm = pad_structured(sm, art, ((sm.P + 63) // 64) * 64,
                        ((sm.C + 7) // 8) * 8)
    dev = StructDeviceModel.from_struct(sm, art)
    pm = PallasStructModel.from_struct(sm, art)
    return art, sm, dev, pm


def rescore(art, path, codes):
    s = float(art.log_start[path[0]] + art.log_E[path[0], codes[0]])
    for t in range(1, len(codes)):
        s += art.log_T[path[t - 1], path[t]] + art.log_E[path[t], codes[t]]
    return s + float(art.log_end[path[-1]])


def run_both(art, sm, dev, pm, reads):
    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
    l1, _, p1 = viterbi_struct_batch(dev.flat(), batch, lengths,
                                     suffix_last=sm.suffix_last)
    l2, _, p2 = viterbi_pallas_batch(pm.flat(), batch, lengths,
                                     interpret=True)
    meta = (jnp.asarray(art.kind), jnp.asarray(art.region),
            jnp.asarray(art.exp_base), jnp.asarray(art.unit))
    a1 = analytics_from_path(meta, l1, p1, batch, lengths)
    a2 = analytics_from_path(meta, l2, p2, batch, lengths)
    return rows, map(np.asarray, (l1, l2, p1, p2)), a1, a2


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
def test_pallas_matches_struct(case):
    art, sm, dev, pm = make(*case)
    rows, (l1, l2, p1, p2), a1, a2 = run_both(art, sm, dev, pm, READS)
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-2)
    for b, codes in enumerate(rows):
        if not np.isfinite(l1[b]) or l1[b] < -1e20:
            continue
        s = rescore(art, p2[b][: len(codes)], codes)
        assert s == pytest.approx(float(l1[b]), rel=1e-4, abs=1e-2), READS[b]
    for k in ("repeats", "n_matches", "repeat_bp", "left_flank_bp",
              "right_flank_bp", "left_flank_matches",
              "right_flank_matches"):
        keep = l1 > -1e20
        np.testing.assert_array_equal(np.asarray(a1[k])[keep],
                                      np.asarray(a2[k])[keep], err_msg=k)


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


@pytest.mark.parametrize("case", CASES)
def test_fused_stats_kernel_matches_struct_dict(case):
    """The in-traceback analytics (viterbi_pallas_stats) must equal the
    struct kernel + XLA analytics_from_path on every dict key, including
    the flank match counts that ride the packed match bit."""
    from advntr_tpu.engine import device_analytics as da

    art, sm, dev, pm = make(*case)
    rows = [dna.encode(r) for r in READS]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
    meta = (jnp.asarray(art.kind), jnp.asarray(art.region),
            jnp.asarray(art.exp_base), jnp.asarray(art.unit))
    ref = da.read_stats_struct(dev.flat(), meta, batch, lengths,
                               sm.suffix_last, return_path=True)
    out = da.read_stats_pallas(pm.flat(), meta, batch, lengths,
                               return_path=True, interpret=True)
    l1 = np.asarray(ref["logp"])
    np.testing.assert_allclose(l1, np.asarray(out["logp"]),
                               rtol=1e-4, atol=1e-2)
    keep = l1 > -1e20
    for k in ("repeats", "n_matches", "repeat_bp", "left_flank_bp",
              "right_flank_bp", "left_flank_matches",
              "right_flank_matches"):
        np.testing.assert_array_equal(np.asarray(ref[k])[keep],
                                      np.asarray(out[k])[keep], err_msg=k)
    # decoded paths must rescore to the optimum (provenance walk parity)
    path = np.asarray(out["path"])
    for b, codes in enumerate(rows):
        if not keep[b]:
            continue
        s = rescore(art, path[b][: len(codes)], codes)
        assert s == pytest.approx(float(l1[b]), rel=1e-4, abs=1e-2)


def test_fused_stats_kernel_multi_chunk():
    """Chunked forward + full-batch backward: stats must be row-aligned
    across chunk boundaries (B spanning several forward chunks)."""
    import advntr_tpu.ops.pallas_viterbi as pv
    from advntr_tpu.engine import device_analytics as da

    art, sm, dev, pm = make(*CASES[0])
    rng = random.Random(99)
    reads = []
    for _ in range(64):
        hap = "ACGTTGCA" + "CAGCAG" * rng.randint(1, 5) + "TTACGGAT"
        a = rng.randint(0, max(0, len(hap) - 12))
        reads.append(hap[a:a + rng.randint(10, len(hap) - a)])
    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
    meta = (jnp.asarray(art.kind), jnp.asarray(art.region),
            jnp.asarray(art.exp_base), jnp.asarray(art.unit))
    ref = da.read_stats_struct(dev.flat(), meta, batch, lengths,
                               sm.suffix_last)
    old = pv.CHUNK_B
    pv.CHUNK_B = 16   # force 4 forward chunks
    try:
        out = da.read_stats_pallas(pm.flat(), meta, batch, lengths,
                                   interpret=True)
    finally:
        pv.CHUNK_B = old
    l1 = np.asarray(ref["logp"])
    np.testing.assert_allclose(l1, np.asarray(out["logp"]),
                               rtol=1e-4, atol=1e-2)
    keep = l1 > -1e20
    for k in ("repeats", "n_matches", "repeat_bp", "left_flank_bp",
              "right_flank_bp", "left_flank_matches",
              "right_flank_matches"):
        np.testing.assert_array_equal(np.asarray(ref[k])[keep],
                                      np.asarray(out[k])[keep], err_msg=k)


def test_engine_pallas_kernel_matches_struct(monkeypatch):
    """The engine's pallas path (ADVNTR_TPU_KERNEL=pallas, interpret on CPU)
    must produce the same scored stats as the struct path."""
    from advntr_tpu.config import Config
    from advntr_tpu.engine.finder import VNTRFinder, LocusModelCache
    from advntr_tpu.engine.simulate import simulate_diploid_reads
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    rng = random.Random(7)
    pattern = "CCGTAGATCGGA"
    ref = ReferenceVNTR(5, pattern, 1000, "chr1")
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = _rand_seq(rng, 200)
    ref.right_flanking_region = _rand_seq(rng, 200)
    reads, _, _ = simulate_diploid_reads(
        ref.left_flanking_region, pattern, 2, 4, ref.right_flanking_region,
        read_length=60, coverage=4, error_rate=0.01, seed=3)

    def run(kernel):
        monkeypatch.setenv("ADVNTR_TPU_KERNEL", kernel)
        finder = VNTRFinder(ref, Config(), model_cache=LocusModelCache())
        lm = finder.get_model(60)
        assert (lm.pallas is not None) == (kernel == "pallas")
        _, rows, row_info = finder.prepare_rows([], reads)
        batch, lengths = finder.pad_rows(rows)
        return finder.run_device(lm, batch, lengths)

    s1 = run("struct")
    s2 = run("pallas")
    np.testing.assert_allclose(s1["logp"], s2["logp"], rtol=1e-4, atol=1e-2)
    for k in ("repeats", "repeat_bp", "left_flank_bp", "right_flank_bp"):
        keep = s1["logp"] > -1e20
        np.testing.assert_array_equal(np.asarray(s1[k])[keep],
                                      np.asarray(s2[k])[keep], err_msg=k)


def test_pallas_random_soak():
    rng = random.Random(20240817)
    for trial in range(4):
        err = rng.choice([0.05, 0.3])
        plen = rng.choice([5, 11])
        pattern = _rand_seq(rng, plen)
        units = []
        for _ in range(3):
            u = list(pattern)
            if rng.random() < 0.5:
                u[rng.randrange(plen)] = rng.choice("ACGT")
            units.append("".join(u))
        left = _rand_seq(rng, rng.choice([12, 20]))
        right = _rand_seq(rng, rng.choice([12, 20]))
        copies = rng.choice([3, 5])
        art, sm, dev, pm = make(units, left, right, copies, err)
        reads = []
        for _ in range(12):
            hap = left + pattern * rng.randint(1, copies + 2) + right
            kind = rng.random()
            if kind < 0.5:
                a = rng.randint(0, max(0, len(hap) - 15))
                b = rng.randint(a + 10, len(hap))
                read = hap[a:b]
            elif kind < 0.7:
                read = _rand_seq(rng, rng.randint(10, 60))
            else:
                read = hap
            chars = list(read)
            for _ in range(rng.randint(0, 3)):
                pos = rng.randrange(len(chars))
                chars[pos] = rng.choice("ACGT")
            reads.append("".join(chars))
        rows, (l1, l2, p1, p2), a1, a2 = run_both(art, sm, dev, pm, reads)
        np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-2)
        for b, codes in enumerate(rows):
            if not np.isfinite(l1[b]) or l1[b] < -1e20:
                continue
            s = rescore(art, p2[b][: len(codes)], codes)
            assert s == pytest.approx(float(l1[b]), rel=1e-4, abs=1e-2), \
                (trial, reads[b])
        keep = l1 > -1e20
        for k in ("repeats", "repeat_bp", "left_flank_bp", "right_flank_bp"):
            np.testing.assert_array_equal(np.asarray(a1[k])[keep],
                                          np.asarray(a2[k])[keep],
                                          err_msg=f"{trial}:{k}")


def test_analyzer_grouped_dispatch_pallas_kernel(monkeypatch, tmp_path,
                                                 caplog):
    """The analyzer's grouped-dispatch path must work with the pallas
    kernel selected (interpret mode on CPU): the shape-bucket key reads
    PallasStructModel fields, and a field rename once broke every panel
    locus into the silent per-locus fallback (caught only on TPU runs).
    Asserts the grouped path succeeds with NO error-path fallback."""
    import io as _io
    import logging as _logging
    from advntr_tpu.config import Config
    from advntr_tpu.engine.analyzer import GenomeAnalyzer
    from advntr_tpu.engine.simulate import simulate_diploid_reads
    from advntr_tpu.io.bam import BamRead, BamWriter
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    monkeypatch.setenv("ADVNTR_TPU_KERNEL", "pallas")
    rng = random.Random(13)
    pattern = "GATCGATTCGAA"
    ref = ReferenceVNTR(56, pattern, 1000, "chr1")
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = _rand_seq(rng, 200)
    ref.right_flanking_region = _rand_seq(rng, 200)
    reads, _, _ = simulate_diploid_reads(
        ref.left_flanking_region, pattern, 2, 4, ref.right_flanking_region,
        read_length=100, coverage=30, error_rate=0.002, seed=9)
    bam_path = str(tmp_path / "s.bam")
    with BamWriter(bam_path, ["chr1"], [100000]) as w:
        for name, seq in reads:
            w.write(BamRead(name, 4, -1, -1, 0, [], seq, [38] * len(seq)))

    buf = _io.StringIO()
    with caplog.at_level(_logging.ERROR):
        analyzer = GenomeAnalyzer([ref], [56], str(tmp_path / "w") + "/",
                                  "text", config=Config(), out=buf,
                                  input_file=bam_path)
        analyzer.find_repeat_counts_from_alignment_file(bam_path)
    errors = [r for r in caplog.records if r.levelno >= _logging.ERROR]
    assert not errors, [r.getMessage() for r in errors]
    assert buf.getvalue().strip().splitlines() == ["56", "2/4"]


def test_singleton_batch_pads_to_sublane_tile():
    """B=1 batches (singleton spanning-read length buckets) must pad to a
    full sublane tile: Mosaic rejects the kernel's lane concats at
    sublane-1 blocks on hardware, and results must match the struct
    kernel after the pad is sliced off."""
    import numpy as np
    import jax.numpy as jnp
    from advntr_tpu import dna
    from advntr_tpu.engine import device_analytics as da
    from advntr_tpu.engine.finder import LocusModelCache
    from bench import build_locus, simulate_reads

    from advntr_tpu.models.struct_compiler import (build_structured,
                                                   pad_structured)
    from advntr_tpu.ops.pallas_viterbi import PallasStructModel
    from advntr_tpu.engine.finder import _round_up

    graph, art, left, right, pattern = build_locus(100)
    reads = simulate_reads(left, pattern, right, 100, 1)
    cache = LocusModelCache()
    lm = cache._build(graph, art)
    sm = build_structured(graph, art)
    sm = pad_structured(sm, art, _round_up(sm.P + 1, 128),
                        _round_up(sm.C, 8))
    pallas = PallasStructModel.from_struct(sm, art)
    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, pad_to=100, multiple=32)
    assert batch.shape[0] == 1
    out = da.read_stats_pallas(pallas.flat(), lm.meta,
                               jnp.asarray(batch), jnp.asarray(lengths),
                               interpret=True)
    ref = da.read_stats_struct(lm.struct_model().flat(), lm.meta,
                               jnp.asarray(batch), jnp.asarray(lengths),
                               lm.suffix_last)
    for k in ("repeats", "n_matches", "repeat_bp"):
        assert np.array_equal(np.asarray(out[k]), np.asarray(ref[k])), k
    np.testing.assert_allclose(np.asarray(out["logp"]),
                               np.asarray(ref["logp"]), rtol=1e-4,
                               atol=1e-2)
    assert out["logp"].shape == (1,)
