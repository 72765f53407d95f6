"""Checkpoint/resume: an interrupted panel run resumes from the per-locus
result checkpoint without re-scoring completed loci."""

import io
import json
import os
import random

from advntr_tpu.config import Config
from advntr_tpu.engine.analyzer import GenomeAnalyzer
from advntr_tpu.engine.simulate import simulate_diploid_reads
from advntr_tpu.io.bam import BamRead, BamWriter
from advntr_tpu.models.reference_vntr import ReferenceVNTR


def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_resume_from_checkpoint(tmp_path):
    pattern = "GATCGATTCGAA"
    ref = ReferenceVNTR(55, pattern, 1000, "chr1")
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = _rand_seq(21, 200)
    ref.right_flanking_region = _rand_seq(22, 200)
    reads, _, _ = simulate_diploid_reads(
        ref.left_flanking_region, pattern, 2, 4, ref.right_flanking_region,
        read_length=100, coverage=30, error_rate=0.002, seed=9)
    bam_path = str(tmp_path / "s.bam")
    with BamWriter(bam_path, ["chr1"], [100000]) as w:
        for name, seq in reads:
            w.write(BamRead(name, 4, -1, -1, 0, [], seq, [38] * len(seq)))

    def run():
        out = io.StringIO()
        analyzer = GenomeAnalyzer([ref], [55], str(tmp_path) + "/", "text",
                                  config=Config(), out=out,
                                  input_file=bam_path)
        analyzer.find_repeat_counts_from_alignment_file(bam_path)
        return out.getvalue().strip().splitlines()

    first = run()
    assert first == ["55", "2/4"]
    ckpt = str(tmp_path) + f"/results_checkpoint_s.bam.jsonl"
    assert os.path.exists(ckpt)
    rec = json.loads(open(ckpt).readline())
    assert rec["vid"] == 55 and rec["copy_numbers"] == [2, 4]

    # tamper with the checkpoint to prove the second run replays it
    with open(ckpt, "w") as fh:
        rec["copy_numbers"] = [7, 9]
        fh.write(json.dumps(rec) + "\n")
    second = run()
    assert second == ["55", "7/9"]


def test_checkpoint_appends_incrementally(tmp_path, monkeypatch):
    """Chunk results append to the checkpoint as they collect, so a crash
    mid-panel preserves completed loci (genome-scale resume)."""
    import pytest
    from advntr_tpu.engine.analyzer import GenomeAnalyzer as GA

    loci = []
    reads_all = []
    for i, seed in enumerate((31, 32)):
        pattern = "GATCGATTCGAA"
        ref = ReferenceVNTR(60 + i, pattern, 1000 + 5000 * i, "chr1")
        ref.repeat_segments = [pattern] * 3
        ref.left_flanking_region = _rand_seq(seed, 200)
        ref.right_flanking_region = _rand_seq(seed + 50, 200)
        loci.append(ref)
        reads, _, _ = simulate_diploid_reads(
            ref.left_flanking_region, pattern, 2, 4,
            ref.right_flanking_region, read_length=100, coverage=30,
            error_rate=0.002, seed=seed)
        reads_all.extend((f"{ref.id}_{n}", s) for n, s in reads)
    bam_path = str(tmp_path / "two.bam")
    with BamWriter(bam_path, ["chr1"], [100000]) as w:
        for name, seq in reads_all:
            w.write(BamRead(name, 4, -1, -1, 0, [], seq, [38] * len(seq)))

    # force one-locus chunks, and blow up after the FIRST chunk collects
    orig_collect = GA._collect_group
    calls = {"n": 0}

    def crashing_collect(self, *a, **kw):
        if calls["n"] >= 1:
            raise KeyboardInterrupt("simulated crash")
        calls["n"] += 1
        return orig_collect(self, *a, **kw)

    orig_grouped = GA._genotype_loci_grouped
    monkeypatch.setattr(
        GA, "_genotype_loci_grouped",
        lambda self, *a, **kw: orig_grouped(
            self, *a, **{**kw, "group_size": 1}))
    monkeypatch.setattr(GA, "_collect_group", crashing_collect)

    out = io.StringIO()
    analyzer = GenomeAnalyzer([loci[0], loci[1]], [60, 61],
                              str(tmp_path) + "/", "text", config=Config(),
                              out=out, input_file=bam_path)
    with pytest.raises(KeyboardInterrupt):
        analyzer.find_repeat_counts_from_alignment_file(bam_path)

    ckpt = str(tmp_path) + "/results_checkpoint_two.bam.jsonl"
    assert os.path.exists(ckpt), "first chunk's append must survive a crash"
    recs = [json.loads(l) for l in open(ckpt)]
    assert len(recs) == 1 and recs[0]["copy_numbers"] == [2, 4]

    # a clean rerun resumes: replays the checkpointed locus, scores the rest
    monkeypatch.setattr(GA, "_collect_group", orig_collect)
    out = io.StringIO()
    analyzer = GenomeAnalyzer([loci[0], loci[1]], [60, 61],
                              str(tmp_path) + "/", "text", config=Config(),
                              out=out, input_file=bam_path)
    analyzer.find_repeat_counts_from_alignment_file(bam_path)
    assert out.getvalue().strip().splitlines() == ["60", "2/4", "61", "2/4"]


def test_grouped_fallback_alarm(tmp_path, monkeypatch):
    """A grouped-dispatch failure must be counted on the analyzer so panel
    harnesses can fail loudly instead of silently running ~10x slower
    (the f4e4ee3 regression class)."""
    from advntr_tpu.engine.analyzer import GenomeAnalyzer as GA

    pattern = "GATCGATTCGAA"
    ref = ReferenceVNTR(70, pattern, 1000, "chr1")
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = _rand_seq(41, 200)
    ref.right_flanking_region = _rand_seq(42, 200)
    reads, _, _ = simulate_diploid_reads(
        ref.left_flanking_region, pattern, 2, 4, ref.right_flanking_region,
        read_length=100, coverage=30, error_rate=0.002, seed=7)
    bam_path = str(tmp_path / "f.bam")
    with BamWriter(bam_path, ["chr1"], [100000]) as w:
        for name, seq in reads:
            w.write(BamRead(name, 4, -1, -1, 0, [], seq, [38] * len(seq)))

    def broken_dispatch(self, *a, **kw):
        raise ValueError("simulated dispatch regression")

    monkeypatch.setattr(GA, "_dispatch_group", broken_dispatch)
    out = io.StringIO()
    analyzer = GenomeAnalyzer([ref], [70], str(tmp_path) + "/", "text",
                              config=Config(), out=out, input_file=bam_path)
    analyzer.find_repeat_counts_from_alignment_file(bam_path)
    # fallback path still produces the right genotype...
    assert out.getvalue().strip().splitlines() == ["70", "2/4"]
    # ...but the degradation is counted, not silent
    assert analyzer.grouped_fallback_vids == [70]
