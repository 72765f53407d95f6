"""Native IO round-trips: BGZF, BAM write/read, BAI fetch, FASTA/FASTQ."""

import os
import random

import pytest

from advntr_tpu.io.bgzf import BgzfReader, BgzfWriter
from advntr_tpu.io.bam import (
    BamRead, BamReader, BamWriter, build_bai, get_reference_genome_style)
from advntr_tpu.io import fasta


def test_bgzf_roundtrip(tmp_path):
    path = str(tmp_path / "x.bgzf")
    data = bytes(random.Random(0).randrange(256) for _ in range(300_000))
    with BgzfWriter(path) as w:
        w.write(data)
    with BgzfReader(path) as r:
        assert r.read(len(data) + 10) == data


def test_bgzf_virtual_offsets(tmp_path):
    path = str(tmp_path / "x.bgzf")
    w = BgzfWriter(path)
    offsets = []
    for i in range(100):
        offsets.append(w.tell_virtual())
        w.write(f"record-{i:04d};".encode() * 500)
    w.close()
    r = BgzfReader(path)
    r.seek_virtual(offsets[57])
    assert r.read(11) == b"record-0057"


def make_bam(tmp_path, n_reads=50, sorted_reads=True):
    path = str(tmp_path / "test.bam")
    rng = random.Random(1)
    reads = []
    for i in range(n_reads):
        pos = rng.randrange(0, 9000)
        seq = "".join(rng.choice("ACGT") for _ in range(100))
        reads.append(BamRead(
            query_name=f"read{i}", flag=0, reference_id=0,
            reference_start=pos, mapq=60, cigar=[(0, 100)], seq=seq,
            qual=[30] * 100))
    # a few unmapped reads
    for i in range(5):
        seq = "".join(rng.choice("ACGT") for _ in range(100))
        reads.append(BamRead(
            query_name=f"un{i}", flag=4, reference_id=-1,
            reference_start=-1, mapq=0, cigar=[], seq=seq, qual=[30] * 100))
    if sorted_reads:
        reads.sort(key=lambda r: (r.is_unmapped, r.reference_start))
    with BamWriter(path, ["chr1"], [10000]) as w:
        for r in reads:
            w.write(r)
    return path, reads


def test_bam_roundtrip(tmp_path):
    path, reads = make_bam(tmp_path)
    with BamReader(path) as r:
        assert r.references == ["chr1"]
        got = list(r)
    assert len(got) == len(reads)
    for a, b in zip(got, reads):
        assert a.query_name == b.query_name
        assert a.seq == b.seq
        assert a.reference_start == b.reference_start
        assert a.flag == b.flag


def test_bam_fetch_region(tmp_path):
    path, reads = make_bam(tmp_path)
    build_bai(path)
    with BamReader(path) as r:
        got = {x.query_name for x in r.fetch("chr1", 2000, 3000)}
    want = {x.query_name for x in reads
            if not x.is_unmapped and x.reference_start < 3000
            and x.reference_start + 100 > 2000}
    assert got == want


def test_bam_unmapped_stream(tmp_path):
    path, reads = make_bam(tmp_path)
    with BamReader(path) as r:
        got = [x.query_name for x in r.fetch_unmapped()]
    assert sorted(got) == [f"un{i}" for i in range(5)]


def test_reference_style():
    assert get_reference_genome_style(["chr1", "chr2"]) == "HG19"
    assert get_reference_genome_style(["1", "2"]) == "GRCh37"


def test_fasta_fastq(tmp_path):
    fa = str(tmp_path / "x.fa")
    fasta.write_fasta(fa, [("a", "ACGT"), ("b", "GGGG")])
    assert list(fasta.read_fasta(fa)) == [("a", "ACGT"), ("b", "GGGG")]
    fq = str(tmp_path / "x.fastq")
    with open(fq, "w") as fh:
        fh.write("@r1\nACGT\n+\nIIII\n@r2\nTTTT\n+\nIIII\n")
    assert list(fasta.read_any(fq)) == [("r1", "ACGT"), ("r2", "TTTT")]
