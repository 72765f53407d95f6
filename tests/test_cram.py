"""CRAM reader/writer tests: varints, the rANS-4x8 codec, record
round-trips (feature-encoded mapped reads + unmapped reads), region fetch,
and the genotyping CLI on a CRAM input (reference capability:
advntr_commands.py:82-84 / sam_utils.py:17 accept CRAM via pysam 'rc')."""

import io as _io
import os
import random

import pytest

from advntr_tpu.io.bam import BamRead
from advntr_tpu.io.cram import (CramReader, CramWriter, rans_decode,
                                rans_encode_o0, read_itf8, read_ltf8,
                                write_itf8, write_ltf8)


def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def test_itf8_round_trip():
    for v in [0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
              268435455, 268435456, 2147483647, -1, -2, -2147483648]:
        assert read_itf8(_io.BytesIO(write_itf8(v))) == v


def test_ltf8_round_trip():
    for v in [0, 1, 127, 128, (1 << 14) - 1, 1 << 14, (1 << 21), (1 << 28),
              (1 << 35), (1 << 42), (1 << 49), (1 << 56), (1 << 62),
              (1 << 63) - 1, -1, -(1 << 63)]:
        assert read_ltf8(_io.BytesIO(write_ltf8(v))) == v


def test_rans_order0_round_trip():
    rng = random.Random(7)
    for data in [b"", b"A", b"AAAA" * 50,
                 bytes(rng.randrange(256) for _ in range(1000)),
                 bytes(rng.choice(b"ACGT") for _ in range(5000)),
                 bytes(range(256)) * 3]:
        assert rans_decode(rans_encode_o0(data)) == data


# ---------------------------------------------------------------------------
# round-trip
# ---------------------------------------------------------------------------

CHROM = _rand_seq(11, 20000)


@pytest.fixture()
def ref_fasta(tmp_path):
    path = str(tmp_path / "ref.fa")
    with open(path, "w") as fh:
        fh.write(">chr21\n")
        for i in range(0, len(CHROM), 80):
            fh.write(CHROM[i:i + 80] + "\n")
    return path


def _mapped(name, start, seq, cigar, mapq=60, flag=0):
    return BamRead(name, flag, 0, start, mapq, cigar, seq,
                   [30 + (i % 10) for i in range(len(seq))], "chr21")


def _reads():
    reads = []
    # perfect match
    reads.append(_mapped("r_exact", 1000, CHROM[1000:1100], [(0, 100)]))
    # substitutions
    seq = list(CHROM[2000:2100])
    seq[10] = "A" if seq[10] != "A" else "C"
    seq[57] = "G" if seq[57] != "G" else "T"
    reads.append(_mapped("r_snp", 2000, "".join(seq), [(0, 100)]))
    # insertion + deletion
    seq = CHROM[3000:3040] + "ACGTA" + CHROM[3040:3080]
    reads.append(_mapped("r_ins", 3000, seq, [(0, 40), (1, 5), (0, 40)]))
    seq = CHROM[4000:4030] + CHROM[4042:4100]
    reads.append(_mapped("r_del", 4000, seq,
                         [(0, 30), (2, 12), (0, 58)]))
    # soft + hard clips, reverse flag
    seq = "TTTTT" + CHROM[5000:5080]
    reads.append(_mapped("r_clip", 5000, seq, [(4, 5), (0, 80), (5, 3)],
                         flag=16))
    # unmapped
    reads.append(BamRead("u_1", 4, -1, -1, 0, [], _rand_seq(3, 151),
                         [35] * 151, None))
    reads.append(BamRead("u_2", 4, -1, -1, 0, [], _rand_seq(4, 90),
                         [20] * 90, None))
    return reads


def _write_cram(path, reads, per_container=10000):
    with CramWriter(path, ["chr21"], [len(CHROM)],
                    reference_seqs={"chr21": CHROM},
                    records_per_container=per_container) as w:
        for r in reads:
            w.write(r)


def test_cram_round_trip(tmp_path, ref_fasta):
    path = str(tmp_path / "t.cram")
    reads = _reads()
    _write_cram(path, reads)
    with CramReader(path, reference_fasta=ref_fasta) as cr:
        assert cr.references == ["chr21"]
        assert cr.lengths == [len(CHROM)]
        got = list(cr)
    assert len(got) == len(reads)
    for orig, dec in zip(reads, got):
        assert dec.query_name == orig.query_name
        assert dec.flag == orig.flag
        assert dec.seq == orig.seq
        assert dec.qual == orig.qual
        assert dec.reference_id == orig.reference_id
        assert dec.reference_start == orig.reference_start
        if not orig.is_unmapped:
            assert dec.mapq == orig.mapq
            # hard clips aside, the cigar round-trips op-for-op
            assert [c for c in dec.cigar] == [c for c in orig.cigar]


def test_cram_multi_container_fetch(tmp_path, ref_fasta):
    path = str(tmp_path / "m.cram")
    reads = sorted((r for r in _reads() if not r.is_unmapped),
                   key=lambda r: r.reference_start)
    reads += [r for r in _reads() if r.is_unmapped]
    _write_cram(path, reads, per_container=2)
    with CramReader(path, reference_fasta=ref_fasta) as cr:
        hits = list(cr.fetch("chr21", 1990, 2150))
        assert [r.query_name for r in hits] == ["r_snp"]
        assert hits[0].seq[10] != CHROM[2010] and len(hits[0].seq) == 100
        unmapped = list(cr.fetch_unmapped())
        assert sorted(r.query_name for r in unmapped) == ["u_1", "u_2"]


def test_cram_requires_reference_for_mapped(tmp_path):
    path = str(tmp_path / "noref.cram")
    _write_cram(path, _reads())
    with CramReader(path) as cr:
        with pytest.raises(ValueError, match="reference"):
            list(cr)
    # unmapped-only access works without the reference FASTA: the writer
    # groups them in the same multi-ref containers, so decoding still
    # touches mapped records — but a pure-unmapped file is fine
    path2 = str(tmp_path / "unmapped.cram")
    _write_cram(path2, [r for r in _reads() if r.is_unmapped])
    with CramReader(path2) as cr:
        assert len(list(cr.fetch_unmapped())) == 2


def test_open_alignment_dispatch(tmp_path, ref_fasta):
    from advntr_tpu.io.sam import open_alignment
    path = str(tmp_path / "d.cram")
    _write_cram(path, _reads())
    with open_alignment(path, ref_fasta) as fh:
        assert isinstance(fh, CramReader)
        assert len(fh.head(3)) == 3


# ---------------------------------------------------------------------------
# CLI end-to-end on CRAM (mirrors tests/test_cli_end_to_end.py on BAM)
# ---------------------------------------------------------------------------

def test_genotype_cli_on_cram(tmp_path):
    from advntr_tpu import cli
    from advntr_tpu.engine.simulate import simulate_diploid_reads
    from advntr_tpu.models.db import (create_vntrs_database,
                                      save_reference_vntr_to_database)
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    pattern = "CGCGGGGCGGGG"
    left = _rand_seq(1, 300)
    right = _rand_seq(2, 300)
    vntr_start = 5000
    db_file = str(tmp_path / "models.db")
    ref = ReferenceVNTR(301645, pattern, vntr_start, "chr21", "CSTB",
                        "Promoter", 3)
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = left
    ref.right_flanking_region = right
    create_vntrs_database(db_file)
    save_reference_vntr_to_database(ref, db_file)

    # reference chromosome carrying the 3-copy allele at the locus
    chrom = (_rand_seq(8, vntr_start - 300) + left + pattern * 3 + right
             + _rand_seq(9, 3000))
    fasta = str(tmp_path / "ref.fa")
    with open(fasta, "w") as fh:
        fh.write(">chr21\n" + chrom + "\n")

    reads, _, _ = simulate_diploid_reads(
        left, pattern, 2, 5, right, read_length=100, coverage=40,
        error_rate=0.002, seed=5)
    mapped, unmapped = [], []
    for i, (name, seq) in enumerate(reads):
        if i % 2 == 0:
            mapped.append(BamRead(name, 0, 0, vntr_start - 50 + (i % 100),
                                  60, [(0, len(seq))], seq,
                                  [38] * len(seq), "chr21"))
        else:
            unmapped.append(BamRead(name, 4, -1, -1, 0, [], seq,
                                    [38] * len(seq), None))
    mapped.sort(key=lambda r: r.reference_start)
    cram_path = str(tmp_path / "sample.cram")
    with CramWriter(cram_path, ["chr21"], [len(chrom)],
                    reference_seqs={"chr21": chrom},
                    records_per_container=500) as w:
        for r in mapped + unmapped:
            w.write(r)

    out = str(tmp_path / "out.txt")
    cli.main(["genotype", "-a", cram_path, "-m", db_file, "-r", fasta,
              "--working_directory", str(tmp_path), "--disable_logging",
              "-o", out])
    with open(out) as fh:
        assert fh.read().splitlines() == ["301645", "2/5"]
