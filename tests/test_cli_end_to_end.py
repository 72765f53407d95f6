"""Full-pipeline CLI test: fabricate a model DB + BAM with simulated diploid
reads (mapped over the locus + unmapped VNTR reads), run
`advntr-tpu genotype`, check the emitted genotype in all three output
formats.  This is the quickstart-equivalent conformance path (the reference
validates 2/5 at the CSTB locus, docs/quickstart.rst)."""

import os
import random

import pytest

from advntr_tpu import cli
from advntr_tpu.engine.simulate import simulate_diploid_reads
from advntr_tpu.io.bam import BamRead, BamWriter, build_bai
from advntr_tpu.models.db import (create_vntrs_database,
                                  save_reference_vntr_to_database)
from advntr_tpu.models.reference_vntr import ReferenceVNTR

PATTERN = "CGCGGGGCGGGG"

def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))

LEFT = _rand_seq(1, 300)
RIGHT = _rand_seq(2, 300)
VNTR_START = 5000
READ_LEN = 100


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    db_file = str(tmp / "models.db")
    ref = ReferenceVNTR(301645, PATTERN, VNTR_START, "chr21", "CSTB",
                        "Promoter", 3)
    ref.repeat_segments = [PATTERN] * 3
    ref.left_flanking_region = LEFT
    ref.right_flanking_region = RIGHT
    create_vntrs_database(db_file)
    save_reference_vntr_to_database(ref, db_file)

    # reads from a 2-copy and a 5-copy haplotype
    reads, _, _ = simulate_diploid_reads(
        LEFT, PATTERN, 2, 5, RIGHT, read_length=READ_LEN, coverage=40,
        error_rate=0.002, seed=5)
    # half the reads are "mapped" over the locus, half unmapped
    bam_path = str(tmp / "sample.bam")
    mapped, unmapped = [], []
    for i, (name, seq) in enumerate(reads):
        if i % 2 == 0:
            mapped.append(BamRead(
                query_name=name, flag=0, reference_id=0,
                reference_start=VNTR_START - 50 + (i % 100), mapq=60,
                cigar=[(0, len(seq))], seq=seq, qual=[38] * len(seq)))
        else:
            unmapped.append(BamRead(
                query_name=name, flag=4, reference_id=-1, reference_start=-1,
                mapq=0, cigar=[], seq=seq, qual=[38] * len(seq)))
    mapped.sort(key=lambda r: r.reference_start)
    with BamWriter(bam_path, ["chr21"], [100000]) as w:
        for r in mapped + unmapped:
            w.write(r)
    build_bai(bam_path)
    return {"db": db_file, "bam": bam_path, "dir": str(tmp)}


def run_cli(workspace, extra, outname):
    out = os.path.join(workspace["dir"], outname)
    cli.main(["genotype", "-a", workspace["bam"], "-m", workspace["db"],
              "--working_directory", workspace["dir"], "--disable_logging",
              "-o", out] + extra)
    with open(out) as fh:
        return fh.read()


def test_text_output(workspace):
    text = run_cli(workspace, [], "out.txt")
    assert text.splitlines() == ["301645", "2/5"]


def test_bed_output(workspace):
    text = run_cli(workspace, ["-of", "bed"], "out.bed")
    lines = text.splitlines()
    assert lines[0].startswith("#CHROM")
    fields = lines[1].split("\t")
    assert fields[0] == "chr21"
    assert fields[3] == "301645"
    assert fields[7:9] == ["2", "5"]


def test_vcf_output(workspace):
    text = run_cli(workspace, ["-of", "vcf"], "out.vcf")
    lines = text.splitlines()
    assert lines[0] == "##fileformat=VCFv4.2"
    data = [l for l in lines if not l.startswith("#")]
    assert len(data) == 1
    fields = data[0].split("\t")
    assert fields[0] == "chr21"
    fmt = fields[9].split(":")
    assert fmt[0] in ("1/2", "2/1")


def test_vntr_id_selection(workspace):
    text = run_cli(workspace, ["-vid", "301645"], "out2.txt")
    assert "2/5" in text


def test_buildbank_precompiles_and_reused(workspace, tmp_path, monkeypatch):
    """`buildbank` writes the per-locus payload bank; a subsequent
    genotyping run with the same working directory must start warm (no
    in-process host model builds)."""
    wd = str(tmp_path)
    cli.main(["buildbank", "-m", workspace["db"], "--working_directory",
              wd, "-l", str(READ_LEN), "-t", "1"])
    bank = os.path.join(wd, "model_bank")
    files = os.listdir(bank)
    assert len(files) == 1 and files[0].startswith("model_301645_")

    # rerun is a no-op (all banked)
    cli.main(["buildbank", "-m", workspace["db"], "--working_directory",
              wd, "-l", str(READ_LEN), "-t", "1"])
    assert os.listdir(bank) == files

    # genotype run must consume the bank instead of building
    import advntr_tpu.engine.finder as fmod

    def boom(*a, **k):
        raise AssertionError("host model build ran despite warm bank")

    monkeypatch.setattr(fmod, "build_locus_payload", boom)
    out = os.path.join(wd, "warm.txt")
    cli.main(["genotype", "-a", workspace["bam"], "-m", workspace["db"],
              "--working_directory", wd, "--disable_logging", "-o", out])
    with open(out) as fh:
        assert fh.read().splitlines() == ["301645", "2/5"]
