"""addmodel end-to-end: reference decomposition, threshold training, DB save,
then genotyping with the trained model."""

import random

import pytest

from advntr_tpu.config import Config
from advntr_tpu.io.fasta import write_fasta
from advntr_tpu.models.db import load_unique_vntrs_data


def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


PATTERN = "GATTCGAGGCTT"  # 12bp
COPIES = 4
VNTR_START = 8000


@pytest.fixture(scope="module")
def chromosome():
    left = _rand_seq(11, VNTR_START)
    right = _rand_seq(12, 8000)
    return left + PATTERN * COPIES + right


def test_addmodel_and_genotype(tmp_path_factory, chromosome):
    tmp = tmp_path_factory.mktemp("addmodel")
    ref_fa = str(tmp / "ref.fa")
    write_fasta(ref_fa, [("chrT", chromosome)])
    db_file = str(tmp / "models.db")

    from advntr_tpu.engine.training import train_and_add_model
    vid = train_and_add_model(
        reference_file=ref_fa, chromosome="chrT", pattern=PATTERN,
        start=VNTR_START, end=VNTR_START + len(PATTERN) * COPIES,
        gene="TESTG", annotation="Coding", db_file=db_file)
    assert vid == 1

    vntrs = load_unique_vntrs_data(db_file)
    assert len(vntrs) == 1
    ref = vntrs[0]
    # reference decomposition must recover the unit copies
    assert len(ref.get_repeat_segments()) == COPIES
    assert all(seg == PATTERN for seg in ref.get_repeat_segments())
    assert len(ref.left_flanking_region) == 500
    assert ref.scaled_score != 0

    # genotype simulated diploid reads with the trained model
    from advntr_tpu.engine.finder import VNTRFinder
    from advntr_tpu.engine.simulate import simulate_diploid_reads
    finder = VNTRFinder(ref, Config())
    reads, _, _ = simulate_diploid_reads(
        ref.left_flanking_region, PATTERN, 4, 6, ref.right_flanking_region,
        read_length=100, coverage=35, error_rate=0.003, seed=13)
    result = finder.find_repeat_count([], reads, read_length=100)
    assert tuple(sorted(result.copy_numbers)) == (4, 6)
