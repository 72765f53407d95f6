"""CLI viewmodel/delmodel + keyword-table edge cases."""

import sqlite3

import pytest

from advntr_tpu import cli
from advntr_tpu.models.db import (create_vntrs_database,
                                  save_reference_vntr_to_database,
                                  load_unique_vntrs_data)
from advntr_tpu.models.reference_vntr import ReferenceVNTR


@pytest.fixture()
def db(tmp_path):
    db_file = str(tmp_path / "m.db")
    create_vntrs_database(db_file)
    for vid, gene, pattern in [(1, "CSTB", "CGCGGGGCGGGG"),
                               (2, "MUC1", "ACGTACGTACGTACGTACGT")]:
        ref = ReferenceVNTR(vid, pattern, 1000 * vid, "chr1", gene, "Coding")
        ref.repeat_segments = [pattern] * 3
        ref.left_flanking_region = "A" * 60
        ref.right_flanking_region = "G" * 60
        save_reference_vntr_to_database(ref, db_file)
    return db_file


def test_viewmodel_lists_and_filters(db, capsys):
    cli.main(["viewmodel", "-m", db])
    out = capsys.readouterr().out
    assert "CSTB" in out and "MUC1" in out
    cli.main(["viewmodel", "-m", db, "-g", "CSTB"])
    out = capsys.readouterr().out
    assert "CSTB" in out and "MUC1" not in out
    cli.main(["viewmodel", "-m", db, "-p", "cgcggggcgggg"])
    out = capsys.readouterr().out
    assert "CSTB" in out and "MUC1" not in out


def test_delmodel(db):
    cli.main(["delmodel", "-vid", "1", "-m", db])
    remaining = [v.id for v in load_unique_vntrs_data(db)]
    assert remaining == [2]


def test_kmer_table_shared_keywords():
    # the same k-mer assigned to two loci must count for both
    from advntr_tpu.ops.kmer_filter import RecruitmentFilter
    filt = RecruitmentFilter({7: ["ACGTA"], 9: ["ACGTA", "TTTTT"]},
                             k=5, min_matches=1)
    assert filt.table.max_dup == 2
    filt.process_batch(["r1"], ["GGACGTAGG"])
    results, _ = filt.results()
    assert [n for n, _ in results[7]] == ["r1"]
    assert [n for n, _ in results[9]] == ["r1"]
