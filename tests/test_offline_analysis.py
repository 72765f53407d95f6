"""Offline-analysis modules: pattern clustering, homology, annotation,
reference editor."""

import numpy as np
import pytest


def test_pattern_clusters_two_groups():
    from advntr_tpu.models.pattern_clustering import get_pattern_clusters
    patterns = ["ACGTACGT", "ACGTACGA", "TTTTGGGG", "TTTTGGGC"]
    clusters = get_pattern_clusters(patterns)
    as_sets = sorted([sorted(c) for c in clusters])
    assert ["ACGTACGA", "ACGTACGT"] in as_sets
    assert ["TTTTGGGC", "TTTTGGGG"] in as_sets


def test_homologous_vntrs():
    from advntr_tpu.models.homology import is_homologous_vntr, vntr_graph
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    def make(vid, pattern, left, right):
        r = ReferenceVNTR(vid, pattern, 0, "chr1")
        r.left_flanking_region = left
        r.right_flanking_region = right
        r.repeat_segments = [pattern]
        return r

    a = make(1, "CAGCAGCAG", "A" * 30, "G" * 30)
    b = make(2, "CAGCAGCAG", "A" * 30, "G" * 30)   # identical -> homologous
    c = make(3, "TTGGCCTTAA", "CGTA" * 8, "TACG" * 8)
    assert is_homologous_vntr(a, b)
    assert not is_homologous_vntr(a, c)
    nodes, edges = vntr_graph([a, b, c])
    assert nodes == [1, 2, 3]
    assert edges == [(1, 2)]


def test_annotation_precedence(tmp_path):
    from advntr_tpu.models.annotation import (
        AnnotationAssigner, read_bed_track, read_name_mapping)
    bed = tmp_path / "exons.bed"
    bed.write_text("chr1\t100\t200\tNM_0001.2\t0\t+\n")
    genes = tmp_path / "genes.bed"
    genes.write_text("chr1\t100\t5000\tNM_0001.2\t0\t+\n"
                     "chr1\t9000\t9500\tNM_0002.1\t0\t-\n")
    introns = tmp_path / "introns.bed"
    introns.write_text("chr1\t200\t1000\tNM_0001.2\t0\t+\n")
    empty = tmp_path / "empty.bed"
    empty.write_text("")
    mapping_file = tmp_path / "refseq2gene.txt"
    mapping_file.write_text("NM_0001 GENE1\nNM_0002 GENE2\n")

    assigner = AnnotationAssigner(
        genes=read_bed_track(str(genes)), exons=read_bed_track(str(bed)),
        introns=read_bed_track(str(introns)),
        utr3=read_bed_track(str(empty)), utr5=read_bed_track(str(empty)),
        name_mapping=read_name_mapping(str(mapping_file)))
    assert assigner.annotate("chr1", 150, 160) == ("GENE1", "Coding")
    assert assigner.annotate("chr1", 300, 350) == ("GENE1", "Intron")
    # promoter of the minus-strand gene lies downstream of its end
    assert assigner.annotate("chr1", 9600, 9650) == ("GENE2", "Promoter")
    assert assigner.annotate("chr1", 20000, 20100) == ("None", "None")
    assert assigner.is_close_to_gene("chr1", 5500, 5600)


def test_reference_editor():
    from advntr_tpu.engine.reference_editor import (
        reference_with_indel, reference_with_repeat_count)
    from advntr_tpu.models.reference_vntr import ReferenceVNTR
    chrom = "A" * 2000 + "CAGCAGCAG" + "G" * 2000
    ref = ReferenceVNTR(1, "CAG", 2000, "chr1")
    ref.repeat_segments = ["CAG"] * 3
    edited = reference_with_indel(ref, chrom, 4, insertion=True,
                                  inserted_bp="T", flank=10)
    assert edited == "A" * 10 + "CAGCTAGCAG" + "G" * 10
    expanded = reference_with_repeat_count(ref, chrom, 5, flank=10)
    assert expanded == "A" * 10 + "CAG" * 5 + "G" * 10
