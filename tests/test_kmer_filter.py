"""Recruitment-filter conformance: the worked example from the reference's
filtering/README.md (keyword file with loci 1,2 and five reads, min_matches
4 and 1), plus keyword-generation and long-keyword verification tests."""

import pytest

from advntr_tpu.ops.kmer_filter import RecruitmentFilter, build_keyword_table
from advntr_tpu.engine.recruitment import keywords_for_locus
from advntr_tpu.models.reference_vntr import ReferenceVNTR

KEYWORDS = {1: ["ACCC", "CACC", "CCAC", "CCCA"],
            2: ["TGGT", "TTGG", "GTTG", "GGTT"]}
READS = [
    ("one", "ACCCNNNNNNNNNNNN"),
    ("two", "ACCCACCCNNNNNNNN"),
    ("three", "ACCCACCCNNNNCCCT"),
    ("four", "ACCCACCCACCCACCC"),
    ("one_ACCC_one_TTGG", "ACCCTTGGNNNNNNNN"),
]


def run_filter(min_matches):
    filt = RecruitmentFilter(KEYWORDS, k=4, min_matches=min_matches)
    filt.process_batch([n for n, _ in READS], [s for _, s in READS])
    return filt.results()


def test_min_matches_4():
    # Occurrence counting follows the C++ code (main.cc:257-273): every
    # keyword occurrence increments the count, so "two"/"three" score 5
    # (2x ACCC + CACC + CCAC + CCCA) and pass min_matches=4.  (The README's
    # claimed output disagrees with its own FASTA; the code is the contract.)
    results, reported = run_filter(4)
    assert [n for n, _ in results[1]] == ["four", "two", "three"]
    assert results[2] == []
    assert set(reported) == {"four", "two", "three"}


def test_min_matches_1():
    results, reported = run_filter(1)
    assert [n for n, _ in results[1]] == \
        ["four", "two", "three", "one_ACCC_one_TTGG", "one"]
    assert [n for n, _ in results[2]] == ["one_ACCC_one_TTGG"]
    assert set(reported) == {"four", "two", "three", "one_ACCC_one_TTGG",
                             "one"}


def test_hit_counts():
    results, _ = run_filter(1)
    counts = dict(results[1])
    assert counts["four"] == 13   # 4x ACCC + 3x CACC + 3x CCAC + 3x CCCA
    assert counts["two"] == 5
    assert counts["one"] == 1


def test_cap_per_locus():
    filt = RecruitmentFilter({1: ["ACGT"]}, k=4, min_matches=1,
                             max_reads_per_locus=3)
    names = [f"r{i}" for i in range(10)]
    seqs = ["ACGT" * (i + 1) for i in range(10)]
    filt.process_batch(names, seqs)
    results, _ = filt.results()
    assert len(results[1]) == 3
    assert [n for n, _ in results[1]] == ["r9", "r8", "r7"]


def test_long_keywords_verified_on_host():
    # 20bp keywords: device matches the leading 15-mer, host verifies fully
    kw = "ACGTACGTACGTACGTACGT"
    near = kw[:15] + "TTTTT"  # same 15-mer prefix, different tail
    filt = RecruitmentFilter({7: [kw]}, k=15, min_matches=1)
    filt.process_batch(["full", "prefix_only"],
                       ["GG" + kw + "GG", "GG" + near + "GG"])
    results, _ = filt.results()
    assert [n for n, _ in results[7]] == ["full"]


def test_keyword_generation_semantics():
    ref = ReferenceVNTR(1, "CACAGT", 1000, "chr1")
    ref.repeat_segments = ["CACAGT"] * 3
    ref.left_flanking_region = "A" * 100
    ref.right_flanking_region = "G" * 100
    kws = keywords_for_locus(ref, short_reads=True, keyword_size=15)
    locus = "A" * 15 + "CACAGT" * 3 + "G" * 15
    expect = {locus[i:i + 15] for i in range(0, len(locus) - 15 + 1, 5)}
    assert kws == expect
    # long reads: the 80bp flank probes are sampled into stepped 15-mers
    # (the reference's raw 80-mers could never reach its own >=5-occurrence
    # gate, filtering/main.cc:17,282 — see recruitment.keywords_for_locus)
    long_kws = keywords_for_locus(ref, short_reads=False)
    # both orientations: A/G flanks plus their T/C reverse complements
    assert long_kws == {"A" * 15, "G" * 15, "T" * 15, "C" * 15}
    ref2 = ReferenceVNTR(2, "CACAGT", 1000, "chr1")
    ref2.repeat_segments = ["CACAGT"] * 3
    ref2.left_flanking_region = "AC" * 40
    ref2.right_flanking_region = "GT" * 40
    long_kws2 = keywords_for_locus(ref2, short_reads=False)
    assert all(len(k) == 15 for k in long_kws2)
    from advntr_tpu.dna import revcomp
    left80, right80 = ("AC" * 40)[-80:], ("GT" * 40)[:80]
    expect2 = set()
    for p in (left80, right80, revcomp(left80), revcomp(right80)):
        expect2 |= {p[i:i + 15] for i in range(0, 66, 2)}
    assert long_kws2 == expect2


def test_topk_path_matches_dense_counts():
    """Device-side top-M compaction (n_loci > top_m, short keywords) must
    report exactly the reads/counts the dense-counts path reports — the
    compaction changes the transfer, never the result."""
    import random
    rng = random.Random(3)
    keywords = {}
    for li in range(24):
        kws = set()
        while len(kws) < 4:
            kws.add("".join(rng.choice("ACGT") for _ in range(15)))
        keywords[li] = kws
    reads = []
    for i in range(40):
        s = "".join(rng.choice("ACGT") for _ in range(120))
        if i % 2 == 0:
            # plant 5 occurrences of one locus's keywords
            li = rng.randrange(24)
            for j, kw in enumerate(sorted(keywords[li])):
                p = 10 + j * 20
                s = s[:p] + kw + s[p + 15:]
            kw = sorted(keywords[li])[0]
            s = s[:95] + kw + s[110:]
        reads.append((f"r{i}", s))

    names = [n for n, _ in reads]
    seqs = [s for _, s in reads]

    topk = RecruitmentFilter(keywords, k=15, min_matches=5)
    assert topk.top_m < len(keywords)   # compaction path active
    topk.process_batch(names, seqs)
    res_topk, rep_topk = topk.results()

    dense = RecruitmentFilter(keywords, k=15, min_matches=5,
                              top_m=10_000)  # force dense path
    dense.process_batch(names, seqs)
    res_dense, rep_dense = dense.results()

    assert res_topk == res_dense
    assert rep_topk == rep_dense
    assert any(res_dense.values())      # the test actually recruited reads
