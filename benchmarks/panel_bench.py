#!/usr/bin/env python
"""Panel-scale benchmark: loci genotyped per hour through the full pipeline.

Builds a synthetic multi-locus panel (varied motif lengths and copy
numbers), simulates a diploid read pool per locus, and runs the complete
per-locus flow — model compilation (with the prefetch pool), batched device
scoring, genotyping — measuring end-to-end loci/hour and aggregate read
decode rate.  Correctness is asserted on every locus.

Usage: python benchmarks/panel_bench.py [n_loci] [coverage]
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_panel(n_loci: int):
    from advntr_tpu.models.reference_vntr import ReferenceVNTR
    rng = random.Random(1234)
    panel = []
    for i in range(n_loci):
        # Illumina-panel-sized loci: total VNTR length must fit inside one
        # read with flanks on both sides (the reference's Illumina panel is
        # restricted to loci < 140bp, advntr_commands.py:38)
        plen = rng.choice([8, 10, 12, 15, 20, 24])
        max_copies = max(2, 120 // plen)
        pattern = "".join(rng.choice("ACGT") for _ in range(plen))
        left = "".join(rng.choice("ACGT") for _ in range(200))
        right = "".join(rng.choice("ACGT") for _ in range(200))
        ref_copies = rng.randint(2, max_copies)
        ref = ReferenceVNTR(1000 + i, pattern, 10_000 * (i + 1), "chr1")
        ref.repeat_segments = [pattern] * ref_copies
        ref.left_flanking_region = left
        ref.right_flanking_region = right
        ref.estimated_repeats = ref_copies
        alleles = tuple(sorted((rng.randint(2, max_copies),
                                rng.randint(2, max_copies))))
        panel.append((ref, alleles))
    return panel


def main():
    n_loci = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    coverage = float(sys.argv[2]) if len(sys.argv) > 2 else 30

    from advntr_tpu.config import Config
    from advntr_tpu.engine.finder import VNTRFinder, LocusModelCache
    from advntr_tpu.engine.simulate import simulate_diploid_reads

    config = Config()
    panel = make_panel(n_loci)
    read_length = 150

    # pre-simulate all read pools (host data prep excluded from timing)
    pools = []
    for i, (ref, alleles) in enumerate(panel):
        reads, _, _ = simulate_diploid_reads(
            ref.left_flanking_region, ref.pattern, alleles[0], alleles[1],
            ref.right_flanking_region, read_length=read_length,
            coverage=coverage, error_rate=0.003, seed=100 + i)
        pools.append(reads)

    cache = LocusModelCache(workers=1)
    finders = [VNTRFinder(ref, config, model_cache=cache)
               for ref, _ in panel]

    def run_panel():
        correct = 0
        total_reads = 0
        t0 = time.perf_counter()
        for finder, (ref, alleles) in zip(finders, panel):
            cache.schedule(ref, finder.get_copies_for_hmm(read_length),
                           read_length, config.max_error_rate)
        for finder, (ref, alleles), reads in zip(finders, panel, pools):
            result = finder.find_repeat_count([], reads,
                                              read_length=read_length)
            total_reads += 2 * len(reads)  # both orientations scored
            got = tuple(sorted(result.copy_numbers)) if result.copy_numbers \
                else None
            if got == alleles:
                correct += 1
            else:
                print(f"# locus {ref.id}: expected {alleles} got {got}",
                      file=sys.stderr)
        return time.perf_counter() - t0, correct, total_reads

    cold_s, correct, total_reads = run_panel()
    warm_s, correct2, _ = run_panel()  # models + executables warm

    print(json.dumps({
        "metric": "panel_loci_genotyped_per_hour",
        "value": round(n_loci / warm_s * 3600, 1),
        "unit": "loci/hour",
        "n_loci": n_loci,
        "accuracy": correct / n_loci,
        "accuracy_warm": correct2 / n_loci,
        "cold_s": round(cold_s, 2),
        "warm_s": round(warm_s, 2),
        "reads_scored_per_sec_warm": round(total_reads / warm_s, 1),
    }))


if __name__ == "__main__":
    main()
