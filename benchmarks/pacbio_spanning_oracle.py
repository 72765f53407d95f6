#!/usr/bin/env python
"""Ground-truth certification of PacBio-panel mismatch loci.

For each named locus of the synthetic PacBio panel
(pacbio_panel_bench.make_panel seed), the simulator's RNG stream is
replayed to recover every read's TRUE genomic window — information no
aligner has — and a read is counted as physically spanning an allele's
tract iff its un-mutated window fully contains both 100bp flank-anchor
probes (the reference's own spanning criterion: a flank alignment on
each side, vntr_finder.py:324-365; a read that does not contain a probe
cannot anchor it under ANY aligner).  The pipeline's batched anchorer
(ops/align.anchor_probe_batch) is then run on the same reads (CPU) and
its per-allele recruited-window counts are compared against the
physical truth.

A mismatching panel locus is CERTIFIED evidence-limited when the
pipeline recruited every physically spanning read (pipeline == truth
per allele): the genotype deviation is a property of the simulated
evidence (an allele with zero spanning reads is uncallable by the
reference or anything else), not of recruitment, anchoring, or decode.

Usage:
  python benchmarks/pacbio_spanning_oracle.py out.json VID [VID...]
      [--panel-size N] [--coverage C]
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def true_spanning_counts(ref, alleles, idx, coverage, read_len):
    """Replay simulate_pacbio_reads' RNG stream (engine/simulate.py:111-143)
    to recover each read's true window; count physical probe containment."""
    from advntr_tpu.engine.simulate import (haplotype_sequence,
                                            mutate_with_indels)
    rng = random.Random(900 + idx)
    flank = len(ref.left_flanking_region)  # 500 in the bench panel
    per_allele = {0: 0, 1: 0}
    read_is_spanning = []  # parallel to the returned (shuffled later) order
    reads = []
    for h, copies in enumerate(alleles):
        hap = haplotype_sequence(ref.left_flanking_region, ref.pattern,
                                 copies, ref.right_flanking_region)
        tract = copies * len(ref.pattern)
        span = max(len(hap), read_len)
        n_reads = max(1, int(round(span * coverage / 2 / read_len)))
        for k in range(n_reads):
            start = rng.randint(-(read_len - 1), len(hap) - 1)
            lo, hi = max(0, start), min(len(hap), start + read_len)
            window = hap[max(0, start):start + read_len]
            seq = mutate_with_indels(window, 0.01, 0.04, 0.04, rng)
            if len(seq) < 30:
                continue
            if rng.random() < 0.5:
                from advntr_tpu import dna
                seq = dna.revcomp(seq)
            # physically spanning: the window contains the left probe
            # [flank-100, flank) AND the right probe
            # [flank+tract, flank+tract+100) in full
            spanning = (lo <= flank - 100 and hi >= flank + tract + 100)
            if spanning:
                per_allele[h] += 1
            reads.append((f"hap{h}_lr{k}", seq))
            read_is_spanning.append(spanning)
    return per_allele, reads


def certify_locus(ref, alleles, idx, coverage, config):
    from collections import Counter
    from advntr_tpu.engine.finder import VNTRFinder, LocusModelCache
    tract = max(alleles) * len(ref.pattern)
    read_len = max(3000, tract + 1200)  # the bench's read geometry
    truth, reads = true_spanning_counts(ref, alleles, idx, coverage,
                                        read_len)
    finder = VNTRFinder(ref, config, model_cache=LocusModelCache())
    spanning, length_dist = \
        finder.get_spanning_reads_of_unaligned_pacbio_reads(reads)
    # attribute each recruited window to the nearer allele by tract length
    per_allele = {0: 0, 1: 0}
    for w in length_dist:
        d0 = abs(w - alleles[0] * len(ref.pattern))
        d1 = abs(w - alleles[1] * len(ref.pattern))
        per_allele[0 if d0 <= d1 else 1] += 1
    return {
        "vid": ref.id,
        "true_alleles": list(alleles),
        "pattern_len": len(ref.pattern),
        "read_len": read_len,
        "n_reads": len(reads),
        "true_spanning_per_allele": [truth[0], truth[1]],
        "pipeline_spanning_per_allele": [per_allele[0], per_allele[1]],
        "pipeline_window_lengths": sorted(length_dist),
        "recruited_all_physical": sum(per_allele.values())
        >= truth[0] + truth[1],
    }


def main():
    # host-only certification: force the CPU backend before jax initializes
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pacbio_panel_bench import make_panel
    from advntr_tpu.config import Config

    out_path = sys.argv[1]
    args = sys.argv[2:]

    def pop_flag(name, default, cast):
        if name in args:
            i = args.index(name)
            val = cast(args[i + 1])
            del args[i:i + 2]
            return val
        return default

    panel_size = pop_flag("--panel-size", 100, int)
    coverage = pop_flag("--coverage", 10.0, float)
    vids = [int(a) for a in args]

    config = Config().with_platform(pacbio=True)
    panel = make_panel(panel_size)
    by_vid = {ref.id: (ref, alleles, i)
              for i, (ref, alleles) in enumerate(panel)}
    records = []
    for vid in vids:
        ref, alleles, idx = by_vid[vid]
        rec = certify_locus(ref, alleles, idx, coverage, config)
        records.append(rec)
        print(json.dumps(rec), flush=True)
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    n_cert = sum(1 for r in records if r["recruited_all_physical"])
    print(f"# {len(records)} loci; pipeline recruited >= all physically "
          f"spanning reads at {n_cert}/{len(records)}", file=sys.stderr)


if __name__ == "__main__":
    main()
