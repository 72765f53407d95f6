#!/usr/bin/env python
"""Pipeline-independent oracle certification of panel mismatch loci.

For each named locus of the synthetic panel (panel_bench.make_panel seed),
every simulated read is re-decoded by the NATIVE C++ full-silent-graph
Viterbi engine (native/viterbi_sparse.cc — the reference recurrence,
pomegranate hmm.pyx:1970-2130, float64, no compiled-artifact elimination,
no device kernels), its state-name path is parsed by the fixture-locked
host analytics (engine/analytics.py — the reference's hmm_utils.py:155-286
semantics), the reference's recruit/spanning gates are applied on host
scalars, and the genotype comes from the unit-vector-locked diploid ML
model.  The resulting per-locus spanning histograms, ML margins, and
genotype calls are written as a JSON fixture.

If this independent path reproduces the pipeline's call at a mismatching
locus, the mismatch is CERTIFIED evidence-identical: the reference
pipeline, fed the same reads, makes the same call — the disagreement with
simulation truth is an evidence property (under-sampled long allele /
flank-pattern homology), not a kernel or engine defect.

Usage:
  python benchmarks/mismatch_oracle.py out.json VID [VID...]
  python benchmarks/mismatch_oracle.py out.json --from-file mismatches.txt
  python benchmarks/mismatch_oracle.py out.json --from-json mismatches.json
Optional flags:
  --no-guard        certify with the homology spanning guard disabled
                    (strict reference-default gates)
  --panel-size N    panel generator size (default 6719; genome-scale runs
                    use the same seed-1234 generator at larger N, so the
                    locus at a given vid is identical across sizes)
  --coverage C      simulated coverage (default 30; the genome-scale slice
                    runs at 15 — the oracle must decode the same reads)
  --sample K        certify only a K-locus random sample of the input list
                    (seeded; for the large evidence-thinness class)
  --sample-seed S   sample seed (default 7)
With --from-json (a [[vid, expected, pipeline_call], ...] list as written
by panel_bench/genome_scale_bench), each record also carries
`pipeline_genotype`, making oracle==pipeline checkable from the fixture
alone.
"""

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def certify_locus(ref, alleles, idx, config, read_len=150, coverage=30.0):
    import numpy as np
    from advntr_tpu import dna
    from advntr_tpu.engine import analytics as an
    from advntr_tpu.engine.genotype import find_genotype
    from advntr_tpu.engine.finder import VNTRFinder, LocusModelCache
    from advntr_tpu.engine.simulate import simulate_diploid_reads
    from advntr_tpu.models.graph import build_read_matcher
    from advntr_tpu.models.profile import profile_for_repeats
    from advntr_tpu.native_bridge import SparseViterbiModel

    reads, _, _ = simulate_diploid_reads(
        ref.left_flanking_region, ref.pattern, alleles[0], alleles[1],
        ref.right_flanking_region, read_length=read_len, coverage=coverage,
        error_rate=0.003, seed=100 + idx)

    finder = VNTRFinder(ref, config, model_cache=LocusModelCache())
    copies = finder.get_copies_for_hmm(read_len)
    trans, emis = profile_for_repeats(list(ref.get_repeat_segments()),
                                      config.max_error_rate)
    g = build_read_matcher(ref.left_flanking_region[-read_len:],
                           ref.right_flanking_region[:read_len],
                           trans, emis, copies, config.max_error_rate)
    engine = SparseViterbiModel(g)
    min_score = finder.recruitment_score_threshold(read_len)

    covered, flanking = [], []
    n_selected = 0
    for name, seq in reads:
        best = (float("-inf"), None, None)
        for s in (seq, dna.revcomp(seq)):
            logp, names = engine.viterbi(dna.encode(s))
            if names is not None and logp > best[0]:
                best = (logp, names, s)
        logp, names, s = best
        if names is None:
            continue
        visited = [n for n in names[1:-1]]
        rate = an.flanking_matching_rate(
            visited, s, ref.left_flanking_region[-read_len:],
            ref.right_flanking_region[:read_len])
        n_matches = an.count_matches(visited)
        # recruit gate (reference vntr_finder.py:179-190)
        if rate < 0.90:
            continue
        if min_score is not None:
            if logp <= min_score:
                continue
        elif not (n_matches >= 0.9 * len(s) and logp > -len(s)):
            continue
        repeats = an.count_repeats(visited)
        repeat_bp = an.count_repeat_bp_matches(visited)
        if repeat_bp <= finder.min_repeat_bp_to_add_read:
            continue
        n_selected += 1
        lbp = an.left_flank_size(visited)
        rbp = an.right_flank_size(visited)
        spanning = (rate >= 0.95
                    and lbp > finder.minimum_left_flanking_size
                    and rbp > finder.minimum_right_flanking_size)
        (covered if spanning else flanking).append(repeats)

    flanking = sorted(flanking)
    min_valid = max(covered) if covered else 0
    max_flank = [r for r in flanking if flanking and r == max(flanking)
                 and r >= min_valid]
    if len(max_flank) < 5:
        max_flank = []
    genotype, prob = find_genotype(covered + max_flank, False,
                                   config.genotype_error_rate)
    # posterior margin: mass on every non-winning call
    alt_prob = max(0.0, 1.0 - prob) if genotype is not None else 1.0
    return {
        "vid": ref.id,
        "true_alleles": list(alleles),
        "oracle_genotype": sorted(genotype) if genotype else None,
        "spanning_hist": dict(Counter(covered)),
        "flanking_hist": dict(Counter(flanking)),
        "n_selected": n_selected,
        "ml_prob": prob,
        "runner_up_prob": alt_prob,
        "min_flank_sizes": [finder.minimum_left_flanking_size,
                            finder.minimum_right_flanking_size],
    }


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from panel_bench import make_panel
    from advntr_tpu.config import Config
    import dataclasses

    out_path = sys.argv[1]
    args = sys.argv[2:]
    config = Config()

    def pop_flag(name, default=None, cast=str):
        if name in args:
            i = args.index(name)
            val = cast(args[i + 1])
            del args[i:i + 2]
            return val
        return default

    if "--no-guard" in args:
        args.remove("--no-guard")
        config = dataclasses.replace(config, spanning_homology_guard=False)
    panel_size = pop_flag("--panel-size", 6719, int)
    coverage = pop_flag("--coverage", 30.0, float)
    sample_k = pop_flag("--sample", None, int)
    sample_seed = pop_flag("--sample-seed", 7, int)

    pipeline_calls = {}
    if args and args[0] == "--from-file":
        with open(args[1]) as fh:
            vids = [int(l.split()[0]) for l in fh if l.strip()]
    elif args and args[0] == "--from-json":
        with open(args[1]) as fh:
            triples = json.load(fh)
        vids = [int(v) for v, _, _ in triples]
        pipeline_calls = {int(v): call for v, _, call in triples}
    else:
        vids = [int(a) for a in args]
    if sample_k is not None:
        # no-calls are always certified in full; the sample draws from the
        # (large) called-mismatch class
        import random
        nocalls = [v for v in vids
                   if pipeline_calls.get(v) in (None, "None")]
        rest = [v for v in vids if pipeline_calls.get(v)
                not in (None, "None")]
        if sample_k < len(rest):
            rest = random.Random(sample_seed).sample(rest, sample_k)
        vids = sorted(set(nocalls) | set(rest))

    panel = make_panel(panel_size)
    by_vid = {ref.id: (ref, alleles, i)
              for i, (ref, alleles) in enumerate(panel)}
    records = []
    for vid in vids:
        ref, alleles, idx = by_vid[vid]
        rec = certify_locus(ref, alleles, idx, config, coverage=coverage)
        rec["oracle_matches_truth"] = (rec["oracle_genotype"]
                                       == sorted(alleles))
        if vid in pipeline_calls:
            call = pipeline_calls[vid]
            rec["pipeline_genotype"] = (
                None if call in (None, "None")
                else sorted(int(x) for x in call.split("/")))
        records.append(rec)
        print(json.dumps(rec), flush=True)
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    n_match = sum(1 for r in records if r["oracle_matches_truth"])
    msg = (f"# {len(records)} loci certified; oracle==truth at {n_match}, "
           f"oracle!=truth (evidence-limited, reference-identical) at "
           f"{len(records) - n_match}")
    if pipeline_calls:
        n_agree = sum(1 for r in records
                      if r.get("pipeline_genotype") == r["oracle_genotype"])
        msg += f"; oracle==pipeline at {n_agree}/{len(records)}"
    print(msg, file=sys.stderr)


if __name__ == "__main__":
    main()
