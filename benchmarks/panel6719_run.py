#!/usr/bin/env python
"""North-star 6,719-locus panel run against prebuilt inputs.

Expects a workdir prepared by benchmarks/panel_bench.make_panel(6719) +
build_inputs (panel.db, panel.bam, expected.json) and, optionally, a
prebuilt model bank from `advntr-tpu buildbank` in <workdir>/model_bank.
Runs the full pipeline twice (cold-with-bank, then warm), printing
loci/hour + accuracy and the mismatching loci.

Usage: python benchmarks/panel6719_run.py <workdir> [--once]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir = sys.argv[1]
    once = "--once" in sys.argv
    from advntr_tpu.config import Config
    from advntr_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from benchmarks.panel_bench import run_pipeline

    db_file = os.path.join(workdir, "panel.db")
    bam_file = os.path.join(workdir, "panel.bam")
    with open(os.path.join(workdir, "expected.json")) as fh:
        expected = json.load(fh)

    def accuracy(genotypes, tag):
        mism = [(vid, want, genotypes.get(vid))
                for vid, want in expected.items()
                if genotypes.get(vid) != want]
        for vid, want, got in mism:
            print(f"# {tag} locus {vid}: expected {want} got {got}",
                  file=sys.stderr)
        with open(os.path.join(workdir, f"mismatches_{tag}.json"), "w") as fh:
            json.dump(mism, fh)
        return 1 - len(mism) / len(expected)

    def clear_result_checkpoint():
        for name in os.listdir(workdir):
            if name.startswith("results_checkpoint_"):
                os.remove(os.path.join(workdir, name))

    results = {"n_loci": len(expected)}
    clear_result_checkpoint()
    t0 = time.perf_counter()
    genotypes = run_pipeline(db_file, bam_file, workdir, Config())
    results["cold_s"] = round(time.perf_counter() - t0, 1)
    results["accuracy"] = accuracy(genotypes, "cold")
    print(json.dumps(results), flush=True)

    if not once:
        clear_result_checkpoint()
        t0 = time.perf_counter()
        genotypes2 = run_pipeline(db_file, bam_file, workdir, Config())
        results["warm_s"] = round(time.perf_counter() - t0, 1)
        results["accuracy_warm"] = accuracy(genotypes2, "warm")
        results["loci_per_hour_warm"] = round(
            len(expected) / results["warm_s"] * 3600, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
