#!/usr/bin/env python
"""Benchmark: Viterbi read-decodes/sec/chip on the flagship genotyping kernel.

Compares the fused device pipeline (structured O(n)-per-symbol Viterbi +
traceback + per-read analytics) against the reference-style CPU engine
(native C++ sparse-graph Viterbi with silent states — the same recurrence
as the reference's Cython kernel) on a CSTB-like locus at Illumina read
length.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import random
import sys
import time

import numpy as np


def build_locus(read_length=150):
    from advntr_tpu.models.compiler import compile_graph
    from advntr_tpu.models.graph import build_read_matcher
    from advntr_tpu.models.profile import profile_for_repeats

    pattern = "CGCGGGGCGGGG"  # CSTB dodecamer
    rng = random.Random(42)
    left = "".join(rng.choice("ACGT") for _ in range(read_length))
    right = "".join(rng.choice("ACGT") for _ in range(read_length))
    copies = int(round(read_length / len(pattern) + 0.5))
    trans, emis = profile_for_repeats([pattern] * 3, 0.05)
    graph = build_read_matcher(left, right, trans, emis, copies, 0.05)
    art = compile_graph(graph)
    return graph, art, left, right, pattern


def simulate_reads(left, pattern, right, read_length, n_reads, seed=9):
    from advntr_tpu.engine.simulate import haplotype_sequence, mutate
    rng = random.Random(seed)
    reads = []
    for _ in range(n_reads):
        copies = rng.choice([2, 5])
        hap = haplotype_sequence(left, pattern, copies, right)
        start = rng.randint(0, len(hap) - read_length)
        reads.append(mutate(hap[start:start + read_length], 0.003, rng))
    return reads


def main():
    from advntr_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    read_length = 150
    B = 4096
    graph, art, left, right, pattern = build_locus(read_length)
    reads = simulate_reads(left, pattern, right, read_length, B)

    import jax
    import jax.numpy as jnp
    from advntr_tpu import dna
    from advntr_tpu.engine import device_analytics as da
    from advntr_tpu.engine.finder import LocusModelCache
    from advntr_tpu.models.struct_compiler import build_structured

    cache = LocusModelCache()
    lm = cache._build(graph, art)

    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, pad_to=read_length, multiple=32)
    batch_d = jnp.asarray(batch)
    lengths_d = jnp.asarray(lengths)

    if lm.pallas is not None:   # production kernel on TPU backends
        def run():
            return da.read_stats_pallas(lm.pallas.flat(), lm.meta, batch_d,
                                        lengths_d)
    else:
        def run():
            return da.read_stats_struct(lm.struct.flat(), lm.meta, batch_d,
                                        lengths_d, lm.suffix_last)

    # warmup/compile; a host transfer is the sync point (on the axon tunnel
    # block_until_ready alone does not actually wait)
    out = run()
    _ = np.asarray(out["logp"])

    # timing: dispatch every iteration asynchronously and sync ONCE on the
    # last output — the device executes queued programs back-to-back in
    # order, so this measures chip throughput without paying a tunnel
    # round-trip per iteration (the production analyzer queues chunks the
    # same way).  A per-iteration-sync pass is reported as a diagnostic.
    iters = 10
    t0 = time.perf_counter()
    outs = [run() for _ in range(iters)]
    _ = np.asarray(outs[-1]["logp"])
    t1 = time.perf_counter()
    device_rate = B * iters / (t1 - t0)
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = np.asarray(run()["logp"])
    synced_rate = B * iters / (time.perf_counter() - t0)

    # CPU baseline: reference-style sparse Viterbi (C++), single core;
    # median of three trials to damp scheduler noise on the shared host
    from advntr_tpu.native_bridge import SparseViterbiModel
    cpu_model = SparseViterbiModel(graph)
    n_cpu = 24
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for r in rows[:n_cpu]:
            cpu_model.viterbi(r)
        rates.append(n_cpu / (time.perf_counter() - t0))
    cpu_rate = sorted(rates)[1]

    # The in-run baseline underreads when this shared 2-core host is busy;
    # 632 reads/s is the isolated single-core rate measured for EXACTLY this
    # configuration (n_states=927, B=4096, L=150): median of 12 trials over
    # two isolated sessions, stdev <6 reads/s (PERF_NOTES round-5;
    # benchmarks/cpu_baseline_calibration.py).  Apply it only when the
    # config matches the calibration — any other geometry falls back to the
    # honest in-run measurement.
    ISOLATED_CPU_RATE = 632.0
    calibrated = (art.n_states == 927 and B == 4096 and read_length == 150)
    baseline = max(cpu_rate, ISOLATED_CPU_RATE) if calibrated else cpu_rate
    result = {
        "metric": "viterbi_read_decodes_per_sec_per_chip",
        "value": round(device_rate, 2),
        "unit": "reads/s",
        "vs_baseline": round(device_rate / baseline, 2),
        "vs_inrun_baseline": round(device_rate / cpu_rate, 2),
    }
    print(json.dumps(result))
    print(f"# device: {jax.devices()[0].platform} "
          f"n_states={art.n_states} B={B} L={read_length} "
          f"cpu_baseline={cpu_rate:.1f} reads/s in-run, "
          f"{ISOLATED_CPU_RATE:.0f} reads/s isolated (calibrated); "
          f"per-iter-synced {synced_rate:.0f} reads/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
