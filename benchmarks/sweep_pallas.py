#!/usr/bin/env python
"""Sweep CHUNK_B x T_BLK for the fused Pallas pipeline on the real TPU."""

import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    from advntr_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from bench import build_locus, simulate_reads
    from advntr_tpu import dna
    from advntr_tpu.engine import device_analytics as da
    from advntr_tpu.engine.finder import LocusModelCache
    from advntr_tpu.ops import pallas_viterbi as pv

    B = 4096
    read_length = 150
    graph, art, *_ = build_locus(read_length)
    reads = simulate_reads(*build_locus(read_length)[2:5], read_length, B)
    cache = LocusModelCache()
    lm = cache._build(graph, art)
    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, pad_to=read_length, multiple=32)
    batch_d, lengths_d = jnp.asarray(batch), jnp.asarray(lengths)

    variants = [(1024, 8), (2048, 8), (1024, 16), (512, 16)]
    if len(sys.argv) > 1:
        variants = [tuple(int(x) for x in v.split("x"))
                    for v in sys.argv[1].split(",")]
    for chunk_b, t_blk in variants:
        pv.CHUNK_B = chunk_b
        pv.T_BLK = t_blk
        jax.clear_caches()
        try:
            def run():
                return da.read_stats_pallas(lm.pallas.flat(), lm.meta,
                                            batch_d, lengths_d)
            t_c0 = time.perf_counter()
            _ = np.asarray(run()["logp"])
            compile_s = time.perf_counter() - t_c0
            # primary: async-queued (device pipelines iterations, one
            # final sync — the production dispatch shape and the bench.py
            # timing convention since round 4); per-iter-synced kept as a
            # tunnel-RTT diagnostic
            iters = 10
            t0 = time.perf_counter()
            outs = [run() for _ in range(iters)]
            _ = np.asarray(outs[-1]["logp"])
            dt = (time.perf_counter() - t0) / iters
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = np.asarray(run()["logp"])
            dt_sync = (time.perf_counter() - t0) / iters
            print(f"CHUNK_B={chunk_b} T_BLK={t_blk}: {B/dt:8.0f} reads/s "
                  f"async ({dt*1e3:.2f} ms; synced {B/dt_sync:.0f}; "
                  f"compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"CHUNK_B={chunk_b} T_BLK={t_blk}: FAILED {type(e).__name__}"
                  f" {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
