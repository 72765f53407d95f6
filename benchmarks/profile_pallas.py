#!/usr/bin/env python
"""Stage-by-stage timing of the Pallas fused pipeline on the real TPU.

Times, per variant, reads/s at the bench shape (B=4096, CSTB-like locus):
  score    — pallas_fused_forward, logp only materialized
  planes   — forward + force full origin-plane materialization
  path     — forward + pallas_backward (path materialized)
  fused    — read_stats_pallas (forward + backward + analytics)
"""

import sys
import time

import numpy as np


def sync(x):
    return np.asarray(x)


def timeit(fn, sync_out, iters=10):
    out = fn()
    sync_out(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        sync_out(out)
    return (time.perf_counter() - t0) / iters


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

    read_length = 150
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    graph, art, left, right, pattern = build_locus(read_length)
    reads = simulate_reads(left, pattern, right, read_length, B)
    cache = LocusModelCache()
    lm = cache._build(graph, art)
    pm_arrays = lm.pallas.flat()
    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, pad_to=read_length, multiple=32)
    batch_d = jnp.asarray(batch)
    lengths_d = jnp.asarray(lengths)

    from advntr_tpu.ops import pallas_viterbi as pv

    chunk_b = pv._chunk_for(lm.pallas.PM.shape[1])
    n_chunks = B // chunk_b
    L_pad = batch_d.shape[1]
    seqs_c = batch_d.reshape(n_chunks, chunk_b, L_pad)
    lengths_c = lengths_d.reshape(n_chunks, chunk_b)

    import functools

    @jax.jit
    def score_only(seqs_c, lengths_c):
        pm = pv.PallasStructModel(*pm_arrays)
        out = jax.vmap(lambda q, ln: pv.pallas_fused_forward(pm, q, ln)[0])(
            seqs_c, lengths_c)
        return out

    @jax.jit
    def with_planes(seqs_c, lengths_c):
        pm = pv.PallasStructModel(*pm_arrays)
        out = jax.vmap(lambda q, ln: pv.pallas_fused_forward(pm, q, ln))(
            seqs_c, lengths_c)
        return out

    @jax.jit
    def with_path(seqs_c, lengths_c):
        pm = pv.PallasStructModel(*pm_arrays)

        def one(q, ln):
            best, bstate, oM, oI, oI0, oHub = pv.pallas_fused_forward(
                pm, q, ln)
            path = pv.pallas_backward(ln, bstate, oM, oI, oI0, oHub)
            return best, path

        return jax.vmap(one)(seqs_c, lengths_c)

    def fused():
        return da.read_stats_pallas(pm_arrays, lm.meta, batch_d, lengths_d)

    t = timeit(lambda: score_only(seqs_c, lengths_c), lambda o: sync(o))
    print(f"score-only: {B / t:12.0f} reads/s  ({t*1e3:.2f} ms)", flush=True)

    t = timeit(lambda: with_planes(seqs_c, lengths_c),
               lambda o: (sync(o[0]), sync(o[2])))
    print(f"planes:     {B / t:12.0f} reads/s  ({t*1e3:.2f} ms)", flush=True)

    t = timeit(lambda: with_path(seqs_c, lengths_c),
               lambda o: (sync(o[0]), sync(o[1])))
    print(f"path:       {B / t:12.0f} reads/s  ({t*1e3:.2f} ms)", flush=True)

    t = timeit(fused, lambda o: sync(o["logp"]))
    print(f"fused:      {B / t:12.0f} reads/s  ({t*1e3:.2f} ms)", flush=True)
    print(f"# chunk_b={chunk_b} n_chunks={n_chunks} "
          f"P={lm.pallas.PM.shape[1]} nb={lm.pallas.PB.shape[1]}")


if __name__ == "__main__":
    main()
