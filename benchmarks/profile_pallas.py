#!/usr/bin/env python
"""Stage-by-stage timing of the Pallas fused pipeline on the real TPU.

Times, per variant, reads/s at the bench shape (B=4096, CSTB-like locus):
  forward  — chunked pallas_fused_forward (planes written; logp synced)
  backward — forward + pallas_backward_stats (stats synced)
  fused    — read_stats_pallas (the production dict)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python profile_pallas.py [B]
Env: ADVNTR_TPU_CHUNK_B / ADVNTR_TPU_TBLK sweep the kernel geometry.
"""

import functools
import sys
import time

import numpy as np


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
    import advntr_tpu.ops.pallas_viterbi as pv

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    read_length = 150
    graph, art, left, right, pattern = build_locus(read_length)
    reads = simulate_reads(left, pattern, right, read_length, B)
    cache = LocusModelCache()
    lm = cache._build(graph, art)
    pm = lm.pallas
    assert pm is not None

    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, pad_to=read_length, multiple=32)
    L = batch.shape[1]
    L_pad = ((L + pv.T_BLK - 1) // pv.T_BLK) * pv.T_BLK
    if L_pad != L:
        batch = np.concatenate(
            [batch, np.zeros((B, L_pad - L), batch.dtype)], axis=1)
    chunk_b = pv._chunk_for(pm.PM2.shape[1] // 2)
    nc = max(1, B // chunk_b)
    cb = B // nc
    seqs_c = jnp.asarray(batch).reshape(nc, cb, L_pad)
    lengths_c = jnp.asarray(lengths).reshape(nc, cb)
    lengths_d = jnp.asarray(lengths)
    batch_d = jnp.asarray(batch)

    @jax.jit
    def fwd_only(q, ln):
        best, bstate, oMI, oXH = pv.pallas_fused_forward(pm, q, ln)
        return best

    @jax.jit
    def fwd_bwd(q, ln, ln_flat):
        best, bstate, oMI, oXH = pv.pallas_fused_forward(pm, q, ln)
        path, stats = pv.pallas_backward_stats(
            pm, ln_flat, bstate.reshape(-1), oMI, oXH)
        return best, stats

    def fused():
        return da.read_stats_pallas(pm.flat(), lm.meta, batch_d, lengths_d)

    dt = timeit(lambda: fwd_only(seqs_c, lengths_c),
                lambda o: np.asarray(o))
    print(f"forward : {B/dt:8.0f} reads/s ({dt*1e3:7.2f} ms) "
          f"nc={nc} cb={cb} T_BLK={pv.T_BLK}", flush=True)
    if "--fwd-only" in sys.argv:
        return
    dt = timeit(lambda: fwd_bwd(seqs_c, lengths_c, lengths_d),
                lambda o: (np.asarray(o[0]), np.asarray(o[1])))
    print(f"fwd+bwd : {B/dt:8.0f} reads/s ({dt*1e3:7.2f} ms)", flush=True)
    dt = timeit(fused, lambda o: np.asarray(o["logp"]))
    print(f"fused   : {B/dt:8.0f} reads/s ({dt*1e3:7.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
