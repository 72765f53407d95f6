"""On-TPU throughput drive for the checkpointed long-read kernel.

Builds a PacBio-scale locus model (P~2816 struct bucket, multi-kb window),
runs viterbi_struct_checkpointed at several batch sizes, verifies the
decoded paths f64-rescore to the plain struct kernel's scores on a spot
subset, and reports reads/s (round-2 baseline: 9.4 reads/s at B=4 with a
110 s compile from the host-loop version; the scan-over-segments rewrite
makes compiled size L-independent).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python drive_ckpt.py [L] [B...]
"""

import random
import sys
import time

import numpy as np
import jax.numpy as jnp


def main():
    sys.path.insert(0, "/root/repo")
    from advntr_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from advntr_tpu import dna
    from advntr_tpu.engine.finder import LocusModelCache
    from advntr_tpu.engine.simulate import mutate
    from advntr_tpu.models.compiler import compile_graph
    from advntr_tpu.models.graph import build_read_matcher
    from advntr_tpu.models.profile import profile_for_repeats
    from advntr_tpu.ops.viterbi_ckpt import viterbi_struct_checkpointed

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2432
    batches = [int(b) for b in sys.argv[2:]] or [4, 16, 32]

    rng = random.Random(5)
    pattern = "CGCGGGGCGGGGCACCCACGTACGTGCA"[:25]
    left = "".join(rng.choice("ACGT") for _ in range(500))
    right = "".join(rng.choice("ACGT") for _ in range(500))
    # the model scales WITH the read window: a read of length L spanning a
    # tract leaves ~L-600 bp of repeat, so max_copies tracks L exactly as
    # the production PacBio path sizes its max-copies HMM
    # (finder.get_dominant_copy_numbers_from_spanning_reads)
    # (L<=2432 keeps the historical copies=60 shape so the round-2/4
    # datapoints stay comparable)
    copies = 60 if L <= 2432 else (L - 700) // len(pattern)
    t0 = time.perf_counter()
    trans, emis = profile_for_repeats([pattern] * 3, 0.3)
    g = build_read_matcher(left[-300:], right[:300], trans, emis, copies,
                           0.3)
    build_g = time.perf_counter() - t0
    t0 = time.perf_counter()
    art = compile_graph(g)
    build_art = time.perf_counter() - t0
    t0 = time.perf_counter()
    cache = LocusModelCache()
    lm = cache._build(g, art)
    sdm = lm.struct_model()
    build_dev = time.perf_counter() - t0
    print(f"n_states={art.n_states} struct P={sdm.eM.shape[0]} L={L} "
          f"copies={copies} (graph {build_g:.0f}s, closure {build_art:.0f}s,"
          f" device tensors {build_dev:.0f}s, (S,S) traceback table "
          f"{sdm.log_T_struct_t.nbytes / 1e9:.2f} GB)", flush=True)

    n_hap_copies = max(40, copies - 8)
    hap = left[-300:] + pattern * n_hap_copies + right[:300]
    reads = []
    for _ in range(max(batches)):
        s = mutate(hap, 0.08, rng)
        s = (s + "".join(rng.choice("ACGT")
                         for _ in range(max(0, L - len(s)))))[:L]
        reads.append(dna.encode(s))
    batch_all, lengths_all = dna.pad_batch(reads, pad_to=L, multiple=32)

    for B in batches:
        batch = jnp.asarray(batch_all[:B])
        lengths = jnp.asarray(lengths_all[:B])
        t0 = time.perf_counter()
        best, _, path = viterbi_struct_checkpointed(
            sdm.flat(), batch, lengths, lm.suffix_last, segment=512)
        _ = np.asarray(best)
        compile_s = time.perf_counter() - t0
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            best, _, path = viterbi_struct_checkpointed(
                sdm.flat(), batch, lengths, lm.suffix_last, segment=512)
            _ = np.asarray(best)
            _ = np.asarray(path)
        dt = time.perf_counter() - t0
        print(f"B={B:4d}: {B * iters / dt:8.1f} reads/s "
              f"({dt / iters * 1e3:7.1f} ms/iter, first call "
              f"{compile_s:.1f}s)", flush=True)

    # conformance spot-check vs the plain struct kernel at a plane-safe size
    # (the plain kernel's (L, B, S) planes cap the comparable L: at 20kb
    # lattices they would need many GB of HBM — exactly why the ckpt kernel
    # exists — so compare on a truncated window of the SAME model)
    from advntr_tpu.ops.viterbi_struct import viterbi_struct_batch
    Bc = min(8, max(batches))
    S = sdm.eM.shape[0] * 2
    Lc = L
    while Lc > 2048 and Lc * Bc * S * 2 > 2 << 30:
        Lc //= 2
    if Lc != L:
        print(f"# conformance window truncated to L={Lc} "
              f"(plain-kernel planes)", flush=True)
        batch_all = batch_all[:, :Lc]
        lengths_all = np.minimum(lengths_all, Lc)
    batch = jnp.asarray(batch_all[:Bc])
    lengths = jnp.asarray(lengths_all[:Bc])
    b1, _, p1 = viterbi_struct_checkpointed(
        sdm.flat(), batch, lengths, lm.suffix_last, segment=512)
    b2, _, p2 = viterbi_struct_batch(sdm.flat(), batch, lengths,
                                     lm.suffix_last)
    db = np.max(np.abs(np.asarray(b1) - np.asarray(b2)))
    same = np.array_equal(np.asarray(p1), np.asarray(p2))
    print(f"conformance: |score diff| max {db:.3g}, paths identical: {same}")
    assert db < 1e-3 and same
    print("OK")


if __name__ == "__main__":
    main()
