#!/usr/bin/env python
"""End-to-end TPU drive for the Pallas fused kernel (verify recipe).

Production-shape CSTB locus (n_states=927, struct P 456->512, L=150):
1. run the fused pallas pipeline on the real chip (B reads)
2. conformance: decoded paths rescore in f64 to the full-graph optimum
   (viterbi_numpy oracle) on a host-checkable subset
3. analytics parity vs the struct kernel (CPU-jit on the same subset)
4. timing: 10 iterations, np.asarray sync

Usage: PYTHONPATH=/root/repo:/root/.axon_site python drive_verify.py [B]
"""

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
    from advntr_tpu.ops.viterbi import viterbi_numpy

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_check = 48
    read_length = 150
    graph, art, left, right, pattern = build_locus(read_length)
    reads = simulate_reads(left, pattern, right, read_length, B)
    cache = LocusModelCache()
    lm = cache._build(graph, art)
    assert lm.pallas is not None, "pallas model not built (TPU backend?)"

    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, pad_to=read_length, multiple=32)
    batch_d, lengths_d = jnp.asarray(batch), jnp.asarray(lengths)

    def run(return_path=False):
        return da.read_stats_pallas(lm.pallas.flat(), lm.meta, batch_d,
                                    lengths_d, return_path=return_path)

    out = run(return_path=True)
    logp = np.asarray(out["logp"])
    path = np.asarray(out["path"])
    print(f"device={jax.devices()[0].platform} B={B} "
          f"n_states={art.n_states}", flush=True)

    # ---- conformance: f64 rescoring vs the float64 oracle ----
    def rescore(path_b, codes):
        s = float(art.log_start[path_b[0]] + art.log_E[path_b[0], codes[0]])
        for t in range(1, len(codes)):
            s += art.log_T[path_b[t - 1], path_b[t]] \
                + art.log_E[path_b[t], codes[t]]
        return s + float(art.log_end[path_b[-1]])

    bad = 0
    for b in range(n_check):
        codes = rows[b]
        opt, _ = viterbi_numpy(art, np.asarray(codes))
        s = rescore(path[b][: len(codes)], codes)
        if not (abs(s - opt) <= 1e-2 + 1e-4 * abs(opt)
                and abs(logp[b] - opt) <= 1e-2 + 1e-4 * abs(opt)):
            bad += 1
            print(f"  MISMATCH read {b}: oracle={opt:.4f} "
                  f"rescore={s:.4f} device={logp[b]:.4f}")
    print(f"conformance: {n_check - bad}/{n_check} paths rescore to the "
          f"f64 optimum", flush=True)

    # ---- analytics parity vs struct kernel (CPU) on the subset ----
    from advntr_tpu.ops.viterbi_struct import StructDeviceModel
    from advntr_tpu.models.struct_compiler import build_structured, \
        pad_structured
    from advntr_tpu.engine.finder import _round_up
    sm = build_structured(graph, art)
    sm = pad_structured(sm, art, _round_up(sm.P + 1, 128),
                        _round_up(sm.C, 8))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        dev = StructDeviceModel.from_struct(sm, art)
        meta_cpu = tuple(jax.device_put(np.asarray(m), cpu) for m in lm.meta)
        sub = jax.device_put(np.asarray(batch[:n_check]), cpu)
        sublen = jax.device_put(np.asarray(lengths[:n_check]), cpu)
        ref = da.read_stats_struct(dev.flat(), meta_cpu, sub, sublen,
                                   sm.suffix_last)
        ref = {k: np.asarray(v) for k, v in ref.items()}
    mismatch = []
    for k in ("repeats", "n_matches", "repeat_bp", "left_flank_bp",
              "right_flank_bp", "left_flank_matches",
              "right_flank_matches"):
        if not np.array_equal(ref[k], np.asarray(out[k])[:n_check]):
            mismatch.append(k)
    np.testing.assert_allclose(ref["logp"], logp[:n_check], rtol=1e-4,
                               atol=1e-2)
    print(f"analytics parity vs struct(CPU): "
          f"{'OK' if not mismatch else 'MISMATCH ' + str(mismatch)}",
          flush=True)

    # ---- sharded dispatch through shard_map on REAL hardware (1x1 mesh) --
    # proves the Mosaic-lowered pallas kernel runs through the exact
    # production sharded code path (parallel/mesh.py) on-chip; multi-chip
    # runs the same code with a bigger mesh
    from advntr_tpu.parallel.mesh import make_mesh, sharded_grouped_read_stats
    mesh = make_mesh(n_loci=1, n_reads=1,
                     devices=jax.devices()[:1])
    stacked = tuple(jnp.stack([x]) for x in lm.pallas.flat())
    stacked_meta = tuple(jnp.stack([x]) for x in lm.meta)
    sh = sharded_grouped_read_stats(
        mesh, stacked, stacked_meta, np.asarray(batch)[None],
        np.asarray(lengths)[None], kernel="pallas")
    sh_mis = [k for k in ("repeats", "n_matches", "repeat_bp")
              if not np.array_equal(np.asarray(sh[k])[0],
                                    np.asarray(out[k]))]
    np.testing.assert_allclose(np.asarray(sh["logp"])[0], logp,
                               rtol=1e-4, atol=1e-2)
    print(f"sharded(1x1 mesh, shard_map, Mosaic): "
          f"{'OK' if not sh_mis else 'MISMATCH ' + str(sh_mis)}",
          flush=True)

    # ---- timing ----
    _ = np.asarray(run()["logp"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = np.asarray(run()["logp"])
    dt = (time.perf_counter() - t0) / iters
    print(f"fused: {B / dt:.0f} reads/s ({dt*1e3:.2f} ms)  "
          f"[target >100x of 650 cpu = 65000]", flush=True)
    assert bad == 0 and not mismatch and not sh_mis, "DRIVE FAILED"
    print("DRIVE OK")


if __name__ == "__main__":
    main()
