"""On-TPU drive for the posterior kernels (ops/posterior.py).

Builds a CSTB-like locus at Illumina read length, runs the fused
posterior-indel kernel on the real chip, cross-checks:
- backward loglik == forward loglik (internal alpha/beta identity)
- kernel loglik == viterbi.forward_batch on the same sum-closed tensors
- indel reads carry more posterior indel mass than clean reads
then times the kernel.  Also drives find_frameshift end-to-end with the
posterior report on.
"""

import random
import sys
import time

import numpy as np
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.config import Config
from advntr_tpu.engine.finder import VNTRFinder
from advntr_tpu.engine.simulate import mutate
from advntr_tpu.models.reference_vntr import ReferenceVNTR
from advntr_tpu.ops.posterior import posterior_indel_batch
from advntr_tpu.ops.viterbi import forward_batch


def main():
    rng = random.Random(11)
    pattern = "CGCGGGGCGGGG"
    left = "".join(rng.choice("ACGT") for _ in range(200))
    right = "".join(rng.choice("ACGT") for _ in range(200))
    copies = 9
    ref = ReferenceVNTR(25561, pattern, 3000, "chr1")
    ref.repeat_segments = [pattern] * copies
    ref.left_flanking_region = left
    ref.right_flanking_region = right
    ref.estimated_repeats = copies

    read_length = 150
    finder = VNTRFinder(ref, Config())
    tensors = finder._sum_closure_tensors(read_length)
    print("n_states:", tensors[0].shape[0], flush=True)

    # half clean reads, half with a 1bp repeat deletion
    vntr = pattern * copies
    vntr_del = pattern * 4 + pattern[:5] + pattern[6:] + pattern * 4
    reads, is_del = [], []
    for k in range(128):
        deleted = k % 2 == 1
        hap = left + (vntr_del if deleted else vntr) + right
        lo = max(0, len(left) - read_length + 20)
        hi = min(len(hap) - read_length, len(left) + len(vntr) - 20)
        start = rng.randint(lo, hi)
        reads.append(mutate(hap[start:start + read_length], 0.003, rng))
        is_del.append(deleted)
    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, multiple=32)
    batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)

    out = posterior_indel_batch(*tensors, batch, lengths)
    loglik = np.asarray(out["loglik"], dtype=np.float64)
    loglik_b = np.asarray(out["loglik_backward"], dtype=np.float64)
    occ = np.asarray(out["ins_occupancy"], dtype=np.float64)
    dm = np.asarray(out["del_mass"], dtype=np.float64)

    fb = np.asarray(forward_batch(tensors[0], tensors[1], tensors[2],
                                  tensors[3], batch, lengths),
                    dtype=np.float64)
    err_ab = np.max(np.abs(loglik - loglik_b))
    err_f = np.max(np.abs(loglik - fb))
    is_del = np.array(is_del)
    print(f"max |fwd-bwd| loglik err: {err_ab:.4g}")
    print(f"max |posterior-forward_batch| loglik err: {err_f:.4g}")
    print(f"del-read delete mass: {dm[is_del].mean():.3f}  "
          f"clean: {dm[~is_del].mean():.3f}")
    print(f"del-read insert occ:  {occ[is_del].mean():.3f}  "
          f"clean: {occ[~is_del].mean():.3f}")
    assert err_ab < 0.02 and err_f < 0.02
    assert dm[is_del].mean() > dm[~is_del].mean() + 0.3

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = posterior_indel_batch(*tensors, batch, lengths)
        _ = np.asarray(out["loglik"])
    dt = time.perf_counter() - t0
    print(f"posterior kernel: {len(reads) * iters / dt:.1f} reads/s "
          f"(B={len(reads)}, n={tensors[0].shape[0]}, L={read_length})")

    # end-to-end frameshift with posterior report
    named = [(f"r{k}", s) for k, s in enumerate(reads)]
    call = finder.find_frameshift([], named, read_length, posterior=True)
    print("frameshift call:", call,
          "posterior:", None if call is None or call.posterior is None else
          {k: v for k, v in call.posterior.items()
           if not isinstance(v, np.ndarray)})
    print("OK")


if __name__ == "__main__":
    main()
