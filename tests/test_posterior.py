"""Backward / forward-backward / posterior-indel kernels (ops/posterior.py).

Conformance strategy:
- backward log-likelihood must equal the forward log-likelihood
  (the classic alpha/beta identity), per read, at every prefix seam the
  variable-length latching exercises;
- forward-backward gamma rows are distributions (sum to 1) at every
  active position;
- the posterior indel statistics are expected counts, so they must equal
  the derivative of the log-likelihood under a weight tilt — checked by
  central finite differences against a float64 numpy forward oracle
  (pipeline-independent: the oracle never touches the JAX kernels).
"""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.engine.simulate import mutate
from advntr_tpu.models.compiler import compile_graph_sum
from advntr_tpu.models.graph import (
    K_DELETE, K_INSERT, R_REPEAT, build_read_matcher)
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.ops.posterior import (
    backward_batch, clean_neg, forward_backward_batch, log_sub,
    posterior_indel_batch)
from advntr_tpu.ops.viterbi import forward_batch


def np_forward(log_T, log_E, log_start, log_end, codes):
    """Float64 dense forward oracle (host, no latching needed)."""
    v = log_start + log_E[:, codes[0]]
    for c in codes[1:]:
        v = np.logaddexp.reduce(v[:, None] + log_T, axis=0) + log_E[:, c]
    return float(np.logaddexp.reduce(v + log_end))


def small_model():
    trans, emis = profile_for_repeats(["CAGCAG", "CAGCAG", "CAACAG"], 0.05)
    g = build_read_matcher("ACGTTGCA", "TTACGGAT", trans, emis, 3, 0.05)
    return g


READS = [
    "ACGTTGCACAGCAGCAGCAGCAACAGTTACGGAT",
    "TTGCACAGCAGCAGCAGTTACG",
    "CAGCAGCAGCAGCAACAG",
    "ACGTTGCACAGCTGCAGCAGTTACGGAT",
    "ACGTTGCACAGCAGGCAGCAGCAACAGTTACG",   # 1bp insertion in copy 2
    "ACGTTGCACAGCGCAGCAGCAACAGTTACGGAT",  # 1bp deletion in copy 1
]


def _tensors(g):
    full = compile_graph_sum(g)
    return tuple(clean_neg(x) for x in full), full


def test_backward_matches_forward():
    g = small_model()
    (T, E, S, F), _ = _tensors(g)
    rows = [dna.encode(r) for r in READS]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
    fwd = np.asarray(forward_batch(T, E, S, F, batch, lengths))
    bwd = np.asarray(backward_batch(T, E, S, F, batch, lengths))
    np.testing.assert_allclose(bwd, fwd, rtol=1e-5, atol=1e-3)


def test_gamma_rows_are_distributions():
    g = small_model()
    (T, E, S, F), _ = _tensors(g)
    rows = [dna.encode(r) for r in READS]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    loglik, gamma = forward_backward_batch(
        T, E, S, F, jnp.asarray(batch), jnp.asarray(lengths))
    gamma = np.asarray(gamma)
    for b, codes in enumerate(rows):
        for t in (0, len(codes) // 2, len(codes) - 1):
            total = np.exp(gamma[t, b]).sum()
            assert total == pytest.approx(1.0, abs=2e-3), (b, t)


def test_posterior_indel_finite_difference():
    g = small_model()
    full = compile_graph_sum(g)
    nodel = compile_graph_sum(
        g, drop_silent=lambda s: s.kind == K_DELETE and s.region == R_REPEAT)
    T_del = log_sub(full[0], nodel[0])
    S_del = log_sub(full[2], nodel[2])
    F_del = log_sub(full[3], nodel[3])
    emitting = [s for i, s in enumerate(g.states)
                if not s.is_silent and i not in (g.start, g.end)]
    occ_mask = np.array(
        [s.kind == K_INSERT and s.region == R_REPEAT for s in emitting],
        dtype=np.float64)

    rows = [dna.encode(r) for r in READS]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    out = posterior_indel_batch(
        clean_neg(full[0]), clean_neg(full[1]), clean_neg(full[2]),
        clean_neg(full[3]), clean_neg(T_del), clean_neg(S_del),
        clean_neg(F_del), jnp.asarray(occ_mask, dtype=jnp.float32),
        jnp.asarray(batch), jnp.asarray(lengths))
    loglik = np.asarray(out["loglik"], dtype=np.float64)
    loglik_b = np.asarray(out["loglik_backward"], dtype=np.float64)
    occ = np.asarray(out["ins_occupancy"], dtype=np.float64)
    dm = np.asarray(out["del_mass"], dtype=np.float64)
    np.testing.assert_allclose(loglik_b, loglik, rtol=1e-5, atol=1e-3)

    CLIP = np.float64(-1e30)

    def tilt_del(theta):
        T = np.logaddexp(np.where(np.isfinite(nodel[0]), nodel[0], CLIP),
                         np.where(T_del > -1e29, T_del + theta, CLIP))
        S = np.logaddexp(np.where(np.isfinite(nodel[2]), nodel[2], CLIP),
                         np.where(S_del > -1e29, S_del + theta, CLIP))
        F = np.logaddexp(np.where(np.isfinite(nodel[3]), nodel[3], CLIP),
                         np.where(F_del > -1e29, F_del + theta, CLIP))
        return T, S, F

    E64 = np.where(np.isfinite(full[1]), full[1], CLIP)
    eps = 1e-4
    for b, codes in enumerate(rows):
        # forward oracle at theta=0 matches the kernel's loglik
        ll0 = np_forward(np.where(np.isfinite(full[0]), full[0], CLIP), E64,
                         np.where(np.isfinite(full[2]), full[2], CLIP),
                         np.where(np.isfinite(full[3]), full[3], CLIP),
                         codes)
        assert loglik[b] == pytest.approx(ll0, rel=1e-4, abs=2e-3), b

        # expected delete-routed transition count == d loglik / d theta
        Tp, Sp, Fp = tilt_del(+eps)
        Tm, Sm, Fm = tilt_del(-eps)
        fd_del = (np_forward(Tp, E64, Sp, Fp, codes)
                  - np_forward(Tm, E64, Sm, Fm, codes)) / (2 * eps)
        assert dm[b] == pytest.approx(fd_del, rel=2e-2, abs=2e-2), b

        # expected masked-state emissions == d loglik / d theta on log_E rows
        Ep = E64 + eps * occ_mask[:, None]
        Em = E64 - eps * occ_mask[:, None]
        T64 = np.where(np.isfinite(full[0]), full[0], CLIP)
        S64 = np.where(np.isfinite(full[2]), full[2], CLIP)
        F64 = np.where(np.isfinite(full[3]), full[3], CLIP)
        fd_occ = (np_forward(T64, Ep, S64, F64, codes)
                  - np_forward(T64, Em, S64, F64, codes)) / (2 * eps)
        assert occ[b] == pytest.approx(fd_occ, rel=2e-2, abs=2e-2), b

    # the engineered indel reads carry visibly more posterior indel mass
    assert occ[4] > occ[0] + 0.5          # insertion read
    assert dm[5] > dm[0] + 0.5            # deletion read


def test_frameshift_posterior_end_to_end():
    """A repeat deletion raises posterior delete mass and the frameshift
    call carries the posterior report.  (Homozygous so the indel count
    clears identify_frameshift's observed >= coverage fast path — with
    non-integer coverage the binomial ratio is nan and never fires, a
    reference-locked quirk pinned by test_genotype.py.)"""
    from advntr_tpu.config import Config
    from advntr_tpu.engine.finder import VNTRFinder
    from advntr_tpu.models.reference_vntr import ReferenceVNTR

    rng = random.Random(7)
    pattern = "ACGGTCAGT"
    left = "".join(rng.choice("ACGT") for _ in range(80))
    right = "".join(rng.choice("ACGT") for _ in range(80))
    copies = 8
    ref = ReferenceVNTR(25561, pattern, 3000, "chr1")
    ref.repeat_segments = [pattern] * copies
    ref.left_flanking_region = left
    ref.right_flanking_region = right
    ref.estimated_repeats = copies

    read_length = 72
    vntr_b = pattern * 3 + pattern[:4] + pattern[5:] + pattern * (copies - 4)
    hap_a = left + vntr_b + right
    hap_b = left + vntr_b + right
    reads = []
    for h, hap in enumerate((hap_a, hap_b)):
        n_reads = int(len(hap) * 15 / read_length)
        for k in range(n_reads):
            start = rng.randint(0, len(hap) - read_length)
            reads.append((f"h{h}r{k}",
                          mutate(hap[start:start + read_length], 0.001, rng)))

    finder = VNTRFinder(ref, Config())
    result = finder.find_frameshift([], reads, read_length=read_length,
                                    posterior=True)
    assert result is not None and result.startswith("D")
    assert result.posterior is not None
    assert result.posterior["reads"] > 0
    # ~half the repeat-covering reads carry the 1bp deletion
    assert result.posterior["mean_delete_mass"] > 0.05
    assert result.lr_support > 0
