"""Slim model-bank payloads: the production Pallas path must score
identically from a payload with the O(n^2) dense tables stripped, and the
paths that DO need those tables must fail loudly, not silently degrade.

Genome-scale motivation: the full bank is ~1.56 MB/locus gzip'd (~242 GB
at 158,522 loci, PERF_NOTES round-3); the slim payload keeps only the
O(n) fields the grouped Pallas pipeline consumes."""

import gzip
import pickle
import random

import numpy as np
import pytest

from advntr_tpu import dna
from advntr_tpu.engine.finder import (LocusModelCache, build_locus_payload)
from advntr_tpu.models.reference_vntr import ReferenceVNTR


def _locus():
    rng = random.Random(8)
    pattern = "CGCGGGGCGGGG"
    ref = ReferenceVNTR(77, pattern, 1000, "chr1")
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = "".join(rng.choice("ACGT") for _ in range(80))
    ref.right_flanking_region = "".join(rng.choice("ACGT") for _ in range(80))
    return ref


def _reads(ref, n=8, read_len=60):
    from advntr_tpu.engine.simulate import haplotype_sequence, mutate
    rng = random.Random(9)
    out = []
    for _ in range(n):
        hap = haplotype_sequence(ref.left_flanking_region, ref.pattern,
                                 rng.choice([2, 4]),
                                 ref.right_flanking_region)
        start = rng.randint(0, len(hap) - read_len)
        out.append(mutate(hap[start:start + read_len], 0.01, rng))
    return out


def test_slim_payload_scores_identically_on_pallas_path(monkeypatch):
    from advntr_tpu.engine import device_analytics as da
    monkeypatch.setenv("ADVNTR_TPU_KERNEL", "pallas")
    ref = _locus()
    full = build_locus_payload(ref, 6, 60, 0.05, slim=False)
    slim = build_locus_payload(ref, 6, 60, 0.05, slim=True)

    size_full = len(gzip.compress(pickle.dumps(full), 1))
    size_slim = len(gzip.compress(pickle.dumps(slim), 1))
    assert size_slim < size_full / 5, (size_slim, size_full)
    assert slim[0].log_T is None and slim[0].hop_choice is None

    import jax.numpy as jnp
    cache = LocusModelCache()
    lm_full = cache._build_from_payload(*full)
    lm_slim = cache._build_from_payload(*slim)
    assert lm_slim.pallas is not None

    rows = [dna.encode(s) for s in _reads(ref)]
    batch, lengths = dna.pad_batch(rows, multiple=32)
    batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
    s_full = da.read_stats_pallas(lm_full.pallas.flat(), lm_full.meta,
                                  batch, lengths, interpret=True)
    s_slim = da.read_stats_pallas(lm_slim.pallas.flat(), lm_slim.meta,
                                  batch, lengths, interpret=True)
    for key in ("logp", "repeats", "repeat_bp", "left_flank_bp",
                "right_flank_bp", "n_matches"):
        np.testing.assert_array_equal(np.asarray(s_full[key]),
                                      np.asarray(s_slim[key]), err_msg=key)


def test_slim_payload_fails_loudly_on_dense_paths(monkeypatch):
    monkeypatch.setenv("ADVNTR_TPU_KERNEL", "pallas")
    ref = _locus()
    slim = build_locus_payload(ref, 6, 60, 0.05, slim=True)
    cache = LocusModelCache()
    lm = cache._build_from_payload(*slim)
    with pytest.raises(RuntimeError, match="slim bank"):
        lm.struct_model()
