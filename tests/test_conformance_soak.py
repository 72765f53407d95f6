"""Randomized conformance soak: the production struct kernel vs the float64
full-graph oracle across varied models, error rates and read shapes
(SNPs, indels, chimeras, truncations, junk)."""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.models.compiler import compile_graph, viterbi_full_graph
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.profile import profile_for_repeats
from advntr_tpu.models.struct_compiler import build_structured, pad_structured
from advntr_tpu.ops.viterbi_struct import (
    StructDeviceModel, viterbi_struct_batch)


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def make_model(rng, err):
    plen = rng.choice([5, 7, 11, 14])
    pattern = _rand_seq(rng, plen)
    units = []
    for _ in range(3):
        u = list(pattern)
        if rng.random() < 0.5:
            u[rng.randrange(plen)] = rng.choice("ACGT")
        units.append("".join(u))
    left = _rand_seq(rng, rng.choice([12, 20]))
    right = _rand_seq(rng, rng.choice([12, 20]))
    copies = rng.choice([3, 5])
    trans, emis = profile_for_repeats(units, err)
    g = build_read_matcher(left, right, trans, emis, copies, err)
    art = compile_graph(g)
    sm = build_structured(g, art)
    sm = pad_structured(sm, art, ((sm.P + 1 + 63) // 64) * 64,
                        ((sm.C + 7) // 8) * 8)
    dev = StructDeviceModel.from_struct(sm, art)
    return g, art, sm, dev, left, pattern, right, copies


def make_read(rng, left, pattern, right, copies):
    hap = left + pattern * rng.randint(1, copies + 2) + right
    kind = rng.random()
    if kind < 0.5:
        a = rng.randint(0, max(0, len(hap) - 15))
        b = rng.randint(a + 10, len(hap))
        read = hap[a:b]
    elif kind < 0.7:
        read = _rand_seq(rng, rng.randint(10, 60))          # junk
    elif kind < 0.85:
        read = hap[: len(hap) // 2] + _rand_seq(rng, 20)    # chimera
    else:
        read = hap
    chars = list(read)
    for _ in range(rng.randint(0, 4)):
        op = rng.random()
        i = rng.randrange(len(chars))
        if op < 0.5:
            chars[i] = rng.choice("ACGT")
        elif op < 0.75 and len(chars) > 12:
            del chars[i]
        else:
            chars.insert(i, rng.choice("ACGT"))
    return "".join(chars)


@pytest.mark.parametrize("seed,err", [(1, 0.05), (2, 0.05), (3, 0.3)])
def test_soak(seed, err):
    rng = random.Random(seed)
    g, art, sm, dev, left, pattern, right, copies = make_model(rng, err)
    reads = [make_read(rng, left, pattern, right, copies) for _ in range(16)]
    rows = [dna.encode(r) for r in reads]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    logp, _, path = viterbi_struct_batch(
        dev.flat(), jnp.asarray(batch), jnp.asarray(lengths),
        suffix_last=sm.suffix_last)
    logp = np.asarray(logp)
    path = np.asarray(path)
    for b, codes in enumerate(rows):
        ref_logp, _ = viterbi_full_graph(g, codes)
        if not np.isfinite(ref_logp):
            assert logp[b] < -1e25, reads[b]
            continue
        assert logp[b] == pytest.approx(ref_logp, rel=1e-4, abs=2e-2), reads[b]
        # device path must rescore to the optimum in float64
        p = path[b][: len(codes)]
        s = float(art.log_start[p[0]] + art.log_E[p[0], codes[0]])
        for t in range(1, len(codes)):
            s += art.log_T[p[t - 1], p[t]] + art.log_E[p[t], codes[t]]
        s += art.log_end[p[-1]]
        assert s == pytest.approx(ref_logp, rel=1e-4, abs=2e-2), reads[b]
