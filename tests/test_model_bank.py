"""Model bank: compiled payloads round-trip through the on-disk cache and
produce identical device results."""

import numpy as np
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.engine import device_analytics as da
from advntr_tpu.engine.finder import LocusModelCache
from advntr_tpu.models.reference_vntr import ReferenceVNTR


def make_ref():
    pattern = "CAGTTCAGGCAT"
    ref = ReferenceVNTR(77, pattern, 1000, "chr1")
    ref.repeat_segments = [pattern] * 3
    ref.left_flanking_region = "ACGTTGCAGTAGGTCAACGT" * 3
    ref.right_flanking_region = "TTACGGATCCAGGTCATTAC" * 3
    return ref


def test_bank_roundtrip(tmp_path):
    ref = make_ref()
    bank = str(tmp_path / "bank")
    cache1 = LocusModelCache(bank_dir=bank)
    lm1 = cache1.get(ref, 4, 40, 0.05)
    files = list((tmp_path / "bank").iterdir())
    assert len(files) == 1

    # a fresh cache must load from the bank, not rebuild
    cache2 = LocusModelCache(bank_dir=bank)
    lm2 = cache2.get(ref, 4, 40, 0.05)
    assert lm1.art.names == lm2.art.names

    reads = [dna.encode("ACGTCAGTTCAGGCATCAGTTCAGGCATTTAC")]
    batch, lengths = dna.pad_batch(reads, multiple=8)
    s1 = da.read_stats_struct(lm1.struct.flat(), lm1.meta,
                              jnp.asarray(batch), jnp.asarray(lengths),
                              lm1.suffix_last)
    s2 = da.read_stats_struct(lm2.struct.flat(), lm2.meta,
                              jnp.asarray(batch), jnp.asarray(lengths),
                              lm2.suffix_last)
    assert float(s1["logp"][0]) == float(s2["logp"][0])
    assert int(s1["repeats"][0]) == int(s2["repeats"][0])


def test_scheduled_prefetch(tmp_path):
    ref = make_ref()
    cache = LocusModelCache(workers=1)
    cache.schedule(ref, 4, 40, 0.05)
    lm = cache.get(ref, 4, 40, 0.05)
    assert lm.struct is not None
