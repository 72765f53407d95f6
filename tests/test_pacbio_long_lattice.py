"""PacBio e2e at a realistic multi-kb lattice: a >=5kb trimmed window must
route through the checkpointed traceback kernel (finder.run_device,
L > CKPT_TRACEBACK_L) and still genotype correctly.

The short-window PacBio tests never cross the routing boundary; this one
pins it in-suite (reference workload: multi-kb spanning reads,
vntr_finder.py:640-665, decoded at max-copies model scale :534-585)."""

import random

from advntr_tpu.config import Config
from advntr_tpu.engine.finder import VNTRFinder
from advntr_tpu.engine.simulate import haplotype_sequence, mutate
from advntr_tpu.models.reference_vntr import ReferenceVNTR

PATTERN = "CATCAGTTGACGTAGCATCAGTTGACGTAG"   # 30bp


def _rand_seq(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_pacbio_5kb_window_routes_through_ckpt_kernel(monkeypatch):
    left = _rand_seq(13, 300)
    right = _rand_seq(14, 300)
    ref = ReferenceVNTR(71001, PATTERN, 5000, "chr1")
    ref.repeat_segments = [PATTERN] * 100
    ref.left_flanking_region = left
    ref.right_flanking_region = right
    ref.estimated_repeats = 100

    # alleles 160/165 x 30bp => trimmed windows ~5.0-5.2kb (tract + 2x100bp)
    alleles = (160, 165)
    rng = random.Random(77)
    reads = []
    for h, copies in enumerate(alleles):
        hap = haplotype_sequence(left, PATTERN, copies, right)
        for k in range(2):
            start = rng.randint(0, 100)
            end = len(hap) - rng.randint(0, 100)
            reads.append((f"h{h}r{k}", mutate(hap[start:end], 0.005, rng)))

    finder = VNTRFinder(ref, Config().with_platform(pacbio=True))

    from advntr_tpu.engine import device_analytics as da
    calls = {"ckpt": 0, "max_L": 0}
    orig = da.read_stats_struct_ckpt

    def spy(model_arrays, meta, batch, lengths, suffix_last, **kw):
        calls["ckpt"] += 1
        calls["max_L"] = max(calls["max_L"], int(batch.shape[1]))
        return orig(model_arrays, meta, batch, lengths, suffix_last, **kw)

    monkeypatch.setattr(da, "read_stats_struct_ckpt", spy)

    result = finder.find_repeat_count_pacbio(None, reads)
    assert calls["ckpt"] >= 1, "5kb window must use the ckpt traceback"
    assert calls["max_L"] >= 5000, calls
    assert result.copy_numbers is not None
    assert tuple(sorted(result.copy_numbers)) == alleles, result.copy_numbers
