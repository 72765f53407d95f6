"""Device-side analytics vs host string-based analytics on expanded paths.

The fused device kernel computes RU counts, flank sizes and match counts
from the traceback + compiled metadata; the host implementation parses
reference-style state-name sequences.  Both must agree on every read.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from advntr_tpu import dna
from advntr_tpu.engine import analytics as an
from advntr_tpu.engine import device_analytics as da
from advntr_tpu.models.compiler import compile_graph, expand_path
from advntr_tpu.models.graph import build_read_matcher
from advntr_tpu.models.profile import profile_for_repeats


@pytest.fixture(scope="module")
def setup():
    trans, emis = profile_for_repeats(["CAGCAGT"] * 3, 0.05)
    g = build_read_matcher("ACGTTGCAGA", "TTACGGATCC", trans, emis, 5, 0.05)
    art = compile_graph(g)
    model = da.DeviceModel.from_artifact(art)
    return art, model


READS = [
    "ACGTTGCAGACAGCAGTCAGCAGTCAGCAGTTTACGGATCC",  # flank+3 units+flank
    "TTGCAGACAGCAGTCAGCAGTTTACG",
    "CAGCAGTCAGCAGTCAGCAGTCAGCAGT",               # repeats only
    "ACGTTGCAGACAGCGTCAGCAGTTTACGGATCC",          # unit with deletion
    "ACGTTGCAGACAGGCAGTCAGCAGTTTACGGATCC",        # unit with insertion
    "ACGTTGCAGACAGCAGTCAGTTACGGATCC",             # partial trailing unit
    "GACAGCAGTCAGCAGTCA",                         # tiny flank pieces
]


def test_device_matches_host(setup):
    art, model = setup
    rows = [dna.encode(r) for r in READS]
    batch, lengths = dna.pad_batch(rows, multiple=8)
    stats = da.read_stats(model.flat(), jnp.asarray(batch),
                          jnp.asarray(lengths), return_path=True)
    stats = {k: np.asarray(v) for k, v in stats.items()}

    for b, read in enumerate(READS):
        L = len(read)
        path = stats["path"][b][:L]
        visited = expand_path(art, path)
        assert stats["repeats"][b] == an.count_repeats(visited), read
        assert stats["n_matches"][b] == an.count_matches(visited), read
        assert stats["repeat_bp"][b] == an.count_repeat_bp_matches(visited), read
        assert stats["left_flank_bp"][b] == an.left_flank_size(visited), read
        assert stats["right_flank_bp"][b] == an.right_flank_size(visited), read
        # flank matching rate from device counts == host rate
        rate_host = an.flanking_matching_rate(
            visited, read, "ACGTTGCAGA", "TTACGGATCC")
        rates = da.flank_rates({k: v[b:b + 1] for k, v in stats.items()})
        assert rates[0] == pytest.approx(rate_host), read
