"""The closed-form unit-boundary-crossing rules used by the device analytics
must agree with the compiler's exhaustive per-edge crossing tables (computed
along argmax silent paths) on every finite effective transition, including
PacBio error rates and large copy numbers."""

import numpy as np
import pytest

from advntr_tpu.models.compiler import compile_graph
from advntr_tpu.models.graph import (
    build_read_matcher, K_MATCH, R_SUFFIX, R_REPEAT, R_PREFIX)
from advntr_tpu.models.profile import profile_for_repeats

CASES = [
    (["CAGCAG", "CAGCAG", "CAACAG"], "ACGTTGCA", "TTACGGAT", 3, 0.05),
    (["CGCGGGGCGGGG"] * 3, "ACGTACTGACGATCGATT", "TTACGGATGCAGTACGTA",
     13, 0.05),
    (["CATCAGTTGA"] * 5, "A" * 60 + "CGTGA" * 8, "TGCAT" * 12, 7, 0.3),
]


@pytest.mark.parametrize("case", CASES)
def test_formulas_match_tables(case):
    patterns, left, right, copies, err = case
    trans, emis = profile_for_repeats(patterns, err)
    g = build_read_matcher(left, right, trans, emis, copies, err)
    art = compile_graph(g)
    region, unit, kind = art.region, art.unit, art.kind
    finite = np.isfinite(art.log_T)

    r_i, r_j = region[:, None], region[None, :]
    u_i, u_j = unit[:, None], unit[None, :]
    base = np.where(r_i == R_REPEAT, u_i, -1)
    starts_rep = u_j - base
    ends_rep = starts_rep - (r_i == R_SUFFIX)
    starts = np.where(r_j == R_REPEAT, starts_rep,
                      np.where((r_j == R_PREFIX) & (r_i == R_SUFFIX), 1, 0))
    ends = np.where(r_j == R_REPEAT, ends_rep,
                    np.where((r_j == R_PREFIX) & (r_i != R_PREFIX), 1, 0))
    assert not (finite & (starts != art.t_unit_starts)).any()
    assert not (finite & (ends != art.t_unit_ends)).any()

    is_rep = region == R_REPEAT
    unit0_match = is_rep & (unit == 0) & (kind == K_MATCH)
    s_starts = np.where(is_rep & ~unit0_match, unit + 1,
                        np.where(region == R_PREFIX, 1, 0))
    s_ends = np.where(is_rep & ~unit0_match, unit,
                      np.where(region == R_PREFIX, 1, 0))
    okS = np.isfinite(art.log_start)
    assert not (okS & (s_starts != art.s_unit_starts)).any()
    assert not (okS & (s_ends != art.s_unit_ends)).any()

    e_starts = np.where(region == R_SUFFIX, 1, 0)
    e_ends = np.where(is_rep & (kind != K_MATCH), 1,
                      np.where(region == R_SUFFIX, 1, 0))
    okE = np.isfinite(art.log_end)
    assert not (okE & (e_starts != art.e_unit_starts)).any()
    assert not (okE & (e_ends != art.e_unit_ends)).any()
