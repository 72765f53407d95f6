"""Multi-host helpers: locus sharding and ordered result gathering."""

from advntr_tpu.parallel.distributed import shard_loci, gather_results


def test_shard_loci_partition():
    ids = list(range(10))
    shards = [shard_loci(ids, p, 3) for p in range(3)]
    assert shards == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    flat = [v for s in shards for v in s]
    assert flat == ids


def test_gather_results(tmp_path):
    out = str(tmp_path / "shards")
    r1 = gather_results({"1": "2/3", "2": "4/4"}, 1, 2, out)
    assert r1 is None  # non-zero hosts only write their shard
    merged = gather_results({"0": "1/5"}, 0, 2, out)
    assert merged == {"0": "1/5", "1": "2/3", "2": "4/4"}
