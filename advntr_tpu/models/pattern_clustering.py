"""Repeat-unit pattern clustering (offline analysis).

Capability-equivalent to the reference advntr/pattern_clustering.py: cluster
a locus's repeat-unit sequences by edit distance, picking the cluster count
at the elbow of the intra-cluster-similarity curve.
"""

from __future__ import annotations

import numpy as np

from advntr_tpu.models.msa import needleman_wunsch


def get_sequence_distance(s: str, t: str,
                          high_indel_penalty: bool = False) -> float:
    max_length = max(len(s), len(t))
    if high_indel_penalty:
        # match 1, mismatch -0.5 approximated by the (1,-1,-1,-1) aligner's
        # score; the reference uses globalms(1,-.5,-1,-1)
        return max_length - needleman_wunsch(s, t)[2]
    # globalxx counts matched positions only: identity score
    a, b, _ = needleman_wunsch(s, t)
    matches = sum(1 for x, y in zip(a, b) if x == y and x != "-")
    return max_length - matches


def get_distance_matrix(patterns: list[str]) -> np.ndarray:
    n = len(patterns)
    dist = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            dist[i, j] = get_sequence_distance(patterns[i], patterns[j])
    return dist


def _cluster_similarities(clusters, dist) -> list[float]:
    out = []
    for cluster in clusters:
        sim = sum(dist[i][j] for i in cluster for j in cluster)
        out.append(sim / len(cluster) ** 2)
    return out


def get_elbow_point_index(curve) -> int:
    """Point with max distance from the first-to-last chord."""
    n = len(curve)
    coords = np.vstack((range(n), curve)).T
    first = coords[0]
    line = coords[-1] - coords[0]
    norm = np.sqrt((line ** 2).sum())
    if norm == 0:
        return 0
    line = line / norm
    from_first = coords - first
    proj = (from_first * line).sum(axis=1)
    parallel = np.outer(proj, line)
    dists = np.sqrt(((from_first - parallel) ** 2).sum(axis=1))
    return int(np.argmax(dists))


def get_pattern_clusters(patterns: list[str]) -> list[list[str]]:
    if len(patterns) == 1:
        return [list(patterns)]
    from sklearn.cluster import AgglomerativeClustering
    dist = get_distance_matrix(patterns)
    distortions = []
    clusterings = []
    for k in range(1, len(patterns) + 1):
        f = AgglomerativeClustering(metric="precomputed", linkage="complete",
                                    n_clusters=k).fit(dist)
        clusters = [[] for _ in range(k)]
        for idx, label in enumerate(f.labels_):
            clusters[label].append(idx)
        sims = _cluster_similarities(clusters, dist)
        distortions.append(sum(sims) / float(len(sims)))
        clusterings.append(clusters)
    distortions.reverse()
    clusterings.reverse()
    best = clusterings[get_elbow_point_index(distortions)]
    return [[patterns[i] for i in cluster] for cluster in best]
