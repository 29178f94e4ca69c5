"""Property test: vectorized greedy merge ≡ element-by-element reference loop."""

from __future__ import annotations

import copy

import numpy as np
import pytest

from elasticsearch_aggregation_geoclustering_spark.operators.merge import (
    Cluster,
    merge_clusters,
    merge_clusters_reference,
)


def _random_candidates(rng: np.random.Generator, n: int) -> list[Cluster]:
    lats = rng.uniform(-85, 85, n)
    lons = rng.uniform(-179, 179, n)
    # mix in tight clumps so merges actually happen
    clump = rng.integers(0, max(1, n // 5), n)
    lats = np.where(rng.random(n) < 0.6, lats[clump], lats)
    lons = np.where(rng.random(n) < 0.6, lons[clump], lons)
    counts = rng.integers(1, 50, n)
    cells = np.sort(rng.choice(10**9, size=n, replace=False))[::-1]
    return [
        Cluster(cell=int(c), lat=float(la), lon=float(lo), doc_count=int(dc))
        for c, la, lo, dc in zip(cells, lats, lons, counts)
    ]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("ratio", [0.0, 0.8, 1.5])
def test_vectorized_matches_reference(seed, ratio):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 300))
    cands = _random_candidates(rng, n)
    radius_m = float(rng.uniform(1_000, 2_000_000))
    got = merge_clusters(copy.deepcopy(cands), radius_m, ratio)
    want = merge_clusters_reference(copy.deepcopy(cands), radius_m, ratio)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.cell == w.cell
        assert g.doc_count == w.doc_count
        assert g.cells == w.cells
        assert g.lat == pytest.approx(w.lat, abs=1e-12)
        assert g.lon == pytest.approx(w.lon, abs=1e-12)


def test_empty_and_single():
    assert merge_clusters([], 1000.0, 0.0) == []
    one = [Cluster(cell=5, lat=1.0, lon=2.0, doc_count=3)]
    out = merge_clusters(copy.deepcopy(one), 1000.0, 0.0)
    assert len(out) == 1 and out[0].doc_count == 3 and out[0].cells == [5]
