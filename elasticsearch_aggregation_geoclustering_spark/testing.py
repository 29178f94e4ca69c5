"""Shared deterministic fixtures (FIXTURES.md).

Fixture A: the 15 Paris-area points from the reference golden suite
(/root/reference/src/yamlRestTest/.../20_geo_clustering.yml:19-107).
"""

from __future__ import annotations

import numpy as np

#: (doc_id, lon, lat) — 20_geo_clustering.yml setup docs, ids 1..15
PARIS_POINTS: list[tuple[int, float, float]] = [
    (1, 2.454929, 48.821578),
    (2, 2.245858, 48.86914),
    (3, 2.240358, 48.863481),
    (4, 2.25292, 48.847176),
    (5, 2.279111, 48.872383),
    (6, 2.336267, 48.822021),
    (7, 2.338677, 48.822672),
    (8, 2.336643, 48.822493),
    (9, 2.438465, 48.84204),
    (10, 2.381554, 48.835382),
    (11, 2.407744, 48.83733),
    (12, 2.34521, 48.849358),
    (13, 2.252938, 48.846041),
    (14, 2.279715, 48.871775),
    (15, 2.380629, 48.879757),
]


def paris_arrays() -> tuple[np.ndarray, np.ndarray]:
    """(lons, lats) float64 arrays of the Paris fixture."""
    lons = np.array([p[1] for p in PARIS_POINTS], dtype=np.float64)
    lats = np.array([p[2] for p in PARIS_POINTS], dtype=np.float64)
    return lons, lats


def random_points(seed: int, n: int = 1000) -> tuple[np.ndarray, np.ndarray]:
    """Fixture D: deterministic random world-wide points."""
    rng = np.random.default_rng(seed)
    lons = rng.uniform(-180.0, 180.0, n)
    lats = rng.uniform(-85.0, 85.0, n)
    return lons, lats
