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


# --- Fixture B: synthetic source-code corpus (BASELINE.json input_hint) ----

_LANGS = ["py", "java", "js", "go", "rs"]
_EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "rs": "rs"}

#: fixed template pool of code-ish lines; {id} and {num} slots get filled
_LINE_TEMPLATES = [
    "def {id}(x, y): return x + y  # {num}",
    "for i in range({num}): total += values[i]",
    "if err != nil {{ return fmt.Errorf(\"{id} failed: %w\", err) }}",
    "public static void {id}(String[] args) throws Exception {{",
    "let {id} = require('./{id}'); module.exports = {id};",
    "fn {id}(input: &str) -> Result<u64, Error> {{ input.parse() }}",
    "import os, sys, json  # used by {id} at {num}",
    "class {id}: pass  # TODO refactor {num}",
    "while queue: node = queue.pop({num} % len(queue))",
    "const BUFFER_SIZE = {num}; // tuned for {id}",
    "return sorted(items, key=lambda r: (r.score, r.doc_id))  # {id}",
    "match token {{ Token::Ident({id}) => emit({num}), _ => skip() }}",
    "try: conn.execute(query) except TimeoutError: retry({num})",
    "static int {id}_count = {num};",
    "select count(*) from events where user_id = {num}  -- {id}",
]

#: Zipf-ish hot vocabulary so hot-term handling is exercised (FIXTURES.md)
_HOT_TERMS = ["the", "import", "return", "value", "data", "x0", "error", "config"]


def synth_documents(n_docs: int, seed: int = 42) -> "pd.DataFrame":
    """Deterministic Fixture B corpus: (repo, path, commit, lang, content).

    Zipf-ish term distribution (hot terms repeated per line count drawn from
    a Zipf law), one unique sentinel token ``uniq_{i}`` per doc for
    exact-match query tests, and a deterministic Paris-area geo scatter
    (lon/lat) for the query→cluster composition.
    """
    import hashlib

    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        lang = _LANGS[i % len(_LANGS)]
        repo = f"org{i % 7}/proj{i % 23}"
        path = f"src/mod{i % 41}/file{i}.{_EXT[lang]}"
        commit = hashlib.sha256(f"commit-{i}".encode()).hexdigest()[:12]
        n_lines = int(rng.integers(20, 200))
        line_ids = rng.integers(0, len(_LINE_TEMPLATES), n_lines)
        nums = rng.integers(0, 10_000, n_lines)
        idents = rng.zipf(1.7, n_lines) % 500  # Zipf-ish identifier pool
        lines = [
            _LINE_TEMPLATES[line_ids[j]].format(id=f"id_{idents[j]}", num=int(nums[j]))
            for j in range(n_lines)
        ]
        # hot terms with Zipf multiplicity + the unique sentinel
        n_hot = int(rng.zipf(1.5)) % 40
        hot = " ".join(str(rng.choice(_HOT_TERMS)) for _ in range(n_hot))
        content = "\n".join(lines) + f"\n{hot}\nuniq_{i}\n"
        h = int(hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:8], 16)
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
                "lon": 2.2 + (h % 3000) / 10_000.0,
                "lat": 48.8 + ((h >> 16) % 1000) / 10_000.0,
            }
        )
    return pd.DataFrame(rows)
