"""Regenerate the frozen IVF coarse-quantizer artifact.

Trains the deterministic spherical k-means quantizer
(:func:`wheels_in_motion_analytics_spark.functions.similarity._ivf_centroids`)
on the md5-ordered bounded sample of the sf0.01 embeddings corpus — exactly
the sample `_train_ivf_centroids` draws — and freezes the result into
``wheels_in_motion_analytics_spark/functions/ivf_artifact.py`` as repr'd
double literals (bit-identical round-trip).

Freezing makes the quantizer a shipped model artifact, the same move that
made the LSH hyperplanes fully oracle-checkable: with the centroids as
literals, the DuckDB oracle replicates cell ranking, probe/assign join,
re-rank and tiebreak end to end. The production path (train per corpus via
``_train_ivf_centroids``) stays in the module and is pinned equal to this
artifact for the training corpus by ``tests/test_similarity.py``.

Run: python tools/gen_ivf_artifact.py  (only needed if testdata regenerates)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wheels_in_motion_analytics_spark.functions.similarity import (  # noqa: E402
    IVF_TRAIN_SAMPLE,
    _ivf_centroids,
)

TRAIN_SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "wheels_in_motion_analytics_spark",
    "functions",
    "ivf_artifact.py",
)


def train_centroids_duckdb(sf_dir: str = TRAIN_SF_DIR) -> np.ndarray:
    """Spark-free replica of `_train_ivf_centroids`'s bounded md5 sample."""
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    rows.sort(key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    rows = rows[:IVF_TRAIN_SAMPLE]
    mat = np.array([r[1] for r in rows], dtype="float64")
    norms = np.sqrt((mat * mat).sum(axis=1))
    return _ivf_centroids(mat, norms)


def main() -> None:
    cents = train_centroids_duckdb()
    lines = [
        '"""Frozen IVF coarse-quantizer centroids (generated artifact).',
        "",
        "Produced by tools/gen_ivf_artifact.py from the sf0.01 embeddings",
        "corpus; see that script for provenance. Do not edit by hand.",
        '"""',
        "",
        "IVF_FROZEN_CENTROIDS = [",
    ]
    for row in cents:
        lines.append("    [" + ", ".join(repr(float(v)) for v in row) + "],")
    lines.append("]")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {cents.shape[0]} centroids x {cents.shape[1]} dims")


if __name__ == "__main__":
    main()
