"""Regenerate the frozen product-quantization codebooks.

Trains the deterministic per-subspace L2 k-means
(:func:`wheels_in_motion_analytics_spark.functions.pq._pq_codebooks`) on
the md5-ordered bounded sample of the sf0.01 embeddings corpus — exactly
the sample `train_pq_codebooks` draws — and freezes the result into
``wheels_in_motion_analytics_spark/functions/pq_artifact.py`` as repr'd
double literals (bit-identical round-trip), so the DuckDB oracle can
replicate subspace slicing, codeword assignment and error summation end
to end. The production path (train per corpus via `train_pq_codebooks`)
stays in the module and is pinned equal to this artifact for the training
corpus by tests/test_embeddings.py.

Run: python tools/gen_pq_artifact.py  (only needed if testdata regenerates)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wheels_in_motion_analytics_spark.functions.pq import (  # noqa: E402
    PQ_TRAIN_SAMPLE,
    _pq_codebooks,
)

TRAIN_SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "wheels_in_motion_analytics_spark",
    "functions",
    "pq_artifact.py",
)


def train_codebooks_duckdb(sf_dir: str = TRAIN_SF_DIR):
    """Spark-free replica of `train_pq_codebooks`'s bounded md5 sample."""
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    rows.sort(key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    rows = rows[:PQ_TRAIN_SAMPLE]
    mat = np.array([r[1] for r in rows], dtype="float64")
    return _pq_codebooks(mat)


def main() -> None:
    books = train_codebooks_duckdb()
    lines = [
        '"""Frozen product-quantization codebooks (generated artifact).',
        "",
        "Produced by tools/gen_pq_artifact.py from the sf0.01 embeddings",
        "corpus; see that script for provenance. Do not edit by hand.",
        '"""',
        "",
        "PQ_FROZEN_CODEBOOKS = [",
    ]
    for book in books:
        lines.append("    [")
        for row in book:
            lines.append("        [" + ", ".join(repr(float(v)) for v in row) + "],")
        lines.append("    ],")
    lines.append("]")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {len(books)} subspaces x {books[0].shape[0]} codewords")


if __name__ == "__main__":
    main()
