"""Embedding vector-math ops: numpy cross-checks (the registry oracle checks
cross-engine determinism; these check the math is the math)."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.registry import load_all_queries
from wheels_in_motion_analytics_spark.tables import table

SPECS = load_all_queries()


def _corpus(spark):
    rows = table(spark, SF_SMALL, "embeddings").collect()
    return {r.vec_id: (np.asarray(r.embedding, dtype=np.float64), r.label) for r in rows}


def test_vector_norms_match_numpy(spark):
    corpus = _corpus(spark)
    out = SPECS["embedding_vector_norms"].fn(spark, SF_SMALL).collect()
    assert len(out) == len(corpus)
    for r in out:
        vec, _ = corpus[r.vec_id]
        assert r.dim == 64
        assert abs(r.l2_norm - float(np.linalg.norm(vec))) < 1e-3  # Q8 grid

def test_group_centroids_match_numpy(spark):
    corpus = _corpus(spark)
    labels = {}
    for vec, label in corpus.values():
        labels.setdefault(label, []).append(vec)
    want = {k: np.mean(np.stack(v), axis=0) for k, v in labels.items()}
    out = SPECS["embedding_group_centroids"].fn(spark, SF_SMALL).collect()
    assert len(out) == len(want) * 64
    for r in out:
        assert abs(r.centroid - want[r.label][r.pos]) < 1e-6


def test_centroid_cosine_matches_numpy(spark):
    corpus = _corpus(spark)
    labels = {}
    for vec, label in corpus.values():
        labels.setdefault(label, []).append(vec)
    cent = {k: np.mean(np.stack(v), axis=0) for k, v in labels.items()}
    out = SPECS["embedding_centroid_cosine"].fn(spark, SF_SMALL).collect()
    n = len(cent)
    assert len(out) == n * (n - 1) // 2
    for r in out:
        a, b = cent[r.label_a], cent[r.label_b]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r.label_a < r.label_b
        assert abs(r.cosine - want) < 1e-4


def test_contrastive_pairs_structure(spark):
    import pyspark.sql.functions as F

    from wheels_in_motion_analytics_spark.functions.embeddings import (
        CONTRASTIVE_NEGS,
    )
    from wheels_in_motion_analytics_spark.tables import table as _table

    rows = SPECS["embedding_contrastive_pairs"].fn(spark, SF_SMALL).collect()
    labels = {
        r.vec_id: r.label
        for r in _table(spark, SF_SMALL, "embeddings").select("vec_id", "label").collect()
    }
    per_anchor: dict[int, list] = {}
    for r in rows:
        per_anchor.setdefault(r.anchor, []).append(r)
        assert r.anchor != r.cand
        assert r.is_pos == (labels[r.anchor] == labels[r.cand])
    assert len(per_anchor) == len(labels)  # every vector is an anchor
    n_with_pos = 0
    for anchor, rs in per_anchor.items():
        # in-batch mining: an anchor whose md5 batch lacks a same-label
        # partner yields no positive row (real in-batch behavior)
        n_pos = sum(1 for r in rs if r.is_pos)
        assert n_pos <= 1
        n_with_pos += n_pos
        assert sum(1 for r in rs if not r.is_pos) == CONTRASTIVE_NEGS
    assert n_with_pos >= 0.95 * len(per_anchor)  # batches are label-dense


def test_covariance_matrix_matches_numpy(spark):
    """Exact covariance cells equal a local numpy recompute on the same
    quantized grid (bit-exact sums, 10-dp rounded assembly)."""
    import numpy as np

    from tests.conftest import SF_SMALL
    from wheels_in_motion_analytics_spark.functions.embeddings import (
        COV_GRID,
        covariance_matrix,
    )
    from wheels_in_motion_analytics_spark.registry import load_all_queries
    from wheels_in_motion_analytics_spark.tables import table

    rows = covariance_matrix(spark, SF_SMALL).collect()
    e = np.stack(
        [
            np.asarray(r.embedding, dtype="float64")
            for r in table(spark, SF_SMALL, "embeddings").select("embedding").collect()
        ]
    )
    q = np.floor(e * COV_GRID + 0.5).astype("int64")
    n = len(q)
    outer = (q.T @ q).astype("float64")
    sx = q.sum(axis=0).astype("float64")
    cov = (outer - np.outer(sx, sx) / n) / n / float(COV_GRID) ** 2
    for r in rows:
        assert r.cov == round(cov[r.i, r.j], 10), (r.i, r.j)


def test_pca_power_iteration_matches_eigh(spark):
    """The audited PCA's implied top eigenvalue must agree with
    numpy.linalg.eigh on the same covariance matrix (the oracle only sees
    the verdicts; this pins the solver itself)."""
    import hashlib

    import numpy as np

    from tests.conftest import SF_SMALL
    from wheels_in_motion_analytics_spark.functions.embeddings import (
        COV_DIM,
        PCA_ITERS,
        covariance_matrix,
    )

    A = np.zeros((COV_DIM, COV_DIM))
    for r in covariance_matrix(spark, SF_SMALL).collect():
        A[r.i, r.j] = r.cov
    v = np.array(
        [
            int(hashlib.md5(f"pca:{d}".encode()).hexdigest()[:8], 16) / float(1 << 32)
            for d in range(COV_DIM)
        ]
    )
    v /= np.linalg.norm(v)
    for _ in range(PCA_ITERS):
        w = A @ v
        v = w / np.linalg.norm(w)
    lam = float(v @ (A @ v))
    top = float(np.linalg.eigh(A)[0][-1])
    assert abs(lam - top) <= 1e-6 * top


def test_pq_frozen_codebooks_match_trainer(spark):
    """The frozen PQ codebooks must be bit-identical to what the
    production per-corpus trainer produces on the training corpus — pins
    that freezing (for oracle checkability) didn't fork the model."""
    import numpy as np

    from wheels_in_motion_analytics_spark.functions.pq import train_pq_codebooks
    from wheels_in_motion_analytics_spark.functions.pq_artifact import (
        PQ_FROZEN_CODEBOOKS,
    )

    trained = train_pq_codebooks(spark, "/root/testdata/sf0.01")
    assert len(trained) == len(PQ_FROZEN_CODEBOOKS)
    # 1e-12 tolerance, not bit-equality: BLAS kernel dispatch varies by
    # ~1 ULP across host CPUs (see the IVF artifact test / NOTES.md)
    for got, want in zip(trained, PQ_FROZEN_CODEBOOKS):
        assert np.allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-12)


def test_pq_codes_are_nibble_packed_and_error_positive(spark):
    """Every PQ code must unpack to 8 valid nibbles (< 16) and the
    reconstruction error must be nonnegative and finite."""
    from wheels_in_motion_analytics_spark.registry import load_all_queries

    rows = (
        load_all_queries()["pq_encode_reconstruction_error"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r.pq_code < 16**8
        assert r.err_micro >= 0


def test_pq_adc_selects_genuinely_near_vectors(spark):
    """ADC is approximate, but its top-k must be real near-neighbors:
    for every anchor, the mean EXACT distance of the 5 ADC picks must be
    well below the anchor's mean exact distance to the whole corpus."""
    import numpy as np

    from wheels_in_motion_analytics_spark.registry import load_all_queries
    from wheels_in_motion_analytics_spark.functions.pq import ADC_ANCHOR_MOD

    sf = "/root/testdata/sf0.001"
    rows = load_all_queries()["pq_adc_topk_search"].fn(spark, sf).collect()
    vecs = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    }
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert len(by_anchor) == sum(1 for v in vecs if v % ADC_ANCHOR_MOD == 0)
    for aid, picks in by_anchor.items():
        assert len(picks) == 5
        q = vecs[aid]
        corpus_mean = np.mean(
            [((q - v) ** 2).sum() for k, v in vecs.items() if k != aid]
        )
        pick_mean = np.mean([((q - vecs[r.vec_id]) ** 2).sum() for r in picks])
        # the synthetic embeddings are near-isotropic (distance
        # concentration), so demand clear-but-modest separation
        assert pick_mean < 0.95 * corpus_mean, (aid, pick_mean, corpus_mean)
