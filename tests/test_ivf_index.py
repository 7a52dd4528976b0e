"""X53 incremental IVF index (operators/ivf_index.py): append ≡
one-shot build under frozen centroids, replay duplication surfaced +
compacted, staleness drift signal, torn-pointer fallback, rebuild
resets the baseline, kNN join consuming the maintained index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.ivf_index import IvfIndex
from covid19i2b2_spark.operators.knn import knn_join_ivf
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def _emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


def _frozen_cents(emb):
    return emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )


def _rows(idx, spark):
    return sorted(
        (r["vec_id"], r["centroid_id"])
        for r in idx.assigned(spark).select("vec_id", "centroid_id").collect()
    )


def test_append_equals_one_shot_build(spark, tmp_path):
    """build(half) + append(half) must hold exactly what build(full)
    holds under the same frozen centroids — same ids, same routing."""
    emb = _emb(spark)
    cents = _frozen_cents(emb)

    inc = IvfIndex(str(tmp_path / "inc"))
    inc.build(
        emb.filter(F.col("vec_id") % 2 == 0), "vec_id", "embedding",
        centroids=cents, exact_decimal=True,
    )
    res = inc.append(emb.filter(F.col("vec_id") % 2 == 1))
    assert res["dropped_degenerate"] == 0 and res["appended"] > 0

    one = IvfIndex(str(tmp_path / "one"))
    one.build(emb, "vec_id", "embedding", centroids=cents,
              exact_decimal=True)
    assert _rows(inc, spark) == _rows(one, spark)


def test_append_validates_columns_and_requires_build(spark, tmp_path):
    emb = _emb(spark)
    idx = IvfIndex(str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="build"):
        idx.append(emb)
    with pytest.raises(ValueError, match="exactly one"):
        idx.build(emb, "vec_id", "embedding")
    idx.build(emb, "vec_id", "embedding", centroids=_frozen_cents(emb))
    with pytest.raises(ValueError, match="missing index column"):
        idx.append(emb.select(F.col("vec_id").alias("other"), "embedding"))


def test_replay_surfaces_in_health_and_compact_restores(spark, tmp_path):
    """A replayed append doubles rows but not distinct ids; health
    flags it; compact() writes a new version with one-shot counts and
    identical contents; the drift baseline is untouched."""
    emb = _emb(spark)
    idx = IvfIndex(str(tmp_path / "idx"))
    idx.build(
        emb.filter(F.col("vec_id") < 300), "vec_id", "embedding",
        centroids=_frozen_cents(emb), exact_decimal=True,
    )
    batch = emb.filter(F.col("vec_id") >= 300)
    idx.append(batch)
    clean = _rows(idx, spark)
    h0 = idx.health(spark)
    assert h0["duplication_ratio"] == 1.0

    idx.append(batch)  # at-least-once replay
    h1 = idx.health(spark)
    assert h1["duplication_ratio"] > 1.0
    assert h1["n_distinct_ids"] == h0["n_distinct_ids"]
    # dedup-on-read answers correctly even before the compact
    dd = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in idx.assigned(spark, dedup=True)
        .select("vec_id", "centroid_id").collect()
    )
    assert dd == clean

    v_before = idx.current_version(spark)
    idx.compact(spark)
    assert idx.current_version(spark) == v_before + 1
    h2 = idx.health(spark)
    assert h2["duplication_ratio"] == 1.0
    assert h2["n_rows"] == h0["n_rows"]
    assert h2["base_mean_cosine"] == h1["base_mean_cosine"]
    assert _rows(idx, spark) == clean


def test_staleness_drift_signal(spark, tmp_path):
    """Appending vectors the frozen centroids don't describe must pull
    mean assigned-cosine below the baseline (positive drift); the
    build-time health of the same index reads ~zero drift."""
    emb = _emb(spark)
    idx = IvfIndex(str(tmp_path / "idx"))
    idx.build(emb, "vec_id", "embedding", centroids=_frozen_cents(emb))
    h0 = idx.health(spark)
    assert abs(h0["cosine_drift"]) < 1e-6 and not h0["stale"]
    assert h0["empty_clusters"] == 0
    assert h0["max_cluster"] >= h0["n_rows"] / h0["n_centroids"]

    # drifted regime: vectors from the centroids' orthogonal
    # complement — exactly zero cosine to EVERY centroid (negating or
    # perturbing near-random vectors would NOT drift: the max-cosine
    # of a random vector over a symmetric centroid set is symmetric).
    # Appending |corpus| such rows halves the mean assigned cosine.
    import numpy as np

    C = np.array(
        [r["cvec"] for r in idx.centroids(spark).collect()],
        dtype=np.float64,
    )
    _, _, vt = np.linalg.svd(C)
    null_basis = vt[len(C):]  # 48 orthonormal null-space directions
    n_corpus = emb.count()
    drifted_rows = [
        (
            1_000_000 + i,
            [float(x) for x in null_basis[i % len(null_basis)]],
        )
        for i in range(n_corpus)
    ]
    drifted = spark.createDataFrame(
        drifted_rows, "vec_id long, embedding array<float>"
    )
    idx.append(drifted)
    h1 = idx.health(spark)
    assert h1["cosine_drift"] > 0.02 and h1["stale"]

    # rebuild retrains over the drifted corpus and resets the baseline
    idx.rebuild(spark, n_centroids=16, n_iter=2)
    h2 = idx.health(spark)
    assert h2["n_distinct_ids"] == h1["n_distinct_ids"]
    assert abs(h2["cosine_drift"]) < 1e-6 and not h2["stale"]
    assert h2["version"] == h1["version"] + 1


def test_torn_pointer_falls_back_to_marked_version(spark, tmp_path):
    """Garbage or a missing _CURRENT (crash in the delete->rename gap)
    must fall back to the highest version whose meta marker exists —
    an intact index never becomes unreadable."""
    emb = _emb(spark)
    root = str(tmp_path / "idx")
    idx = IvfIndex(root)
    idx.build(emb, "vec_id", "embedding", centroids=_frozen_cents(emb))
    idx.compact(spark)  # -> v0002
    want = _rows(idx, spark)

    ptr = tmp_path / "idx" / "_CURRENT"
    ptr.write_text("not-a-version")
    assert idx.current_version(spark) == 2
    ptr.unlink()
    assert idx.current_version(spark) == 2
    assert _rows(idx, spark) == want


def test_flip_retains_previous_version_until_vacuum(spark, tmp_path):
    """ADVICE r10 #3: a lazy handle captured from the previous version
    (a kNN consumer holding assigned() while compact() runs in its
    quiet window) must still evaluate after the flip — the flip keeps
    version-1 as a reader grace window; vacuum() reclaims it once the
    window closes."""
    emb = _emb(spark)
    root = tmp_path / "idx"
    idx = IvfIndex(str(root))
    idx.build(emb, "vec_id", "embedding", centroids=_frozen_cents(emb))

    stale_handle = idx.assigned(spark)      # lazy plan over v0001
    idx.compact(spark)                       # -> v0002, v0001 retained
    versions = sorted(p.name for p in root.iterdir()
                      if p.name.startswith("v"))
    assert versions == ["v0001", "v0002"]
    # the pre-flip handle evaluates against the retained files
    assert stale_handle.count() == emb.count()

    idx.compact(spark)                       # -> v0003; prunes v0001
    versions = sorted(p.name for p in root.iterdir()
                      if p.name.startswith("v"))
    assert versions == ["v0002", "v0003"]

    idx.vacuum(spark)                        # grace window closed
    versions = sorted(p.name for p in root.iterdir()
                      if p.name.startswith("v"))
    assert versions == ["v0003"]
    assert idx.current_version(spark) == 3
    assert _rows(idx, spark) == sorted(
        (r["vec_id"], r["centroid_id"])
        for r in idx.assigned(spark).select(
            "vec_id", "centroid_id").collect()
    )


def test_knn_join_through_maintained_index(spark, tmp_path):
    """knn_join_ivf(assigned=index.assigned(...)) over a built+appended
    index must equal the per-call assignment path — the assign-once,
    probe-many steady state through the maintained layout."""
    emb = _emb(spark)
    cents = _frozen_cents(emb).localCheckpoint(eager=True)
    idx = IvfIndex(str(tmp_path / "idx"))
    idx.build(
        emb.filter(F.col("vec_id") % 2 == 0), "vec_id", "embedding",
        centroids=cents, exact_decimal=True,
    )
    idx.append(emb.filter(F.col("vec_id") % 2 == 1))

    q = emb.filter(F.col("vec_id") < 8)
    kw = dict(k=4, n_probe=3, exact_decimal=True)
    via_index = sorted(map(tuple, knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding", cents,
        assigned=idx.assigned(spark), **kw).collect()))
    per_call = sorted(map(tuple, knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding", cents,
        **kw).collect()))
    assert via_index == per_call


def test_empty_seed_build_then_append(spark, tmp_path):
    """Streaming loops build on empty seeds — a file-less vectors dir
    must read back (explicit schema from meta, never inference), and
    the first append must populate it under the frozen centroids."""
    emb = _emb(spark)
    cents = _frozen_cents(emb)
    idx = IvfIndex(str(tmp_path / "idx"))
    idx.build(
        emb.filter(F.lit(False)), "vec_id", "embedding",
        centroids=cents, exact_decimal=True,
    )
    h0 = idx.health(spark)
    assert h0["n_rows"] == 0 and h0["duplication_ratio"] == 1.0
    assert h0["empty_clusters"] == 16 and not h0["stale"]
    assert idx.assigned(spark).count() == 0
    res = idx.append(emb.filter(F.col("vec_id") < 50))
    assert res["appended"] == 50
    one = IvfIndex(str(tmp_path / "one"))
    one.build(
        emb.filter(F.col("vec_id") < 50), "vec_id", "embedding",
        centroids=cents, exact_decimal=True,
    )
    assert _rows(idx, spark) == _rows(one, spark)
