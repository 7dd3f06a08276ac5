"""k-means over embeddings: assignment math, determinism, and shape.
The full pipeline-vs-DuckDB equality runs in test_oracle.py (the
kmeans_embeddings oracle entry)."""

import numpy as np


class TestAssignMath:
    def test_argmin_tie_breaks_low_index(self):
        from pdf_parser_ray.pipelines.cluster import _assign

        cents = np.array([[1.0, 0.0], [-1.0, 0.0]])
        # equidistant point -> cluster 0 (numpy argmin takes the first)
        a = _assign(np.array([[0.0, 5.0]]), cents)
        assert a.tolist() == [0]

    def test_nearest_wins(self):
        from pdf_parser_ray.pipelines.cluster import _assign

        cents = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
        pts = np.array([[1.0, 1.0], [9.0, 1.0], [1.0, 9.0]])
        assert _assign(pts, cents).tolist() == [0, 1, 2]

    def test_init_formula(self):
        from pdf_parser_ray.pipelines.cluster import _init_centroids

        c = _init_centroids(8, 64)
        assert c.shape == (8, 64)
        assert c[0, 0] == (((0 * 61 + 0 * 53) % 41) - 20) / 20.0
        assert c[3, 5] == (((3 * 61 + 5 * 53) % 41) - 20) / 20.0
        assert (np.abs(c) <= 1.0).all()


class TestPipeline:
    def test_deterministic_and_complete(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.cluster import KM_K, kmeans_embeddings

        sf = "/root/testdata/sf0.001"
        a = kmeans_embeddings(sf).to_pandas().sort_values("vec_id")
        b = kmeans_embeddings(sf).to_pandas().sort_values("vec_id")
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
        want_ids = set(
            pq.read_table(sf + "/embeddings.parquet", columns=["vec_id"])
            .column("vec_id")
            .to_pylist()
        )
        assert set(a.vec_id) == want_ids
        assert a.cluster.between(0, KM_K - 1).all()
        # the deterministic init should split this corpus non-trivially
        assert a.cluster.nunique() > 1


class TestSemanticDedup:
    def test_planted_clones_dropped(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.cluster import semantic_dedup
        from pdf_parser_ray.pipelines.dedup import NEAR_DUP_ID_OFFSET

        df = semantic_dedup("/root/testdata/sf0.001").to_pandas()
        clones = df[df.vec_id >= NEAR_DUP_ID_OFFSET]
        originals = df[df.vec_id < NEAR_DUP_ID_OFFSET]
        assert len(clones) > 0
        # clones share a cluster with their (smaller-id) original in the
        # overwhelming majority of cases -> dropped; allow the odd
        # cluster-boundary split (the method's documented limitation)
        assert (clones.keep == 0).mean() >= 0.8
        # at cosine >= 0.95, unrelated originals never collide: every
        # original is kept unless it exactly duplicates a smaller id
        assert (originals.keep == 1).mean() >= 0.95


class TestKnnQuantized:
    def test_quantizer_bounds_and_recall(self, ray_session, quiet_data_context):
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.io_util import list_column_matrix
        from pdf_parser_ray.pipelines.similarity import (
            QUANT_LEVELS,
            _quant_scale,
            _quantize,
            knn_cosine,
            knn_quantized,
        )

        sf = "/root/testdata/sf0.001"
        a = _quant_scale(sf)
        t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        vecs = list_column_matrix(t.column("embedding"))
        assert a == np.abs(vecs).max()  # calibration fold is exact
        q = _quantize(vecs, a)
        assert q.dtype == np.int64
        assert np.abs(q).max() == QUANT_LEVELS  # the scale is tight
        # |x| <= A -> x*L/A in [-L, L] -> floor stays in [-L, L]
        assert q.min() >= -QUANT_LEVELS and q.max() <= QUANT_LEVELS
        # 8-bit quantization of unit-norm vectors keeps high recall
        # against the exact cosine top-k
        approx = set(knn_quantized(sf, k=10).to_pandas()["vec_id"])
        exact = set(knn_cosine(sf, k=10).to_pandas()["vec_id"])
        assert len(approx & exact) >= 7


class TestPCAEmbeddings:
    def test_gram_fold_and_projection_invariants(self, ray_session,
                                                 quiet_data_context):
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.io_util import list_column_matrix
        from pdf_parser_ray.pipelines.similarity import (
            _quant_scale,
            _quantize,
            pca_embeddings,
        )

        sf = "/root/testdata/sf0.001"
        got = pca_embeddings(sf, n_components=3).to_pandas()
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        vecs = list_column_matrix(t.column("embedding"))
        n = len(vecs)
        assert len(got) == 3 * n
        assert set(got["component"]) == {0, 1, 2}
        # brute-force: same quantization, single-shot Gram + eigh
        q = _quantize(vecs, _quant_scale(sf)).astype(np.float64)
        evals, evecs = np.linalg.eigh(q.T @ q)
        order = np.argsort(evals)[::-1][:3]
        comps = evecs[:, order]
        for j in range(3):
            i = int(np.argmax(np.abs(comps[:, j])))
            if comps[i, j] < 0:
                comps[:, j] = -comps[:, j]
        expect = np.floor((q @ comps) * 1e6).astype(np.int64)
        ids = t.column("vec_id").to_numpy()
        by_id = {int(v): expect[r] for r, v in enumerate(ids)}
        for vid, grp in got.groupby("vec_id"):
            vals = grp.sort_values("component")["proj_micros"].to_numpy()
            assert (vals == by_id[int(vid)]).all()
        # variance ordering: component 0 carries the most energy
        var = got.groupby("component")["proj_micros"].apply(
            lambda s: float(np.var(s.to_numpy(np.float64)))
        )
        assert var[0] >= var[1] >= var[2]


class TestKnnMMR:
    def test_matches_brute_force_and_diversifies(
        self, ray_session, quiet_data_context
    ):
        """Pure-Python greedy MMR over the same trunc-millis integers
        must reproduce the pipeline's picks exactly, and the diversity
        term must BIND (selection differs from plain relevance top-k)."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.similarity import (
            MMR_K, MMR_LAMBDA_COMP, MMR_LAMBDA_NUM, MMR_POOL, knn_mmr,
        )

        sf = "/root/testdata/sf0.001"
        got = knn_mmr(sf)

        t = pq.read_table(sf + "/embeddings.parquet")
        ids = np.array(t.column("vec_id").to_pylist(), np.int64)
        V = np.array(
            [r.as_py() for r in t.column("embedding")], dtype=np.float64
        )
        q = V[list(ids).index(0)]
        keep = ids != 0
        ids, V = ids[keep], V[keep]
        rel = np.trunc(
            (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q)) * 1000
        ).astype(np.int64)
        order = np.lexsort((ids, -rel))[:MMR_POOL]
        ids, V, rel = ids[order], V[order], rel[order]
        norms = np.linalg.norm(V, axis=1)
        sims = np.trunc(
            (V @ V.T) / np.outer(norms, norms) * 1000
        ).astype(np.int64)

        chosen: list[int] = []
        chosen_scores: list[int] = []
        remaining = list(range(len(ids)))
        while len(chosen) < MMR_K and remaining:
            best, best_score = None, None
            for i in remaining:
                if chosen:
                    ms = max(int(sims[i, j]) for j in chosen)
                    sc = MMR_LAMBDA_NUM * int(rel[i]) - MMR_LAMBDA_COMP * ms
                else:
                    sc = MMR_LAMBDA_NUM * int(rel[i])
                if (
                    best is None
                    or sc > best_score
                    or (sc == best_score and ids[i] < ids[best])
                ):
                    best, best_score = i, sc
            chosen.append(best)
            chosen_scores.append(best_score)
            remaining.remove(best)

        assert got["vec_id"].tolist() == [int(ids[i]) for i in chosen]
        assert got["mmr_score"].tolist() == chosen_scores
        assert got["rank"].tolist() == list(range(1, MMR_K + 1))
        # negative-cosine regression (the r04 bug: a 0-initialized
        # max-to-selected silently clamps negative sims): the fixture
        # must exercise at least one negative max so the score
        # equality above actually pins the -inf initialization
        assert any(
            max(int(sims[i, j]) for j in chosen[:r]) < 0
            for r, i in list(enumerate(chosen))[1:]
        )
        # diversity must bind: MMR differs from plain relevance top-k
        plain = [int(ids[i]) for i in range(MMR_K)]
        assert got["vec_id"].tolist() != plain


class TestEmbeddingOutliers:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Exact-integer centroid deviation vs a numpy brute force; the
        n^2-scaled score must rank identically to the true quantized
        deviation."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.similarity import (
            OUTLIER_K, QUANT_LEVELS, embedding_outliers,
        )

        sf = "/root/testdata/sf0.001"
        got = embedding_outliers(sf).to_pandas()
        assert len(got) == OUTLIER_K
        t = pq.read_table(sf + "/embeddings.parquet")
        ids = t.column("vec_id").to_numpy()
        vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        a = np.abs(vecs).max()
        q = np.floor(vecs * float(QUANT_LEVELS) / a).astype(np.int64)
        n = len(q)
        s = q.sum(axis=0)
        d2 = ((q * n - s[None, :]) ** 2).sum(axis=1)
        order = np.lexsort((ids, -d2))[:OUTLIER_K]
        assert got["vec_id"].tolist() == ids[order].tolist()
        assert got["dev2"].tolist() == d2[order].tolist()
        # same ranking as the true quantized deviation (mean never formed)
        true_dev = ((q - q.mean(axis=0)[None, :]) ** 2).sum(axis=1)
        assert np.argsort(-d2, kind="stable").tolist() == np.argsort(
            -true_dev, kind="stable"
        ).tolist()


class TestCosineBandHistogram:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Ring-sampled quantized-dot band counts vs a numpy brute
        force; pair count conserves n x |offsets| and the histogram
        must have real spread."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.similarity import (
            QUANT_LEVELS, SIM_BAND_STEP, SIM_OFFSETS, _SIM_BAND_SHIFT,
            cosine_band_histogram,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            cosine_band_histogram(sf)
            .to_pandas()
            .sort_values("band")
            .reset_index(drop=True)
        )
        t = pq.read_table(sf + "/embeddings.parquet")
        ids = t.column("vec_id").to_numpy()
        vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        a = np.abs(vecs).max()
        q = np.floor(vecs * float(QUANT_LEVELS) / a).astype(np.int64)
        byid = {int(i): q[j] for j, i in enumerate(ids)}
        n = len(ids)
        bands = []
        for off in SIM_OFFSETS:
            for i in range(n):
                qdot = int(byid[i] @ byid[(i + off) % n])
                bands.append(
                    (qdot + _SIM_BAND_SHIFT) // SIM_BAND_STEP
                    - _SIM_BAND_SHIFT // SIM_BAND_STEP
                )
        vals, cnts = np.unique(np.array(bands), return_counts=True)
        assert got["band"].tolist() == vals.tolist()
        assert got["n_pairs"].tolist() == cnts.tolist()
        assert got["n_pairs"].sum() == n * len(SIM_OFFSETS)
        assert len(got) >= 5  # real spread at the tuned band step


class TestKnnMulti:
    def test_matches_per_query_brute_force(self, ray_session, quiet_data_context):
        """Batched kNN equals per-query numpy brute force for EVERY
        query in the panel, and equals knn_cosine where they overlap."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.similarity import (
            KNN_MULTI_K, KNN_MULTI_QUERIES, knn_multi,
        )

        sf = "/root/testdata/sf0.001"
        got = knn_multi(sf).to_pandas()
        t = pq.read_table(sf + "/embeddings.parquet")
        ids = t.column("vec_id").to_numpy()
        vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        for qid in KNN_MULTI_QUERIES:
            q = vecs[list(ids).index(qid)]
            mask = ids != qid
            cos = (vecs[mask] @ q) / (
                np.linalg.norm(vecs[mask], axis=1) * np.linalg.norm(q)
            )
            micros = np.trunc(cos * 1_000_000).astype(np.int64)
            order = np.lexsort((ids[mask], -micros))[:KNN_MULTI_K]
            sub = got[got["query_id"] == qid]
            assert sub["vec_id"].tolist() == ids[mask][order].tolist()
            assert sub["cos_micros"].tolist() == micros[order].tolist()
        assert len(got) == len(KNN_MULTI_QUERIES) * KNN_MULTI_K

    def test_agrees_with_knn_cosine(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.similarity import knn_cosine, knn_multi

        sf = "/root/testdata/sf0.001"
        multi = knn_multi(sf).to_pandas()
        single = knn_cosine(sf, query_vec_id=0, k=5).to_pandas()
        sub = multi[multi["query_id"] == 0]
        assert sub["vec_id"].tolist() == single["vec_id"].head(5).tolist()


class TestAnnRecall:
    def test_recall_tiering(self, ray_session, quiet_data_context):
        """The eval harness reproduces the documented ANN tiering on
        the panel: quantized > ivf_kmeans > hyperplane-IVF recall@10,
        and the hyperplane numbers match an independent set compare."""
        from pdf_parser_ray.pipelines.similarity import (
            KNN_MULTI_QUERIES, ann_recall, knn_ivf, knn_ivf_kmeans,
            knn_multi, knn_quantized,
        )

        sf = "/root/testdata/sf0.001"
        rep = ann_recall(sf).set_index("query_id")
        exact = knn_multi(sf, KNN_MULTI_QUERIES, 10).to_pandas()

        def rec(fn):
            tot = 0
            for qid in KNN_MULTI_QUERIES:
                ex = set(
                    exact.loc[exact["query_id"] == qid, "vec_id"].astype(int)
                )
                ap = set(
                    fn(sf, query_vec_id=qid, k=10).to_pandas()["vec_id"]
                    .astype(int)
                )
                tot += len(ex & ap)
            return tot  # out of 50

        ivf_total = int(rep["recall_micros"].sum() * 10 // 1_000_000)
        assert rec(knn_ivf) == ivf_total  # harness == independent compare
        km, qz = rec(knn_ivf_kmeans), rec(knn_quantized)
        assert qz > km > ivf_total  # the documented production tiering
        assert qz >= 45  # quantized: >= 90% mean recall on the panel

    def test_ivf_multi_equals_per_query_ivf(
        self, ray_session, quiet_data_context
    ):
        """The batched probe path (one read of each probed bucket for
        the whole panel) must return exactly knn_ivf's ordered top-k
        per query — including tie-breaks on (cos_micros, vec_id)."""
        from pdf_parser_ray.pipelines.similarity import (
            KNN_MULTI_QUERIES, knn_ivf, knn_ivf_multi,
        )

        sf = "/root/testdata/sf0.001"
        multi = knn_ivf_multi(sf, k=10).to_pandas()
        for qid in KNN_MULTI_QUERIES:
            single = knn_ivf(sf, query_vec_id=qid, k=10).to_pandas()
            m = multi[multi["query_id"] == qid]
            assert list(zip(m["vec_id"], m["cos_micros"])) == list(
                zip(single["vec_id"], single["cos_micros"])
            )


class TestEmbeddingDrift:
    def test_identical_halves_cos_one(self, ray_session, quiet_data_context, tmp_path):
        """Mirrored halves (late = exact copies of early) give cosine
        ~1.0; orthogonal-ish drifted halves score lower."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.similarity import embedding_drift

        rng = np.random.default_rng(7)
        base = rng.normal(size=(8, 16)).astype(np.float32)
        # early ids 0-7, late ids 100-107 with IDENTICAL vectors
        ids = list(range(8)) + list(range(100, 108))
        vecs = np.concatenate([base, base])
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs],
                        pa.list_(pa.float32()),
                    ),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        r = embedding_drift(str(tmp_path)).iloc[0]
        assert int(r["n_early"]) == 8 and int(r["n_late"]) == 8
        assert int(r["cos_micros"]) >= 995_000  # ~1 up to quantization

    def test_shifted_half_scores_lower(self, ray_session, quiet_data_context, tmp_path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.similarity import embedding_drift

        rng = np.random.default_rng(11)
        early = rng.normal(size=(8, 16)).astype(np.float32)
        late = (rng.normal(size=(8, 16)) + 3.0).astype(np.float32)  # shifted
        ids = list(range(8)) + list(range(100, 108))
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in np.concatenate([early, late])],
                        pa.list_(pa.float32()),
                    ),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        r = embedding_drift(str(tmp_path)).iloc[0]
        assert int(r["cos_micros"]) < 900_000
