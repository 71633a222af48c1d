"""Similarity-search extension tests beyond the oracle gate: the fast
NumPy path must agree with the exact-decimal path on ranking."""

from __future__ import annotations

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans

from conftest import SF_ORACLE


def test_fast_path_matches_exact_ranking(spark):
    exact = plans.get("sim_cosine_topk").fn(spark, SF_ORACLE).collect()
    fast = plans.get("sim_cosine_topk_fast").fn(spark, SF_ORACLE).collect()
    assert [r.vec_id for r in exact] == [r.vec_id for r in fast]
    # both paths share the quantized-integer discipline: cosines are
    # BIT-identical, not merely close.
    for e, f in zip(exact, fast):
        assert e.cosine == f.cosine


def test_lsh_topk_subset_of_bucket(spark):
    rows = plans.get("sim_cosine_topk_lsh").fn(spark, SF_ORACLE).collect()
    assert rows, "query bucket should contain neighbors"
    assert len({r.bucket for r in rows}) == 1


class TestEmbNearDupDuplicateHeavy:
    def test_dup_heavy_corpus_matches_oracle_bitwise(self, spark, tmp_path):
        """Round-4 regression: the exact-dup collapse's within-group leg
        must emit the ORACLE's float expression n2/(sqrt(n2)*sqrt(n2)) —
        which is NOT bit-equal to a literal 1.0 for most norms
        (sqrt(2)^2 = 1.9999999999999998) — and exclude zero-norm
        duplicates (oracle: 0/0 -> NULL -> dropped). The stock testdata
        has no duplicate embeddings, so this builds a corpus that does."""
        import random

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __spark_entry__ as e
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import (
            plans,
        )

        rnd = random.Random(7)
        root = str(tmp_path)
        base = [rnd.uniform(-0.5, 0.5) for _ in range(64)]
        ids, vecs, labels = [], [], []
        for i in range(20):
            ids.append(i)
            vecs.append([rnd.uniform(-0.5, 0.5) for _ in range(64)])
            labels.append("r")
        for k in (100, 101, 102):  # identical triple
            ids.append(k)
            vecs.append(list(base))
            labels.append("d")
        near = [x + 1e-6 for x in base]
        for k in (200, 201):  # identical pair, near the triple
            ids.append(k)
            vecs.append(list(near))
            labels.append("n")
        for k in (300, 301):  # duplicate ZERO vectors: oracle drops (0/0)
            ids.append(k)
            vecs.append([0.0] * 64)
            labels.append("z")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                    "label": pa.array(labels),
                }
            ),
            f"{root}/embeddings.parquet",
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{root}/embeddings.parquet')"
        )
        l = plans.get("emb_near_dup_pairs").fn(spark, root).toPandas()
        r = con.execute(e.oracle_sql()["emb_near_dup_pairs"]).df()

        def canon(d):
            d = d.reindex(sorted(d.columns), axis=1)
            return d.sort_values(list(d.columns), ignore_index=True)

        l, r = canon(l), canon(r)
        assert l.shape == r.shape and l.equals(r), (l, r)
        # the duplicate groups actually exercised the within-group leg
        pairs = {(int(a), int(b)) for a, b in zip(l["vec_a"], l["vec_b"])}
        assert {(100, 101), (100, 102), (101, 102), (200, 201)} <= pairs
        assert not any(a >= 300 for a, _ in pairs)  # zero-norm dups dropped


class TestAdaptiveBanding:
    """Round-7 100x probe follow-up: 8-bit bands cost O(n^2/256) in
    distinct vectors (measured 550 s at 200k vs 8 s for 16-bit), so the
    registered query widens bands by distinct-vector count."""

    def test_band_bits_by_distinct_count(self):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.similarity import (  # noqa: E501
            EMB_BAND_BITS,
            EMB_BAND_BITS_SCALE,
            EMB_BAND_OCCUPANCY_BOUND,
            _near_dup_band_bits,
        )

        edge = EMB_BAND_OCCUPANCY_BOUND * 256  # expected occupancy bound
        assert _near_dup_band_bits(1) == EMB_BAND_BITS
        assert _near_dup_band_bits(2000) == EMB_BAND_BITS  # sf0.1 scale
        assert _near_dup_band_bits(edge) == EMB_BAND_BITS
        assert _near_dup_band_bits(edge + 1) == EMB_BAND_BITS_SCALE
        assert _near_dup_band_bits(200_000) == EMB_BAND_BITS_SCALE

    def test_wide_bands_keep_near_dup_recall(self, spark, tmp_path):
        """The 16-bit branch trades away only the low-cosine tail:
        genuine near-dups (cosine -> 1; sign flips only where a
        coordinate sits near zero) must still collide in >=1 band.
        Distinct-byte near-copies, so digest-collapse cannot fold them."""
        import random

        import pyarrow as pa
        import pyarrow.parquet as pq

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.similarity import (  # noqa: E501
            emb_near_dup_pairs_plan,
        )
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (  # noqa: E501
            load_table,
        )

        rnd = random.Random(11)
        ids, vecs = [], []
        for g in range(6):  # 6 groups of 3 near-copies, far from zero
            base = [rnd.choice((-1.0, 1.0)) * rnd.uniform(0.3, 0.9)
                    for _ in range(64)]
            for m in range(3):
                ids.append(g * 10 + m)
                vecs.append([x + rnd.uniform(-1e-3, 1e-3) for x in base])
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                    "label": pa.array(["g"] * len(ids)),
                }
            ),
            f"{tmp_path}/embeddings.parquet",
        )
        emb = load_table(spark, str(tmp_path), "embeddings")
        got = {
            (r.vec_a, r.vec_b)
            for r in emb_near_dup_pairs_plan(emb, band_bits=16).collect()
        }
        for g in range(6):
            want = {
                (g * 10, g * 10 + 1),
                (g * 10, g * 10 + 2),
                (g * 10 + 1, g * 10 + 2),
            }
            assert want <= got, f"group {g} lost near-dup pairs at 16-bit"


class TestExactThresholdJoin:
    """exact_threshold_join: the cluster bound must PRUNE on clustered
    data and stay EXACT regardless."""

    def _clustered(self, spark, n_per=12, dim=8):
        # 4 tight clusters around near-orthogonal directions: members
        # are the base direction with one coordinate jittered slightly
        import pyspark.sql.functions as F

        rows = []
        bases = [
            [1.0] + [0.0] * (dim - 1),
            [0.0, 1.0] + [0.0] * (dim - 2),
            [0.0, 0.0, 1.0] + [0.0] * (dim - 3),
            [0.0, 0.0, 0.0, 1.0] + [0.0] * (dim - 4),
        ]
        # interleave ids so the deterministic init (smallest k vec_ids)
        # lands one centroid in each cluster
        for m in range(n_per):
            for bi, b in enumerate(bases):
                v = list(b)
                v[dim - 1] = 0.01 * (m + 1)  # tiny within-cluster spread
                rows.append((m * len(bases) + bi, v))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_prunes_and_stays_exact(self, spark):
        import math

        import pyspark.sql.functions as F

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.similarity import (
            dot_long,
            quantized_elements,
        )
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.similarity import (
            exact_threshold_join,
        )

        emb = self._clustered(spark)
        out, survived, total = exact_threshold_join(spark, emb, tau=0.95, k=4)
        got = {(r.vec_a, r.vec_b) for r in out.collect()}
        # cross-cluster cell pairs are provably below tau: pruned
        assert survived < total, (survived, total)
        assert survived <= 4 + 2  # ~diagonal only (radii are tiny)
        # brute force the ground truth with the same quantized math
        q = emb.select(
            "vec_id", quantized_elements(F.col("embedding")).alias("qx")
        ).withColumn("n2", dot_long(F.col("qx"), F.col("qx")))
        a = q.select(
            F.col("vec_id").alias("vec_a"),
            F.col("qx").alias("xa"),
            F.col("n2").alias("na"),
        )
        b = q.select(
            F.col("vec_id").alias("vec_b"),
            F.col("qx").alias("xb"),
            F.col("n2").alias("nb"),
        )
        cosine = dot_long(F.col("xa"), F.col("xb")).cast("double") / (
            F.sqrt(F.col("na").cast("double"))
            * F.sqrt(F.col("nb").cast("double"))
        )
        want = {
            (r.vec_a, r.vec_b)
            for r in a.crossJoin(b)
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", cosine.alias("cosine"))
            .filter(F.col("cosine") >= 0.95)
            .collect()
        }
        assert got == want and len(want) > 0

    def test_zero_vectors_excluded(self, spark):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.similarity import (
            exact_threshold_join,
        )

        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [1.0, 0.0]),
                (2, [0.0, 0.0]),  # zero norm: cosine undefined, dropped
            ],
            "vec_id long, embedding array<float>",
        )
        out, _s, _t = exact_threshold_join(spark, emb, tau=0.9, k=2)
        assert {(r.vec_a, r.vec_b) for r in out.collect()} == {(0, 1)}


class TestSemanticDedup:
    """SemDeDup keeper rule: among semantic duplicates the example
    FARTHEST from its centroid survives; exact ties fall to vec_id."""

    def test_identical_vectors_keep_exactly_one(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans import (
            similarity as S,
        )

        # 8 base directions seed the centroids (vec_id < K); vecs 100/101
        # are identical clones of direction 0 -> same cluster, cosine 1.0
        dim = 64
        rows = []
        for k in range(8):
            v = [0.0] * dim
            v[k] = 1.0
            rows.append((k, v))
        clone = [0.0] * dim
        clone[0] = 1.0
        rows += [(100, clone), (101, clone)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        m = S._km_two_round(emb).withColumn(
            "cosc", F.col("score") / F.sqrt(F.col("n2x").cast("double"))
        )
        by_cluster = {
            int(r.vec_id): int(r.cluster) for r in m.collect()
        }
        assert by_cluster[100] == by_cluster[101] == by_cluster[0]


class TestKmAssignFoldedEquivalence:
    """The two nearest-centroid assignment paths — inlined-expression
    (small K, the oracle scale) and folded-literal explode + map-side
    max_by (large K, the 100 TB SemDeDup shape) — must agree to the
    cluster AND the bit on the score, or the scaled branch would change
    SemDeDup verdicts the oracle can never see."""

    def test_paths_agree_on_oracle_corpus(self, spark):
        import pyspark.sql.functions as F

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans import (
            similarity as S,
        )
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (  # noqa: E501
            load_table,
        )

        emb = load_table(spark, SF_ORACLE, "embeddings")
        qdf = (
            emb.select(
                "vec_id",
                S.quantized_elements(F.col("embedding")).alias("qx"),
            )
            .withColumn("n2x", S.dot_long(F.col("qx"), F.col("qx")))
            .filter(F.col("n2x") > 0)
        )
        init = emb.filter(F.col("vec_id") < 8).select(
            "vec_id", "embedding"
        ).collect()
        cents = sorted(
            (int(r["vec_id"]), S.quantize_vector(list(r["embedding"])))
            for r in init
        )
        # include a degenerate all-zero centroid: both paths must score
        # it -2.0 (below any cosine)
        cents.append((8, [0] * len(cents[0][1])))
        a = {
            int(r.vec_id): (int(r.cluster), float(r.score))
            for r in S._km_assign(qdf, cents).collect()
        }
        b = {
            int(r.vec_id): (int(r.cluster), float(r.score))
            for r in S._km_assign_folded(qdf, cents).collect()
        }
        assert a == b
        # the matmul kernel (the round-8 large-K path that replaced the
        # folded explode in _km_two_round) must agree to the bit too —
        # int64 matmul keeps dots exact where float64 BLAS would round
        c = {
            int(r.vec_id): (int(r.cluster), float(r.score))
            for r in S._km_assign_matmul(qdf, cents).collect()
        }
        assert a == c

    def test_semantic_dedup_scaled_k_bounds_clusters(self, spark, tmp_path):
        """With n > KMEANS_K * TARGET the pipeline must actually scale K
        (pair volume stays ~n * target): run the internal kmeans at the
        k emb_semantic_dedup would derive and check cluster count."""
        import pyspark.sql.functions as F

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans import (
            similarity as S,
        )

        n = 3000
        emb = spark.range(0, n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.hash(F.col("id") * 64 + i) % 1000).cast("float")
                    / 1000.0
                    for i in range(64)  # the pipeline's EMB_DIM
                ]
            ).alias("embedding"),
        )
        k = max(S.KMEANS_K, n // S.SEMDEDUP_TARGET_CLUSTER)
        assert k == 10  # the scaled branch, past _KM_FOLDED_THRESHOLD? no:
        # k=10 <= threshold 32 -> still the literal path; force the
        # folded path explicitly to prove it handles a real corpus
        m = S._km_two_round(emb, k=k)
        sizes = {
            int(r.cluster): int(r.n)
            for r in m.groupBy("cluster").agg(F.count("*").alias("n")).collect()
        }
        assert len(sizes) <= k
        assert sum(sizes.values()) == n
