"""Dedup-first banded-Hamming near-duplicate pair summary.

One operator for every 64-bit perceptual fingerprint modality (image
aHash, audio chunk-energy hash — ``functions/multimodal``): collapse
exact fingerprint classes to DISTINCT hashes + multiplicity BEFORE
banding, band-join only distinct hashes (8 bands x 8 bits; pigeonhole
recall 1.0 for Hamming <= 3), and recover the per-Hamming pair counts
AND the exact modular pair checksum arithmetically — C(m,2) within an
exact class, m_a*m_b across verified class pairs; the checksum
sum((min*K + max) % P) decomposes as sum(x) - P*sum(floor(x/P)), whose
rank terms come from one cumulative window per class/pair and whose
mod-P wrap count is answered by rank-lookup probe rows merged into the
SAME sort. O(m log m) per class, never O(m^2) — candidate mass is
O(distinct^2), independent of duplicate multiplicity.

Extracted in round 12 from ``plans/multimodal.py::multimodal_image_near_dups``
(where the design rationale and the SQL twin live) so the audio modality
reuses it verbatim. Exactness under forced mod-P wraps is pinned by
``tests/test_multimodal.py::test_image_near_dups_dedup_first_is_exact_under_mod_wraps``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: banding geometry: 64 bits as 8 bands of 8 — pigeonhole over
#: Hamming <= 3 leaves >= 5 identical bands, so the band-bucket
#: equi-join has recall 1.0 for the verify threshold.
BANDS, BITS, HMAX = 8, 8, 3
PER_WORD = 4  # 32-bit words -> 4 bands each

#: checksum spec shared with the SQL oracles:
#: sum((doc_a * K + doc_b) % P) per Hamming bucket.
K, P = 100000, 1000000007
_DEC = "decimal(38,0)"


def hamming_pair_summary(fp: DataFrame) -> DataFrame:
    """fp(doc_id, ahash_lo, ahash_hi) -> (hamming, n_pairs, pair_checksum).

    ``fp`` should already be materialized (``partitioning.shared``) by
    the caller — it is traversed by several branches here.
    """
    from .partitioning import shared

    # doc_id in [0, P) keeps kd = doc_id*K exact in BIGINT and makes
    # floor((kd_i + d_j)/P) = kd_i div P + [kd_i % P + d_j >= P] — the
    # identity the wrap accounting below relies on. Enforced, not
    # assumed (the VPIN/OFI order-key guard idiom).
    guard = F.coalesce(
        F.assert_true(
            F.col("doc_id").between(0, P - 1),
            F.lit(
                "hamming_pair_summary: doc_id outside [0, 1e9+6] "
                "breaks the exact checksum wrap arithmetic"
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    kd = F.col("doc_id") * F.lit(K).cast("long") + guard

    # -- collapse exact-duplicate fingerprints to one class row --------
    cls = shared(
        fp.groupBy("ahash_lo", "ahash_hi").agg(
            F.count(F.lit(1)).alias("m"),
            F.max("doc_id").alias("mx"),
            F.sum(F.col("doc_id").cast(_DEC)).alias("sd"),
        )
    )

    # -- band-join DISTINCT fingerprints only --------------------------
    mask = 2**BITS - 1
    bands = []
    for b in range(BANDS):
        word = F.col("ahash_lo") if b < PER_WORD else F.col("ahash_hi")
        shift = (b % PER_WORD) * BITS
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(word, shift).bitwiseAND(F.lit(mask)).alias(
                    "band_val"
                ),
            )
        )
    banded = cls.select(
        "ahash_lo",
        "ahash_hi",
        "m",
        "mx",
        "sd",
        F.explode(F.array(*bands)).alias("bb"),
    ).select("ahash_lo", "ahash_hi", "m", "mx", "sd", "bb.band", "bb.band_val")
    a = banded.alias("a")
    b2 = banded.alias("b")
    key_a = F.struct(F.col("a.ahash_lo"), F.col("a.ahash_hi"))
    key_b = F.struct(F.col("b.ahash_lo"), F.col("b.ahash_hi"))
    hamming = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    ).cast("long")
    cls_pairs = shared(
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (key_a < key_b),
        )
        .select(
            F.col("a.ahash_lo").alias("lo_a"),
            F.col("a.ahash_hi").alias("hi_a"),
            F.col("b.ahash_lo").alias("lo_b"),
            F.col("b.ahash_hi").alias("hi_b"),
            F.col("a.m").alias("m_a"),
            F.col("b.m").alias("m_b"),
            F.col("a.sd").alias("sd_a"),
            F.col("b.sd").alias("sd_b"),
            F.greatest(F.col("a.mx"), F.col("b.mx")).alias("mx"),
        )
        .distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= HMAX)
    )

    # -- Hamming-0: all-member pairs inside each exact class, recovered
    # arithmetically (see module doc). ---------------------------------
    mem = (
        fp.join(cls.filter(F.col("m") >= 2), ["ahash_lo", "ahash_hi"])
        .select("ahash_lo", "ahash_hi", "m", "mx", "doc_id", kd.alias("kd"))
        .withColumn("rho", F.pmod(F.col("kd"), F.lit(P)))
        .withColumn("q", F.expr(f"kd div {P}"))
    )
    thr = F.greatest(F.lit(P).cast("long") - F.col("rho"), F.col("doc_id") + 1)
    probes = mem.filter(thr <= F.col("mx")).select(
        "ahash_lo",
        "ahash_hi",
        "m",
        thr.alias("v"),
        F.lit(1).alias("is_probe"),
        F.lit(0).cast("long").alias("kd"),
        F.lit(0).cast("long").alias("q"),
    )
    mrows = mem.select(
        "ahash_lo",
        "ahash_hi",
        "m",
        F.col("doc_id").alias("v"),
        F.lit(0).alias("is_probe"),
        "kd",
        "q",
    )
    from pyspark.sql import Window

    w_cls = (
        Window.partitionBy("ahash_lo", "ahash_hi")
        .orderBy(F.col("v").asc(), F.col("is_probe").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = mrows.unionByName(probes).withColumn(
        "cum", F.sum(1 - F.col("is_probe")).over(w_cls)
    )
    is_mem = F.col("is_probe") == 0
    s_term = F.when(
        is_mem,
        F.col("kd").cast(_DEC) * (F.col("m") - F.col("cum"))
        + F.col("v").cast(_DEC) * (F.col("cum") - 1),
    ).otherwise(F.lit(0).cast(_DEC))
    w_term = F.when(
        is_mem, F.col("q").cast(_DEC) * (F.col("m") - F.col("cum"))
    ).otherwise((F.col("m") - F.col("cum")).cast(_DEC))
    within_rows = (
        u.groupBy("ahash_lo", "ahash_hi", "m")
        .agg(F.sum(s_term).alias("s"), F.sum(w_term).alias("w"))
        .select(
            F.lit(0).cast("long").alias("hamming"),
            F.expr("(m * (m - 1)) div 2").cast("long").alias("n_pairs"),
            (F.col("s") - F.lit(P).cast(_DEC) * F.col("w")).alias("checksum"),
        )
    )

    # -- Hamming 1..3: members of both classes of each verified pair,
    # tagged by side, one cumulative window per pair; each member
    # contributes as the pair MIN against the other side's suffix. -----
    pk = ["lo_a", "hi_a", "lo_b", "hi_b"]
    carry = [*pk, "hamming", "m_a", "m_b", "sd_a", "sd_b"]
    memA = fp.join(
        cls_pairs,
        (F.col("ahash_lo") == F.col("lo_a"))
        & (F.col("ahash_hi") == F.col("hi_a")),
    ).select(*carry, "mx", F.lit(1).alias("is_a"), "doc_id", kd.alias("kd"))
    memB = fp.join(
        cls_pairs,
        (F.col("ahash_lo") == F.col("lo_b"))
        & (F.col("ahash_hi") == F.col("hi_b")),
    ).select(*carry, "mx", F.lit(0).alias("is_a"), "doc_id", kd.alias("kd"))
    tagged = (
        memA.unionByName(memB)
        .withColumn("rho", F.pmod(F.col("kd"), F.lit(P)))
        .withColumn("q", F.expr(f"kd div {P}"))
    )
    thr2 = F.greatest(F.lit(P).cast("long") - F.col("rho"), F.col("doc_id") + 1)
    cprobes = tagged.filter(thr2 <= F.col("mx")).select(
        *carry,
        "is_a",
        thr2.alias("v"),
        F.lit(1).alias("is_probe"),
        F.lit(0).cast("long").alias("kd"),
        F.lit(0).cast("long").alias("q"),
    )
    crows = tagged.select(
        *carry,
        "is_a",
        F.col("doc_id").alias("v"),
        F.lit(0).alias("is_probe"),
        "kd",
        "q",
    )
    w_pair = (
        Window.partitionBy(*pk)
        .orderBy(F.col("v").asc(), F.col("is_probe").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zero_dec = F.lit(0).cast(_DEC)
    cu = (
        crows.unionByName(cprobes)
        .withColumn(
            "cum_a",
            F.sum(
                F.when(is_mem & (F.col("is_a") == 1), 1).otherwise(0)
            ).over(w_pair),
        )
        .withColumn(
            "cum_b",
            F.sum(
                F.when(is_mem & (F.col("is_a") == 0), 1).otherwise(0)
            ).over(w_pair),
        )
        .withColumn(
            "cs_a",
            F.sum(
                F.when(
                    is_mem & (F.col("is_a") == 1), F.col("v").cast(_DEC)
                ).otherwise(zero_dec)
            ).over(w_pair),
        )
        .withColumn(
            "cs_b",
            F.sum(
                F.when(
                    is_mem & (F.col("is_a") == 0), F.col("v").cast(_DEC)
                ).otherwise(zero_dec)
            ).over(w_pair),
        )
    )
    n_gt = F.when(
        F.col("is_a") == 1, F.col("m_b") - F.col("cum_b")
    ).otherwise(F.col("m_a") - F.col("cum_a"))
    s_gt = F.when(
        F.col("is_a") == 1, F.col("sd_b") - F.col("cs_b")
    ).otherwise(F.col("sd_a") - F.col("cs_a"))
    cs_term = F.when(is_mem, F.col("kd").cast(_DEC) * n_gt + s_gt).otherwise(
        zero_dec
    )
    cw_term = F.when(is_mem, F.col("q").cast(_DEC) * n_gt).otherwise(
        n_gt.cast(_DEC)
    )
    cross_rows = (
        cu.groupBy(*pk, "hamming", "m_a", "m_b")
        .agg(F.sum(cs_term).alias("s"), F.sum(cw_term).alias("w"))
        .select(
            "hamming",
            (F.col("m_a") * F.col("m_b")).cast("long").alias("n_pairs"),
            (F.col("s") - F.lit(P).cast(_DEC) * F.col("w")).alias("checksum"),
        )
    )

    return (
        within_rows.unionByName(cross_rows)
        .groupBy("hamming")
        .agg(
            F.sum("n_pairs").alias("n_pairs"),
            F.sum("checksum").cast("long").alias("pair_checksum"),
        )
    )
