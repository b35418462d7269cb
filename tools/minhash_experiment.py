"""Scratch experiment: restructured minhash_lsh_pairs variants vs baseline.

Run: python tools/minhash_experiment.py [num_hashes] [bands]
Prints time + pair-set hash (baseline at sf0.1 = c52254038a81ae46, 256 pairs).
"""
import sys, time, hashlib

sys.path.insert(0, "/root/repo")
from devcontainers_etl_node_spark.session import get_spark
from pyspark.sql import functions as F
from pyspark import StorageLevel

num_hashes = int(sys.argv[1]) if len(sys.argv) > 1 else 32
bands = int(sys.argv[2]) if len(sys.argv) > 2 else 8
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

spark = get_spark()
spark.range(1_000_000).selectExpr("sum(id)").collect()
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

shingle_k, threshold = 5, 0.5
rows = num_hashes // bands

t_start = time.perf_counter()
base = docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text"))
base = base.repartition(spark.sparkContext.defaultParallelism)
norm = F.lower(F.regexp_replace(F.trim(F.col("_text")), r"\s+", " "))
shingle_rows = (
    base.withColumn("_norm", norm)
    .select(
        "_id",
        "_norm",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("_norm") - (shingle_k - 1), F.lit(1)))
        ).alias("_pos"),
    )
    .select("_id", F.xxhash64(F.col("_norm").substr(F.col("_pos"), F.lit(shingle_k))).alias("_h"))
).persist(StorageLevel.MEMORY_AND_DISK)

# signature as ONE array column (plan width 2 instead of num_hashes+1)
sig = (
    shingle_rows.groupBy("_id")
    .agg(
        *[
            F.min(F.xxhash64(F.shiftleft(F.lit(i + 1), 48).bitwiseXOR(F.col("_h")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    .select("_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("_sig"))
    .persist(StorageLevel.MEMORY_AND_DISK)
)
sig.count()

banded = sig.select(
    "_id",
    F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.lit(b), *[F.col("_sig")[b * rows + i] for i in range(rows)]).alias("bh"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bk"),
).select("_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

cand = (
    banded.alias("a")
    .join(
        banded.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a._id") < F.col("b._id")),
    )
    .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    .dropDuplicates(["id_a", "id_b"])
)

est = (
    F.size(F.filter(F.zip_with(F.col("_sa"), F.col("_sb"), lambda a, b: a == b), lambda x: x)).cast("double")
    / F.lit(float(num_hashes))
)
est_cut = max(0.0, threshold - 2.5 * (threshold * (1 - threshold) / num_hashes) ** 0.5)
cand = (
    cand.join(sig.select(F.col("_id").alias("id_a"), F.col("_sig").alias("_sa")), "id_a")
    .join(sig.select(F.col("_id").alias("id_b"), F.col("_sig").alias("_sb")), "id_b")
    .filter(est >= est_cut)
    .select("id_a", "id_b")
).persist(StorageLevel.MEMORY_AND_DISK)
cand.count()

cand_ids = cand.select(F.col("id_a").alias("_id")).union(cand.select(F.col("id_b"))).distinct()
sh = (
    shingle_rows.join(cand_ids, "_id", "left_semi")
    .groupBy("_id")
    .agg(F.collect_set("_h").alias("_sh"))
    .select("_id", "_sh", F.size("_sh").alias("_n"))
)
n_int = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
verified = (
    cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), F.col("_n").alias("na")), "id_a")
    .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), F.col("_n").alias("nb")), "id_b")
    .withColumn("jaccard_sim", n_int / (F.col("na") + F.col("nb") - n_int))
    .filter(F.col("jaccard_sim") >= threshold)
)
out = verified.select("id_a", "id_b").collect()
dt = time.perf_counter() - t_start
pairs = sorted((r.id_a, r.id_b) for r in out)
h = hashlib.sha256(str(pairs).encode()).hexdigest()[:16]
print(f"COLD nh={num_hashes} b={bands}: {dt:.2f}s pairs={len(pairs)} hash={h}", flush=True)
