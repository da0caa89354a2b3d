"""Stage decomposition of the dedup-family queries (noop-sink per stage,
interleaved reps) — locates remaining headroom before any change
(guide §1)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rove_spark.plans.driver_queries import SIMHASH_MAX_HAMMING, _utc, read_table  # noqa: E402
from rove_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile_dedup", master=f"local[{cpus}]")
    _utc(spark)
    from rove_spark.operators.dedup import (
        collapse_exact_duplicates,
        dedup_components_collapsed,
        minhash_dedup,
        simhash_dedup,
        with_simhash_portable,
    )

    docs = read_table(spark, sf_dir, "documents")

    def sim_collapse():
        reps, members = collapse_exact_duplicates(docs, "text", "doc_id")
        return reps

    def sim_signed():
        reps, members = collapse_exact_duplicates(docs, "text", "doc_id")
        return with_simhash_portable(reps, text_col="text")

    def sim_pairs_only():
        reps, members = simhash_dedup(
            docs, max_hamming=SIMHASH_MAX_HAMMING, blocks=4, portable=True,
            expand_members=False,
        )
        return reps

    def sim_full():
        return simhash_dedup(
            docs, max_hamming=SIMHASH_MAX_HAMMING, blocks=4, portable=True
        )

    def mh_pairs_only():
        rep_pairs, members = minhash_dedup(docs, threshold=0.5, expand_members=False)
        return rep_pairs

    def mh_full():
        return minhash_dedup(docs, threshold=0.5)

    def clusters_full():
        rep_pairs, members = minhash_dedup(docs, threshold=0.5, expand_members=False)
        return dedup_components_collapsed(rep_pairs, members)

    stages = {
        "sim_collapse": sim_collapse,
        "sim_signed": sim_signed,
        "sim_pairs_only": sim_pairs_only,
        "sim_full": sim_full,
        "mh_pairs_only": mh_pairs_only,
        "mh_full": mh_full,
        "clusters_full": clusters_full,
    }
    samples = {s: [] for s in stages}
    for rep in range(3):
        for s, mk in stages.items():
            spark.sparkContext.setJobDescription(f"{s} rep{rep}")
            t0 = time.time()
            noop(mk())
            samples[s].append(round(time.time() - t0, 3))
    print("mins:", {s: min(v) for s, v in samples.items()})
    print("samples:", samples)
    # cardinalities for context
    reps, members = collapse_exact_duplicates(docs, "text", "doc_id")
    print("docs:", docs.count(), "reps:", reps.count())
    rep_pairs, members = minhash_dedup(docs, threshold=0.5, expand_members=False)
    print("mh rep_pairs:", rep_pairs.count())
    sp, smem = simhash_dedup(docs, max_hamming=SIMHASH_MAX_HAMMING, blocks=4,
                             portable=True, expand_members=False)
    print("sim rep_pairs:", sp.count(), "sim full pairs:", sim_full().count())
    spark.stop()


if __name__ == "__main__":
    main()
