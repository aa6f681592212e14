"""Train the q41 contract-query IVF centroids offline (VERDICT r02 #3).

Runs the deterministic ``operators/ivf.kmeans_fit`` on the sf0.01
embeddings fixture once and writes the resulting centroids as JSON
literals next to the operator module. The contract query and its static
SQL oracle both read this file, so:

- the oracle stays static SQL (centroid literals inlined into VALUES),
- the cells are data-adaptive and balanced (the data-independent
  pseudo_centroids degenerated to one giant cell on this corpus —
  BENCH_r02 measured the contract query at 69.8s because of it),
- determinism is preserved: kmeans_fit is partition-invariant and
  hash-sample-seeded, so re-running this tool reproduces the same file.

Usage: python tools/train_ivf_centroids.py [sf_dir]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NLIST, DIM, ITERS = 16, 64, 3
OUT = os.path.join(REPO, "tpc_di_spark", "operators", "ivf_centroids_sf001.json")


def main() -> None:
    import pyspark.sql.functions as F

    from tpc_di_spark.operators.ivf import ivf_assign, kmeans_fit
    from tpc_di_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="train-ivf", cores=8, shuffle_partitions=8)
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = kmeans_fit(e, "vec_id", "embedding", nlist=NLIST, iters=ITERS, dim=DIM)
    sizes = {
        r["centroid_id"]: r["n"]
        for r in ivf_assign(e, "vec_id", "embedding", cents)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = e.count()
    print(f"corpus={n} cells={sorted(sizes.values(), reverse=True)}")
    assert max(sizes.values()) < 0.5 * n, f"cells degenerate: {sizes}"
    with open(OUT, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "nlist": NLIST,
                "dim": DIM,
                "iters": ITERS,
                "cell_sizes": {str(k): v for k, v in sorted(sizes.items())},
                "centroids": cents,
            },
            f,
        )
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
