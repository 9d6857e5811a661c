"""Round-9 profiling: where does the banded KNN-graph build spend
its time at scale, stage by stage, vs the flat (IVF) build?

Times each CTE prefix of knn_graph_lsh (hybrid Spark path, literal
r_bits from auto_r_bits) by materializing successively longer
prefixes with a cheap count, at a chosen scale_data corpus.

Usage: python tools/profile_graph_build_r9.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from aurora_cdc_demo_spark.operators import similarity as sim  # noqa: E402
from aurora_cdc_demo_spark.session import get_spark  # noqa: E402
from aurora_cdc_demo_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1"
    spark = get_spark()
    load_table(spark, sf, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    bits = sim.auto_r_bits(spark, sf)
    n = spark.table("embeddings").count()
    print(f"corpus: {n} vectors, r_bits={bits}")

    ctes = sim._lsh_band_ctes("spark", r_bits=bits, prefix_planes=True)

    def t(label: str, sql: str) -> None:
        t0 = time.time()
        out = spark.sql(sql).collect()
        print(f"{label:28s} {time.time() - t0:8.1f} s  -> {out[0][0]}")

    t("bits+keys (count)", f"WITH {ctes} SELECT COUNT(*) FROM keys")
    t(
        "bands explode (count)",
        f"WITH {ctes} SELECT COUNT(*) FROM bands",
    )
    t(
        "pair join, no distinct",
        f"""WITH {ctes.split(', cand AS')[0]}
        SELECT COUNT(*) FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        AND a.vec_id < b.vec_id""",
    )
    t("cand DISTINCT (count)", f"WITH {ctes} SELECT COUNT(*) FROM cand")
    full = sim.knn_graph_lsh_sql("spark", r_bits=bits, prefix_planes=True)
    t("full graph (count)", f"SELECT COUNT(*) FROM ({full})")

    flat = sim.knn_graph_sql("spark")
    t("flat IVF graph (count)", f"SELECT COUNT(*) FROM ({flat})")


if __name__ == "__main__":
    main()
