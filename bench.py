"""Per-round benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], then the encode job on the deterministic token
table at two parallelism levels (N=CPUS/4 and 4N=CPUS cores — the in-sandbox
stand-in for the north rule's N vs 4N executors), and prints ONE JSON line:

  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "encode": {...}}

Queries are forced with a noop write (count() would let Catalyst prune the
compute). Timings exclude session startup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "a1_daily_rollup",
    "star_join_revenue",
    "j1_label_join_dedup",
    "a3_two_level_capacity",
    "w1_ratio_normalize",
    "j11_suffix_theta_join",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "text_quality",
    "multimodal_decode_meta",
]

N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_queries(sf_dir: str, cpus: int) -> dict[str, float]:
    from poc_parquet_aggregator_spark.operators import QUERIES
    from poc_parquet_aggregator_spark.plans import get_spark, stop_spark

    spark = get_spark("bench_queries", cores=cpus)
    # JVM/codegen warmup so q1 isn't charged for JIT
    _force(spark.read.parquet(f"{sf_dir}/nation.parquet"))
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _force(QUERIES[name](spark, sf_dir))
        out[name] = round(time.time() - t0, 3)
    stop_spark()
    return out


def run_encode(cpus: int, tag: str) -> dict:
    from poc_parquet_aggregator_spark.encode import decode_verify, encode_dataset
    from poc_parquet_aggregator_spark.plans import get_spark, stop_spark
    from poc_parquet_aggregator_spark.sources import write_token_table

    data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "tokens_bench")
    if not os.path.exists(data_dir) or not os.listdir(data_dir):
        write_token_table(data_dir, N_BENCH_DOCS, docs_per_file=12_500)
    out_dir = f"/tmp/bench_encode_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    spark = get_spark(f"bench_encode_{tag}", cores=cpus)
    # warmup (JVM + python worker pool) on a single file
    files = sorted(os.listdir(data_dir))
    encode_dataset(spark, [os.path.join(data_dir, files[0])], out_dir + "_warm")
    shutil.rmtree(out_dir + "_warm", ignore_errors=True)
    m = encode_dataset(spark, data_dir, out_dir)
    verify = decode_verify(spark, data_dir, out_dir)
    stop_spark()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "cores": cpus,
        "tokens": m["n_tokens"],
        "wall_s": round(m["wall_s"], 3),
        "tokens_per_s": round(m["tokens_per_s"]),
        "ratio_vs_parquet_zstd": round(m["ratio_vs_parquet_zstd"], 4),
        "bit_identical": bool(verify["bit_identical"]),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    queries = run_queries(sf_dir, cpus)

    n_small = max(cpus // 4, 1)
    enc_small = run_encode(n_small, f"n{n_small}")
    enc_big = run_encode(cpus, f"n{cpus}")
    eff = enc_big["tokens_per_s"] / (4.0 * enc_small["tokens_per_s"])

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "encode": {
                    f"local[{n_small}]": enc_small,
                    f"local[{cpus}]": enc_big,
                    "scaling_efficiency": round(eff, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
