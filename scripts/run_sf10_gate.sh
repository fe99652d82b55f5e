#!/bin/bash
# sf10 (100x) gate — VERDICT r4 Next #1.
# Stage 1: bench (min-of-2, 900s/query timeout, 64g heap)
# Stage 2: cross-implementation differentials (iterative kernels)
# Stage 3: 27 non-recursive DuckDB oracles
set -x
cd /root/repo
export SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=32
SPARK_GRAFT_SF_DIR=/root/repo/.data/sf10 SPARK_GRAFT_TRIALS=2 SPARK_GRAFT_QUERY_TIMEOUT=900 \
  python bench.py > /tmp/bench_sf10.json 2> /tmp/bench_sf10.err
echo "=== bench done rc=$? ==="
python scripts/consistency_sf1.py /root/repo/.data/sf10 > /tmp/consistency_sf10.log 2>&1
echo "=== consistency done rc=$? ==="
python scripts/validate_oracles.py /root/repo/.data/sf10 \
  token_count quality_score lang_id doc_fingerprint exact_dedup \
  minhash_signatures lsh_candidate_pairs jaccard_dedup simhash cosine_topk \
  ann_buckets bucketed_ann sessionize hourly_rollup running_total top_users \
  event_histogram pricing_summary top_revenue_orders order_priority_histogram \
  degree_analytics triangle_count symmetrize in_degree extract_links \
  extract_text page_link_degree > /tmp/oracles_sf10.log 2>&1
echo "=== oracles done rc=$? ==="
