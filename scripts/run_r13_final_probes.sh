#!/bin/bash
cd /root/repo || exit 1
SMOKE_SCALE=1000 SMOKE_SHUFFLE=256 SPARK_GRAFT_DRIVER_MEM=48g \
  SMOKE_ONLY="similarity_bitext_pairs(12lang)" \
  SMOKE_OUT=SMOKE_r13_1000x_bitext_multilang_final.json \
  timeout 3600 python scripts/smoke_scale.py \
  > PROBE_r13_1000x_bitext_multilang_final_stages.log 2>/dev/null
echo "$(date +%H:%M:%S) multilang final done $?" >> R13_PROBE_CHAIN.log
SMOKE_SCALE=1000 SMOKE_SHUFFLE=256 SPARK_GRAFT_DRIVER_MEM=48g \
  SG_BLOCK_PAIR_CAP=4000000 \
  SMOKE_ONLY="embedding_knn_graph" \
  SMOKE_OUT=SMOKE_r13_1000x_knn_paircap4m.json \
  timeout 5400 python scripts/smoke_scale.py \
  > PROBE_r13_1000x_knn_paircap4m_stages.log 2>/dev/null
echo "$(date +%H:%M:%S) knn 4M done $?" >> R13_PROBE_CHAIN.log
