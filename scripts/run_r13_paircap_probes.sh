#!/bin/bash
# Re-probe chain for the r13 BLOCK_PAIR_CAP fix: the two bitext
# regimes whose scoring stages carried the mis-priced pair-heavy
# bins (multilang 31-38x observed; main-corpus 13.4x in r12), plus
# the kNN graph build whose scoring max task shares the same bound.
cd /root/repo || exit 1
SMOKE_SCALE=1000 SMOKE_SHUFFLE=256 SPARK_GRAFT_DRIVER_MEM=48g \
  SMOKE_ONLY="similarity_bitext_pairs(12lang)" \
  SMOKE_OUT=SMOKE_r13_1000x_bitext_multilang_paircap.json \
  timeout 3600 python scripts/smoke_scale.py \
  > PROBE_r13_1000x_bitext_multilang_paircap_stages.log 2>/dev/null
echo "$(date +%H:%M:%S) multilang done $?" >> R13_PROBE_CHAIN.log
SMOKE_SCALE=1000 SMOKE_SHUFFLE=256 SPARK_GRAFT_DRIVER_MEM=48g \
  SMOKE_ONLY="similarity_bitext_pairs" \
  SMOKE_OUT=SMOKE_r13_1000x_bitext_main_paircap.json \
  timeout 5400 python scripts/smoke_scale.py \
  > PROBE_r13_1000x_bitext_main_paircap_stages.log 2>/dev/null
echo "$(date +%H:%M:%S) main done $?" >> R13_PROBE_CHAIN.log
SMOKE_SCALE=1000 SMOKE_SHUFFLE=256 SPARK_GRAFT_DRIVER_MEM=48g \
  SMOKE_ONLY="embedding_knn_graph" \
  SMOKE_OUT=SMOKE_r13_1000x_knn_paircap.json \
  timeout 5400 python scripts/smoke_scale.py \
  > PROBE_r13_1000x_knn_paircap_stages.log 2>/dev/null
echo "$(date +%H:%M:%S) knn done $?" >> R13_PROBE_CHAIN.log
