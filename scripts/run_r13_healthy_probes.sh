#!/bin/bash
# Wait for a healthy host window (par-calib <= threshold), then run
# the r13 wall-sensitive probe queue sequentially: the bitext 1000x
# clean re-probe (VERDICT r12 item 1), strict contamination 1000x
# (item 7), the connector 2M re-run (item 8), and a clean bench
# trend point. Each artifact self-describes via par_band either way.
cd /root/repo || exit 1
THRESH="${HEALTHY_PAR_MAX:-4.8}"
for i in $(seq 1 90); do
  PAR=$(python -c "from bench import _cpu_calibration_parallel as p; print(p())" 2>/dev/null)
  echo "$(date +%H:%M:%S) par=$PAR" >> HEALTHY_WAIT.log
  OK=$(python -c "print(1 if float('$PAR') <= float('$THRESH') else 0)")
  if [ "$OK" = "1" ]; then
    echo "$(date +%H:%M:%S) healthy ($PAR <= $THRESH) - launching queue" >> HEALTHY_WAIT.log
    SMOKE_SCALE=1000 SMOKE_SHUFFLE=256 SPARK_GRAFT_DRIVER_MEM=48g \
      SMOKE_ONLY="similarity_bitext_pairs(12lang)" \
      SMOKE_OUT=SMOKE_r13_1000x_bitext.json \
      timeout 5400 python scripts/smoke_scale.py \
      > PROBE_r13_1000x_bitext_stages.log 2>/dev/null
    echo "$(date +%H:%M:%S) bitext done ($?)" >> HEALTHY_WAIT.log
    SMOKE_SCALE=1000 SMOKE_SHUFFLE=256 SPARK_GRAFT_DRIVER_MEM=48g \
      SMOKE_ONLY="contamination_embedding_strict(sparse)" \
      SMOKE_OUT=SMOKE_r13_1000x_contam_strict.json \
      timeout 3600 python scripts/smoke_scale.py \
      > PROBE_r13_1000x_contam_strict_stages.log 2>/dev/null
    echo "$(date +%H:%M:%S) contam strict done ($?)" >> HEALTHY_WAIT.log
    SMOKE_OUT=SMOKE_r13_connector_scale_healthy.json \
      timeout 1800 python scripts/probe_connector_scale.py \
      > PROBE_r13_connector_scale_healthy.log 2>/dev/null
    echo "$(date +%H:%M:%S) connector done ($?)" >> HEALTHY_WAIT.log
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout 1800 python bench.py \
      2>/dev/null | tail -1 > BENCH_r13_local_trend.json
    echo "$(date +%H:%M:%S) bench trend done ($?)" >> HEALTHY_WAIT.log
    exit 0
  fi
  sleep 150
done
echo "$(date +%H:%M:%S) no healthy window in budget" >> HEALTHY_WAIT.log
exit 1
