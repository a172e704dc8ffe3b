#!/bin/bash
# Poll the axon TPU tunnel; the moment it answers, capture the full
# benchmark ladder (the round's headline numbers) and exit.
# Output: /root/repo/BENCH_probe.json (one JSON line per rung).
export PYTHONPATH=/root/repo:/root/.axon_site
for i in $(seq 1 60); do
  echo "[tpu_watch] probe $i at $(date -u +%H:%M:%S)"
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "[tpu_watch] TPU is UP at $(date -u +%H:%M:%S); running bench ladder"
    cd /root/repo
    timeout 5400 python bench.py --ladder > BENCH_probe.json 2> /tmp/bench_probe.err
    echo "[tpu_watch] bench rc=$? output:"
    cat BENCH_probe.json
    exit 0
  fi
  sleep 540
done
echo "[tpu_watch] gave up after 60 probes"
exit 1
