#!/usr/bin/env bash
# Watch the axon TPU tunnel; the moment it answers, run bench.py and stash
# the output for the round. Probe every ~3 min with a bounded timeout (the
# tunnel hangs forever when down — see CLAUDE.md gotchas). Runs detached via
# nohup; kill by PID (/tmp/tpu_watcher.pid), never by pattern.
set -u
cd /root/repo
LOG=/tmp/tpu_watcher.log
echo "[watcher] start $(date -Is)" >> "$LOG"
while true; do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[watcher] tunnel UP $(date -Is); running bench" >> "$LOG"
    ts=$(date +%Y%m%d_%H%M%S)
    timeout 5400 python bench.py > "/tmp/bench_r4_${ts}.json" 2> "/tmp/bench_r4_${ts}.err"
    rc=$?
    echo "[watcher] bench rc=$rc -> /tmp/bench_r4_${ts}.json $(date -Is)" >> "$LOG"
    if [ $rc -eq 0 ] && ! grep -q bench_unavailable "/tmp/bench_r4_${ts}.json"; then
      echo "[watcher] GREEN bench captured; continuing to re-probe hourly" >> "$LOG"
      sleep 3600
    else
      sleep 600
    fi
  else
    echo "[watcher] tunnel down $(date -Is)" >> "$LOG"
    sleep 180
  fi
done
