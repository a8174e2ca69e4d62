#!/bin/bash
# Round-4 PHASE-2 battery — A/Bs the session-3 work on hardware:
#   * default bench with the PROMOTED level-2 key extraction (fresh
#     last_good + regression check vs bench_base's 671.6)
#   * the FIXED fused conv+GN kernel (Mosaic-legal single-contraction
#     dots) — the phase-1 A/B died in Mosaic verification
#   * dense trace with the fused kernel on, if its bench succeeded
# Waits for BOTH /tmp/hw_r4/done (phase-1 battery) and /tmp/hw_r4b_go
# (touched manually after the interactive verify drive) so TPU jobs stay
# strictly serial. Abort protocol: `touch /tmp/hw_r4b/STOP` stops at the
# next job boundary; `kill $(cat /tmp/hw_r4b/job.pid)` aborts the
# in-flight job (exact PID, never pattern-kill).
cd /root/repo
D=/tmp/hw_r4b
mkdir -p "$D"
echo $$ > "$D/battery.pid"
log() { echo "$(date -u +%H:%M:%S) battery2: $1" >> /tmp/tpu_status.log;
        if [ -f "$D/STOP" ]; then
          echo "$(date -u +%H:%M:%S) battery2: STOP seen, aborting" >> /tmp/tpu_status.log
          touch "$D/done"; exit 0
        fi; }
run() { "$@" & echo $! > "$D/job.pid"; wait $!; }

for _ in $(seq 960); do
  [ -f /tmp/hw_r4/done ] && [ -f /tmp/hw_r4b_go ] && break
  [ -f "$D/STOP" ] && { touch "$D/done"; exit 0; }
  sleep 30
done
log "bench default (level-2 key extraction)"
run timeout 5400 python bench.py > "$D/bench_level2.json" 2> "$D/bench_level2.log"
log "bench fused conv+GN (fixed kernel)"
MASKLAB_FUSED_CONV_GN=1 BENCH_SKIP_EXTRAS=1 run timeout 3600 python bench.py > "$D/bench_fused2.json" 2> "$D/bench_fused2.log"
if python -c "import json,sys; d=json.load(open('$D/bench_fused2.json')); sys.exit(0 if d.get('value') else 1)" 2>/dev/null; then
  log "dense trace, fused kernel on"
  MASKLAB_FUSED_CONV_GN=1 run timeout 2400 python benchmarks/trace_model.py > "$D/trace_fused.log" 2>&1
fi
log "done"
touch "$D/done"
