#!/bin/bash
# Round-4 hardware battery — fired once by the watcher on first UP.
# Serial, bounded; do NOT run battery jobs concurrently (remote compile
# queue backs up).
# Abort protocol: `touch /tmp/hw_r4/STOP` stops at the next job boundary;
# `kill $(cat /tmp/hw_r4/job.pid)` aborts the in-flight job (exact PID,
# never pattern-kill).
cd /root/repo
D=/tmp/hw_r4
echo $$ > "$D/battery.pid"
log() { echo "$(date -u +%H:%M:%S) battery: $1" >> /tmp/tpu_status.log;
        if [ -f "$D/STOP" ]; then
          echo "$(date -u +%H:%M:%S) battery: STOP seen, aborting" >> /tmp/tpu_status.log
          touch "$D/done"; exit 0
        fi; }
run() { "$@" & echo $! > "$D/job.pid"; wait $!; }

log "bench baseline"
run timeout 5400 python bench.py > "$D/bench_base.json" 2> "$D/bench_base.log"
log "fused conv+GN A/B"
MASKLAB_FUSED_CONV_GN=1 BENCH_SKIP_EXTRAS=1 run timeout 3600 python bench.py > "$D/bench_fused.json" 2> "$D/bench_fused.log"
log "pool v3 timing"
run timeout 1800 python benchmarks/exp_pool_v3.py time > "$D/exp_pool_v3.log" 2>&1
log "dense trace"
run timeout 2400 python benchmarks/trace_model.py > "$D/trace_model.log" 2>&1
log "road trace"
BENCH_PRESET=road run timeout 2400 python benchmarks/trace_model.py > "$D/trace_road.log" 2>&1
log "train trace"
run timeout 2400 python benchmarks/trace_train.py > "$D/trace_train.log" 2>&1
log "train trace, band-GN kernel forced at C=128 (A/B for the backward)"
MASKLAB_GN_KERNEL_MIN_C=128 run timeout 2400 python benchmarks/trace_train.py > "$D/trace_train_gn128.log" 2>&1
log "baseline-config suite (5 configs)"
run timeout 3600 python benchmarks/suite.py > "$D/suite.log" 2>&1
log "serving degradation drive (max_batch=16)"
run timeout 2400 python benchmarks/serve_degradation_drive.py > "$D/serve_degradation.log" 2>&1
log "verify: CLI train (tiny 3-phase road backbone)"
run timeout 1500 python -m masklab_tpu.cli train \
  -backbone.backbone_type seresnet34 -backbone.backbone_outputs C3 C4 C5 P6 \
  -backbone.num_features 32 \
  -detection.num_features 32 -detection.num_depth 1 -detection.nms_max_output_size 8 \
  -instance.num_features 32 -instance.num_depth 1 \
  -semantic.num_features 32 -semantic.num_aspp_features 32 -semantic.num_depth 1 -semantic.num_skip_features 32 \
  -loss.nms_max_output_size 8 \
  -dataset.data_dir /tmp/verify_ds -dataset.min_area 200 \
  -train.save_dir /tmp/verify_logs -train.batch_size 2 -train.gpu_count 1 \
  -train.train_head_tune_epoch 1 -train.train_waist_tune_epoch 1 -train.train_all_epoch 1 \
  -train.head_step_size 4 -train.waist_step_size 4 -train.all_step_size 4 \
  -compute.scale_buckets 0.5 -compute.nms_candidates_per_class 16 \
  > "$D/verify_train.log" 2>&1
log "verify: serve + HTTP probes"
CKPT=$(ls -d /tmp/verify_logs/*/ 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  python -m masklab_tpu.cli serve --port=8511 \
    -train.save_dir "$CKPT" -postprocess.resolution 128 160 \
    > "$D/verify_serve.log" 2>&1 &
  SRVPID=$!
  sleep 120
  {
    curl -s -m 30 http://localhost:8511/healthz; echo
    IMG=$(ls /tmp/verify_ds/images/*.jpg | head -1)
    curl -s -m 300 -X POST --data-binary @"$IMG" http://localhost:8511/predict | head -c 400; echo
    curl -s -m 300 -X POST --data-binary @"$IMG" http://localhost:8511/predict -o "$D/verify_resp.json" -w 'second latency: %{time_total}s\n'
    curl -s -m 30 -X POST --data-binary 'garbage' http://localhost:8511/predict | head -c 200; echo
    curl -s -m 30 http://localhost:8511/predict | head -c 200; echo
  } > "$D/verify_probes.log" 2>&1
  kill $SRVPID 2>/dev/null
fi
log "done"
touch "$D/done"
