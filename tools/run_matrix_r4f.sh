#!/bin/bash
# Round-4 chip queue, stage F (chained after run_matrix_r4e.sh exits):
# the reference Tables 2-5 ALIAS columns the stage-E legs omitted —
# add_hd (CW-Add + Hausdorff adv distance) and drop100 (Saliency Drop
# num_drop=100) — for the victims whose artifacts stage E trained.
set -u
cd /root/repo
OUT=.matrix_r4
mkdir -p "$OUT"
log() { echo "=== [$(date -u +%H:%M:%S)] $* ===" | tee -a "$OUT/driver.log"; }

run_leg() { # tag victim attacks...
  local TAG=$1 V=$2; shift 2
  log "leg $TAG ($V): $*"
  python tools/accuracy_benchmark.py \
    --out_dir "$OUT" --seeds 0 \
    --victims "$V" \
    --attacks "$@" \
    --defenses none srs sor dup onet_opt convonet_opt onet_mesh convonet_mesh \
    --onet_modes f32 bf16 \
    --reuse_artifacts >> "$OUT/leg_${TAG}.log" 2>&1
  log "leg $TAG exit=$?"
  cp -f "$OUT/seed0/results.json" "$OUT/results_after_${TAG}.json" 2>/dev/null
}

# 0. chunk-size A/B on the pointnet2 CW loop: B=64 mixed at the default
#    chunk=100 measured 0.94 clouds/s; fewer+longer device calls shave
#    dispatch/sync overhead if the runtime tolerates them (~minutes)
for C in 250 500; do
  log "bench_attack pointnet2 chunk=$C"
  python tools/bench_attack.py --victim pointnet2 --batch 64 \
    --attacks cw_perturb_mixed --chunk "$C" \
    --out /root/repo/BENCH_ATTACK.json \
    >> "$OUT/bench_attack_pn2_c${C}.log" 2>&1
  log "bench_attack chunk=$C exit=$?"
done

# 0.5 the PointNet++ defended-clean row RESULTS_MATRIX flags as queued:
#     defended-clean npz artifacts are victim-independent and already in
#     the out_dir; only the (seed-deterministic) pointnet2 train is new
run_leg pointnet2_clean pointnet2 clean

run_leg dgcnn_alias     dgcnn     drop100 add_hd
run_leg pointconv_alias pointconv drop100 add_hd
run_leg rscnn_alias     rscnn     drop100 add_hd
# round-3's pointnet alias runs died with the relay; re-land them last
run_leg pointnet_alias   pointnet  drop100 add_hd
run_leg pointnet2_alias  pointnet2 drop100 add_hd
log "all r4f legs done"
