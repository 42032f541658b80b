#!/bin/bash
# Round-5 chip queue, stage B: re-ordered tail after rscnn_fast landed
# (clean/perturb/drop). Waits for the running rscnn knn leg, then:
#   1. pointnet2 defended-clean row (train + cheap scoring — completes
#      the PointNet++ table to 11/11 rows; defended-clean npz artifacts
#      are shared and already present).
#   2. dgcnn add_object (shard-resume of the wedged stage-E client —
#      completes DGCNN to 11/11).
#   3. alias columns (drop100, add_hd) for dgcnn/pointconv.
#   4. remaining wide legs, time permitting.
set -u
cd /root/repo
OUT=.matrix_r4
mkdir -p "$OUT"
log() { echo "=== [$(date -u +%H:%M:%S)] $* ===" | tee -a "$OUT/driver.log"; }

if [ -n "${WAIT_PID:-}" ]; then
  log "r5b queue waiting on leg pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  cp -f "$OUT/seed0/results.json" "$OUT/results_after_rscnn_knn.json" 2>/dev/null
  log "rscnn_knn leg done; r5b queue starts"
fi

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

run_leg pointnet2_clean pointnet2 clean
run_leg dgcnn_object    dgcnn     add_object
run_leg dgcnn_alias     dgcnn     drop100 add_hd
run_leg pointconv_alias pointconv drop100 add_hd
run_leg pointconv_wide  pointconv ifgm pgd fgm mifgm add add_cluster add_object
run_leg rscnn_wide      rscnn     ifgm pgd fgm mifgm add add_cluster add_object
run_leg rscnn_alias     rscnn     drop100 add_hd
log "all r5b legs done"
