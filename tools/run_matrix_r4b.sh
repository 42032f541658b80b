#!/bin/bash
# Round-4 chip queue, restructured for wall-clock priority (replaces the
# tail of run_matrix_r4.sh): the full-10-attack DGCNN leg would eat the
# whole round at ~10 min/CW-batch, so run the BASELINE.md Tables 4-5
# headline columns (clean/perturb/knn/drop) for DGCNN + PointConv first,
# then the PointNet++ clean row, then RS-CNN, then widen. Artifacts are
# cell-resumable (--reuse_artifacts + attack batch shards), so a kill at
# any point loses at most one batch.
set -u
cd /root/repo
OUT=.matrix_r4
mkdir -p "$OUT"
log() { echo "=== [$(date -u +%H:%M:%S)] $* ===" | tee -a "$OUT/driver.log"; }

# 0. VERDICT r3 #3: attack throughput on the FPS/kNN-heavy victim
log "bench_attack pointnet2"
python tools/bench_attack.py --victim pointnet2 --batch 64 \
  --attacks cw_perturb cw_perturb_mixed ifgm \
  --out BENCH_ATTACK.json >> "$OUT/bench_attack_pn2.log" 2>&1
log "bench_attack pointnet2 exit=$?"

run_leg() { # victim attacks...
  local V=$1; shift
  log "leg $V: $*"
  python tools/accuracy_benchmark.py \
    --out_dir "$OUT" --seeds 0 \
    --victims "$V" \
    --attacks "$@" \
    --defenses none srs sor dup onet_opt convonet_opt onet_mesh convonet_mesh \
    --onet_modes f32 bf16 \
    --reuse_artifacts >> "$OUT/leg_${V}.log" 2>&1
  log "leg $V exit=$?"
  cp -f "$OUT/seed0/results.json" "$OUT/results_after_${V}.json" 2>/dev/null
}

# 1. headline columns (Tables 4-5 stress cells)
run_leg dgcnn     clean perturb knn drop
run_leg pointconv clean perturb knn drop
# 2. PointNet++ clean row for the fresh checkpoint (defended clean
#    artifacts are shared across victims -> cheap)
run_leg pointnet2 clean
# 3. RS-CNN headline leg (no reference code ships; architectural parity)
run_leg rscnn     clean perturb knn drop
# 4. widen: remaining attack rows
run_leg dgcnn     add add_cluster add_object ifgm mifgm pgd fgm
run_leg pointconv add add_cluster add_object ifgm mifgm pgd fgm
run_leg rscnn     add add_cluster add_object ifgm mifgm pgd fgm
log "all r4b legs done"
