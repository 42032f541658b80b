#!/bin/bash
# Round-4 chip queue, stage E: fresh start after a VM restart wiped
# /tmp and .matrix_r4 (the stage-D artifacts + resume shards are gone).
# Risk-ordered: short committed numbers first, then the DGCNN headline
# leg (Table 4's DUP-Net-collapse stress cells), then ONet-Mesh wire
# measurement, then the 40-min knn leg, then PointConv (Table 5's
# SOR-vs-kNN cell) and the widen legs. Every leg snapshots results so a
# mid-leg round end still lands the finished cells.
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

# 1. larger-batch CW on pointnet2 (B=64 was 0.94 clouds/s bf16-trunk;
#    target >=1 cloud/s for the VERDICT item) — minutes, lands first.
log "bench_attack pointnet2 B=128"
python tools/bench_attack.py --victim pointnet2 --batch 128 \
  --attacks cw_perturb_mixed \
  --out /root/repo/BENCH_ATTACK.json >> "$OUT/bench_attack_pn2_b128.log" 2>&1
log "bench_attack B=128 exit=$?"

# 2. DGCNN headline columns, cheap rows first (drop is minutes,
#    perturb ~10 min; knn deferred to its own leg).
run_leg dgcnn_head dgcnn clean drop perturb

# 3. controlled ONet-Mesh number with the adaptive-bucket int8 wire
log "bench_mesh_cli onet"
python tools/bench_mesh_cli.py --only onet \
  >> "$OUT/bench_mesh_onet.log" 2>&1
log "bench_mesh_cli onet exit=$?"

# 4. the 40-min DGCNN knn leg (artifacts reused from leg 2)
run_leg dgcnn_knn dgcnn knn

# 5. PointConv headline leg incl. the Table-5 SOR-vs-kNN cell
run_leg pointconv_head pointconv clean drop perturb knn

# 6. widen: remaining gradient/add rows, cheapest first
run_leg dgcnn_wide dgcnn ifgm pgd fgm mifgm add add_cluster add_object
run_leg pointconv_wide pointconv ifgm pgd fgm mifgm add add_cluster add_object
run_leg rscnn_head rscnn clean drop perturb knn
run_leg rscnn_wide rscnn ifgm pgd fgm mifgm add add_cluster add_object
log "all r4e legs done"
