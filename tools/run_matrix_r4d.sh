#!/bin/bash
# Round-4 chip queue, stage D: re-inject the DGCNN headline leg (its
# perturb resume died on the mtime fingerprint, fixed in 2f52624 — the
# 120-cloud shard prefix is reused via the legacy upgrade), then the
# short measurement tasks, then widen.
set -u
cd /root/repo
OUT=.matrix_r4
mkdir -p "$OUT"
log() { echo "=== [$(date -u +%H:%M:%S)] $* ===" | tee -a "$OUT/driver.log"; }

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

# 1. DGCNN headline columns (Table 4's DUP-Net-collapse stress cells).
#    drop before knn: drop is minutes, knn is ~40 min — if the round
#    ends mid-leg, drop has landed.
run_leg dgcnn clean perturb drop knn

# 2. larger-batch CW on pointnet2 (B=64 was 0.94 clouds/s bf16-trunk)
log "bench_attack pointnet2 B=128"
python tools/bench_attack.py --victim pointnet2 --batch 128 \
  --attacks cw_perturb_mixed \
  --out /tmp/bench_attack_b128.json >> "$OUT/bench_attack_pn2_b128.log" 2>&1
log "bench_attack B=128 exit=$?"

# 3. controlled ONet-Mesh number with the round-4 adaptive-bucket int8 wire
log "bench_mesh_cli onet"
python tools/bench_mesh_cli.py --only onet \
  >> "$OUT/bench_mesh_onet.log" 2>&1
log "bench_mesh_cli onet exit=$?"

# 4. widen: remaining attack rows, cheap gradient attacks first
run_leg dgcnn     ifgm pgd fgm mifgm add add_cluster add_object
run_leg pointconv ifgm pgd fgm mifgm add add_cluster add_object
run_leg rscnn     ifgm pgd fgm mifgm add add_cluster add_object
log "all r4d legs done"
