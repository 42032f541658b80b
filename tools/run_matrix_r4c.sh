#!/bin/bash
# Round-4 chip queue, stage C: launched after run_matrix_r4b.sh's
# headline legs (dgcnn/pointconv/pointnet2-clean/rscnn). Short
# measurement tasks first (they beat the first widen cells on value per
# chip-minute), then the widen legs resume exactly where r4b would have.
set -u
cd /root/repo
OUT=.matrix_r4
mkdir -p "$OUT"
log() { echo "=== [$(date -u +%H:%M:%S)] $* ===" | tee -a "$OUT/driver.log"; }

# 1. larger-batch CW on pointnet2: FPS's 512 sequential steps amortize
#    with batch; B=64 measured 0.94 clouds/s bf16-trunk (target >=1)
log "bench_attack pointnet2 B=128"
python tools/bench_attack.py --victim pointnet2 --batch 128 \
  --attacks cw_perturb_mixed \
  --out /tmp/bench_attack_b128.json >> "$OUT/bench_attack_pn2_b128.log" 2>&1
log "bench_attack B=128 exit=$?"

# 2. controlled ONet-Mesh number with the round-4 adaptive-bucket int8
#    wire (63f80f4) — BENCH_MESH.json's 2.58 clouds/s predates it
log "bench_mesh_cli onet"
python tools/bench_mesh_cli.py --variant onet \
  >> "$OUT/bench_mesh_onet.log" 2>&1
log "bench_mesh_cli onet exit=$?"

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

# 3. widen: remaining attack rows (ifgm/pgd cheap -> run first within
#    each leg; CW add-family and mifgm/fgm after)
run_leg dgcnn     ifgm pgd fgm mifgm add add_cluster add_object
run_leg pointconv ifgm pgd fgm mifgm add add_cluster add_object
run_leg rscnn     ifgm pgd fgm mifgm add add_cluster add_object
log "all r4c legs done"
