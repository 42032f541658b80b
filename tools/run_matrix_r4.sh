#!/bin/bash
# Round-4 matrix runner: one victim leg per invocation, priority order.
# Artifacts live in repo-local .matrix_r4 (gitignored) so restarts resume.
set -u
cd /root/repo
OUT=.matrix_r4
mkdir -p "$OUT"
for V in pointnet2 dgcnn pointconv rscnn; do
  echo "=== [$(date -u +%H:%M:%S)] victim leg: $V ===" | tee -a "$OUT/driver.log"
  python tools/accuracy_benchmark.py \
    --out_dir "$OUT" --seeds 0 \
    --victims "$V" \
    --attacks perturb add add_cluster add_object knn fgm ifgm mifgm pgd drop \
    --defenses none srs sor dup onet_opt convonet_opt onet_mesh convonet_mesh \
    --onet_modes f32 bf16 \
    --reuse_artifacts >> "$OUT/leg_${V}.log" 2>&1
  echo "=== [$(date -u +%H:%M:%S)] victim leg $V exit=$? ===" | tee -a "$OUT/driver.log"
  cp -f "$OUT/seed0/results.json" "$OUT/results_after_${V}.json" 2>/dev/null
done
echo "=== all legs done ===" | tee -a "$OUT/driver.log"
