"""End-to-end product demo: train -> attack -> defend -> evaluate.

Runs the full IF-Defense pipeline on the synthetic 8-class shape family
(no ModelNet40 in this environment) and reports accuracy at every stage:

  1. train PointNet on synth8            (expect high clean accuracy)
  2. CW-Perturb targeted attack          (accuracy collapses)
  3. SOR baseline defense                (partial recovery)
  4. train ConvONet on synth8 occupancy
  5. ConvONet-Opt IF-Defense             (stronger recovery)
  6. ConvONet-Mesh IF-Defense            (dense-lattice mesh path)

Usage: python tools/e2e_demo.py --out_dir /tmp/e2e [--fast]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="/tmp/e2e")
    p.add_argument("--fast", action="store_true",
                   help="reduced sizes for smoke runs")
    p.add_argument("--interp_refresh", type=int, default=1,
                   help="opt-defense corner-cache refresh window "
                        "(accuracy A/B for the fast path)")
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    results = {}

    from tools.synthetic_dataset import main as make_data

    train_pc, test_pc = (60, 15) if args.fast else (200, 40)
    epochs = 10 if args.fast else 40
    cw_steps = (2, 50) if args.fast else (8, 300)
    occ_steps = 300 if args.fast else 4000
    defense_iters = 50 if args.fast else 200

    cls_npz, occ_npz = make_data([
        "--out_dir", args.out_dir,
        "--train_per_class", str(train_pc),
        "--test_per_class", str(test_pc),
        "--occ_per_class", str(30 if args.fast else 60),
    ])

    # 1. train the victim
    from if_defense_tpu.cli.train import main as train_main

    run_dir = os.path.join(args.out_dir, "pointnet")
    best_acc = train_main([
        "--data", cls_npz, "--model", "pointnet", "--num_points", "1024",
        "--epochs", str(epochs), "--batch_size", "32",
        "--eval_every", "5", "--output", run_dir,
    ])
    results["clean_accuracy"] = best_acc
    ckpt = os.path.join(run_dir, "best")

    # 2. attack
    from if_defense_tpu.cli.attack import main as attack_main

    adv_path, success = attack_main([
        "--attack", "perturb", "--data", cls_npz, "--checkpoint", ckpt,
        "--num_points", "1024", "--batch_size", "40",
        "--binary_step", str(cw_steps[0]), "--num_iter", str(cw_steps[1]),
        "--output", os.path.join(args.out_dir, "perturb-pointnet.npz"),
    ])
    results["attack_success_rate"] = success

    from if_defense_tpu.cli.inference import main as inf_main

    def acc_of(path):
        out = inf_main([
            "--data", path, "--checkpoint", ckpt, "--num_points", "1024",
            "--batch_size", "40", "--mode", "target",
        ])
        return out["accuracy"], out.get("target_success")

    results["attacked_accuracy"], results["attacked_target_success"] = (
        acc_of(adv_path))

    # 3. SOR baseline defense
    from if_defense_tpu.cli.defend_npz import main as defend_main

    sor_path, = defend_main([
        "--data_root", adv_path, "--defense", "sor", "--batch_size", "40"])
    results["sor_accuracy"], _ = acc_of(sor_path)

    # 4. train ConvONet on the same shape family
    from if_defense_tpu.cli.train_implicit import main as timpl_main

    weights = timpl_main([
        "--variant", "convonet", "--data", occ_npz,
        "--steps", str(occ_steps), "--batch_size", "16",
        "--log_every", "200", "--save_every", str(occ_steps),
        "--output", os.path.join(args.out_dir, "convonet_synth"),
    ])

    # 5. ConvONet-Opt IF-Defense
    from if_defense_tpu.cli.opt_defense import main as opt_main

    opt_path, = opt_main([
        "--variant", "convonet", "--data_root", adv_path,
        "--weights", weights, "--iterations", str(defense_iters),
        "--batch_size", "40",
        "--interp_refresh", str(args.interp_refresh),
    ])
    results["convonet_opt_accuracy"], _ = acc_of(opt_path)

    # 6. ConvONet-Mesh IF-Defense (dense-lattice generation path)
    from if_defense_tpu.cli.remesh_defense import main as remesh_main

    mesh_path, = remesh_main([
        "--variant", "convonet", "--data_root", adv_path,
        "--weights", weights, "--batch_size", "40",
        *(["--resolution0", "16", "--upsample", "2"]
          if args.fast else []),
    ])
    results["convonet_mesh_accuracy"], _ = acc_of(mesh_path)

    print(json.dumps(results, indent=2, default=float))
    with open(os.path.join(args.out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


if __name__ == "__main__":
    main()
