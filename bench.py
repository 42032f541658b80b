"""Headline benchmark: ConvONet-Opt restoration throughput (clouds/sec).

The north-star workload (BASELINE.json): restore 1024-point clouds with the
ConvONet-Opt IF-Defense — SOR, unit-cube preprocessing, one encoder pass,
then 201 Adam iterations of (decoder forward+backward + kNN repulsion) —
at reference hyperparameters (batch 192, lr 1e-3, rep_weight 500,
threshold 0.2; `ConvONet/opt_defense.py:39-56`).

Throughput counts the full defense (SOR + encode + optimise + renormalise)
per cloud. Weights are random-init (throughput is weight-independent).

Baseline anchor: the reference PyTorch pipeline on a V100 is estimated at
~24 clouds/s: ~4 TFLOP per 192-cloud batch (201 iters x [decoder fwd+bwd
~18 GFLOP + kNN 1.3 GFLOP]) at the ~5-10%% FLOP efficiency its many small
unfused kernels reach, plus per-iteration Python/launch overhead — ~8 s
per batch. vs_baseline = measured / 24.0. The BASELINE.md target of a
>=20x per-cloud speedup therefore corresponds to vs_baseline >= 20.

Calibrated anchor (round 4): tools/calibrate_anchor.py RAN the actual
torch reference on this host's CPU (0.30 clouds/s, 17.7 GFLOP/cloud via
FlopCounterMode, 3.25%% of the measured 1-core matmul peak) and scaled
that measured efficiency to V100 f32 peak: 28.8 clouds/s. When
ANCHOR_CALIBRATION.json is present the output adds
`vs_baseline_calibrated` (= value / 28.8) plus `mfu` and `hbm_util`
roofline figures from exact XLA cost-analysis FLOP/byte counts.

Precision: the headline `value` runs the fast path (compute_dtype=
bfloat16 with f32 master points/Adam state + corner-cache interpolation
R=16 + cached repulsion neighbour graph on the same cadence); EVERY run
also measures the f32 fast path (`value_f32` — same caches, all math
f32) and the strict reference-numerics mode (`value_f32_exact` — f32,
interpolation + kNN graph every step), so round-over-round progress is
mode-comparable (VERDICT r2 item 2). Accuracy of the fast paths vs
exact is validated on the discriminative hard-family benchmark
(RESULTS_DISCRIM.md) and the rep-cache A/B in RESULTS_MATRIX.md. Pass
--f32 to make the f32 path the headline; --no_rep_cache to disable the
cached graph.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"value_f32", "vs_baseline_f32", "anchor_note"}.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")

REFERENCE_CLOUDS_PER_SEC = 24.0

# Measured calibration of the anchor (tools/calibrate_anchor.py): the
# actual torch reference pipeline run on this host's CPU, FLOPs counted
# with FlopCounterMode, efficiency scaled to V100 f32 peak. Read at
# bench time; adds vs_baseline_calibrated / mfu / hbm_util fields.
CALIBRATION_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "ANCHOR_CALIBRATION.json")

# device_kind -> (peak matmul FLOP/s in the loop's dominant dtype tier,
# HBM bytes/s), published specs
TPU_PEAKS = {
    "TPU v4": (275e12, 1228e9),
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
}


def _calibration():
    """Parse ANCHOR_CALIBRATION.json once; {} if absent."""
    if os.path.exists(CALIBRATION_PATH):
        with open(CALIBRATION_PATH) as f:
            return json.load(f)
    return {}

# Last-known-good on-chip measurement, refreshed by every successful real
# -hardware run. Fallback when the TPU tunnel is unreachable at bench
# time: in this environment the chip sits behind a host-spawned relay
# process that has died mid-round before (ROUND_NOTES.md) — and a dead
# relay makes the first device op HANG forever rather than error, which
# would otherwise turn the round's bench into a timeout with no number.
LKG_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LKG.json")


def devices_or_none(timeout_s: float, retries: int = 1):
    """jax.devices(), or None if the backend doesn't answer in time.

    Distinguishes a probe that ERRORED (backend said no) from one that
    TIMED OUT (backend said nothing — dead relay, or a slow cold
    remote-compile tunnel). A timeout is retried once with a doubled
    budget so a slow-but-alive tunnel isn't misclassified as dead
    (ADVICE r3); the daemon probe thread from a timed-out attempt is
    left running and its late success is picked up by the retry's
    shared box.
    """
    import jax

    box = {}

    def probe():
        try:
            box["devices"] = jax.devices()
        except Exception as e:  # unreachable backend surfaces either way
            box["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    for attempt in range(retries + 1):
        t.join(timeout_s * (2 ** attempt))
        if "devices" in box:
            return box["devices"]
        if "error" in box:
            print(f"[bench] backend probe errored: {box['error']}",
                  file=sys.stderr)
            return None
        print(f"[bench] backend probe TIMED OUT after "
              f"{timeout_s * (2 ** attempt):.0f}s"
              + (" — retrying" if attempt < retries else
                 " — treating backend as unreachable"),
              file=sys.stderr)
    return None


def _pause_chip_queue():
    """SIGSTOP any running round-4 chip-queue process trees.

    The matrix/bench queue (tools/run_matrix_r*.sh) can be mid-leg when
    the round-end driver runs this bench; sharing the single chip during
    timing would understate the headline number. Queue roots advertise
    themselves via /tmp/r<N>*.pid; their whole /proc children trees are
    stopped for the measurement window and SIGCONTed afterwards
    (finally-guarded — a crash mid-measure still resumes them).

    Safety (ADVICE r4): a pid-file root is only trusted if its /proc
    cmdline actually mentions the queue scripts (stale/recycled or
    foreign pid files are skipped), and this process plus its ancestors
    are never signalled (bench launched from inside a queue tree must
    not SIGSTOP itself — the finally-guarded SIGCONT would never run)."""
    import glob
    import signal

    def _cmdline(p):
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                return f.read().replace(b"\x00", b" ").decode(
                    "utf-8", "replace")
        except OSError:
            return ""

    protected = {os.getpid()}
    p = os.getpid()
    while p > 1:
        try:
            with open(f"/proc/{p}/stat") as f:
                # field 4 (after the parenthesised comm, which may
                # itself contain spaces) is ppid
                p = int(f.read().rpartition(")")[2].split()[1])
        except (OSError, ValueError, IndexError):
            break
        protected.add(p)

    pids: list[int] = []
    for pf in sorted(glob.glob("/tmp/r[0-9]*.pid")):
        try:
            root = int(open(pf).read().split()[0])
        except (OSError, ValueError, IndexError):
            continue
        if "run_matrix_r" not in _cmdline(root):
            continue              # stale/recycled/foreign pid file
        stack = [root]
        while stack:
            p = stack.pop()
            if p in pids or p in protected:
                continue
            try:
                with open(f"/proc/{p}/task/{p}/children") as f:
                    stack.extend(int(x) for x in f.read().split())
            except OSError:
                continue          # process already gone
            pids.append(p)
    stopped = []
    for p in pids:
        try:
            os.kill(p, signal.SIGSTOP)
            stopped.append(p)
        except (OSError, ProcessLookupError):
            pass
    return stopped


def _resume_chip_queue(stopped):
    import signal

    for p in reversed(stopped):
        try:
            os.kill(p, signal.SIGCONT)
        except (OSError, ProcessLookupError):
            pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true",
                        help="tiny CPU-friendly shapes (compile check)")
    # batch is an implementation detail (the reference's 192 was a GPU
    # memory cap); 48 is throughput-optimal on v5e — the [B, 1024, 1024]
    # distance matrices stay HBM-friendly
    parser.add_argument("--batch_size", type=int, default=48)
    parser.add_argument("--num_batches", type=int, default=8)
    parser.add_argument("--f32", action="store_true",
                        help="full-f32 loop (reference numerics)")
    parser.add_argument("--probe_timeout", type=float, default=150.0,
                        help="seconds to wait for the TPU backend probe "
                             "before falling back to the last-known-good "
                             "record (a timeout is retried once with a "
                             "doubled budget)")
    parser.add_argument("--interp_refresh", type=int, default=16,
                        help="decoder corner-cache refresh window "
                             "(1 = exact reference interpolation every "
                             "step; 8/16/32 all measured accuracy-"
                             "neutral on the synthetic end-to-end "
                             "benchmark — 96.3/97.8/96.3%% defended "
                             "accuracy vs 92.2%% exact; 16 keeps the "
                             "per-window drift at ~one plane cell)")
    parser.add_argument("--no_rep_cache", action="store_true",
                        help="disable the cached repulsion neighbour "
                             "graph (rep_graph_cache) in the fast "
                             "paths — per-step kNN selection like the "
                             "reference")
    args = parser.parse_args()

    import jax

    if args.smoke:
        # the axon sitecustomize pre-pins the TPU platform; --smoke must
        # run on host CPU. Set the env var too so downstream imports
        # (the if_defense_tpu package guard honours JAX_PLATFORMS) agree
        # with the config override rather than fighting it.
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    elif devices_or_none(timeout_s=args.probe_timeout) is None:
        # dead tunnel relay: report the last on-chip measurement, marked
        # stale, instead of hanging the round's bench run forever
        if os.path.exists(LKG_PATH):
            with open(LKG_PATH) as f:
                lkg = json.load(f)
            lkg["stale"] = True
            lkg["anchor_note"] = (
                "TPU backend unreachable at bench time (tunnel relay "
                "down); values are the last successful on-chip "
                f"measurement ({lkg.get('measured_at', 'unknown date')}). "
                + lkg.get("anchor_note", ""))
            # flag when the requested workload differs from the recorded
            # one, so a fallback never silently reports a number from a
            # different config as this run's measurement (ADVICE r3)
            req = {"batch_size": args.batch_size,
                   "num_batches": args.num_batches,
                   "f32": args.f32,
                   "interp_refresh": args.interp_refresh,
                   "rep_cache": not args.no_rep_cache}
            rec = lkg.get("bench_config")
            if rec is not None and rec != req:
                lkg["config_mismatch"] = {"requested": req, "recorded": rec}
                lkg["anchor_note"] = (
                    "WARNING: recorded config differs from requested "
                    f"({rec} vs {req}). " + lkg["anchor_note"])
            print(json.dumps(lkg))
        else:
            print(json.dumps({
                "metric": "convonet_opt_clouds_per_sec", "value": 0.0,
                "unit": "clouds/s", "vs_baseline": 0.0, "stale": True,
                "anchor_note": "TPU backend unreachable and no "
                               "last-known-good record exists"}))
        return
    import jax.numpy as jnp

    from if_defense_tpu.defense import convonet_opt_defense
    from if_defense_tpu.implicit import ConvOccupancyNetwork

    if args.smoke:
        B, K, iters, inp, samp = 4, 256, 5, 64, 128
    else:
        B, K, iters, inp, samp = args.batch_size, 1024, 200, 600, 1024

    model = ConvOccupancyNetwork()
    rng = np.random.default_rng(0)
    init_pc = jnp.asarray(
        rng.uniform(-0.45, 0.45, (2, inp, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), init_pc, init_pc)

    pc = jnp.asarray(rng.normal(size=(B, K, 3)) * 0.3, jnp.float32)
    key = jax.random.key(1)

    def measure(compute_dtype, interp_refresh, rep_graph_cache=False):
        defend = convonet_opt_defense(
            model, variables,
            iterations=iters, input_npoint=inp, sample_npoint=samp,
            compute_dtype=compute_dtype, interp_refresh=interp_refresh,
            rep_graph_cache=rep_graph_cache,
        )
        # compile + warmup; sync via a scalar host fetch — on the axon
        # tunnel block_until_ready() returns before remote execution ends
        out = defend(pc, key)
        float(out[0, 0, 0])
        t0 = time.time()
        for i in range(args.num_batches):
            out = defend(pc, jax.random.fold_in(key, i))
        float(out[0, 0, 0])
        return args.num_batches * B / (time.time() - t0)

    repc = args.interp_refresh > 1 and not args.no_rep_cache
    paused = _pause_chip_queue()
    try:
        f32_exact_cps = measure(None, 1)
        # f32 FAST path: corner-cache + cached repulsion graph, f32
        # math throughout (both deviations accuracy-validated —
        # RESULTS_DISCRIM.md + the repc A/B in RESULTS_MATRIX.md)
        f32_cps = measure(None, args.interp_refresh, repc)
        fast_cps = (f32_cps if args.f32
                    else measure("bfloat16", args.interp_refresh, repc))
    finally:
        _resume_chip_queue(paused)

    line = {
        "metric": "convonet_opt_clouds_per_sec",
        "value": round(fast_cps, 2),
        "unit": "clouds/s",
        "vs_baseline": round(fast_cps / REFERENCE_CLOUDS_PER_SEC, 2),
        # f32 fast path (corner-cache + cached repulsion graph, all
        # math f32) — the "equal defended accuracy at reference dtype"
        # number; value_f32_exact is the strict reference semantics
        # (interpolation + kNN graph every step), measured EVERY run so
        # modes stay comparable over rounds
        "value_f32": round(f32_cps, 2),
        "vs_baseline_f32": round(f32_cps / REFERENCE_CLOUDS_PER_SEC, 2),
        "value_f32_exact": round(f32_exact_cps, 2),
        "vs_baseline_f32_exact": round(
            f32_exact_cps / REFERENCE_CLOUDS_PER_SEC, 2),
        "anchor_note": "vs_baseline anchor ~24 clouds/s is a V100 FLOP "
                       "model with ~2x error bars (bench.py docstring)",
    }
    cal_all = _calibration()
    cal = cal_all.get("summary") or {}
    if cal:
        anchor = cal["v100_anchor_clouds_per_sec"]
        line["calibrated_anchor"] = anchor
        line["vs_baseline_calibrated"] = round(fast_cps / anchor, 2)
        line["vs_baseline_calibrated_f32"] = round(f32_cps / anchor, 2)
        line["vs_baseline_calibrated_f32_exact"] = round(
            f32_exact_cps / anchor, 2)
        line["anchor_note"] = (
            f"calibrated_anchor {anchor} clouds/s: torch reference "
            "measured on this host's CPU (ANCHOR_CALIBRATION.json), its "
            "FLOP efficiency scaled to V100 f32 peak — an optimistic "
            "estimate of the reference, so vs_baseline_calibrated is "
            "conservative. vs_baseline keeps the original ~24 clouds/s "
            "model anchor for round-over-round comparability.")
        # roofline: MFU + HBM utilisation from exact XLA cost-analysis
        # FLOP/byte counts per cloud (the loop is bandwidth-bound by
        # design — repulsion kNN + plane interpolation dominate bytes)
        kind = jax.devices()[0].device_kind
        peaks = TPU_PEAKS.get(kind)
        if peaks and jax.default_backend() == "tpu":
            if args.f32:
                mode = "f32_r16_repc" if repc else "f32"
            else:
                mode = "bf16_r16_repc" if repc else "bf16_r16"
            xc = cal_all.get("xla_cost", {})
            fl = (xc.get(f"flops_per_cloud_{mode}")
                  or cal.get(f"our_flops_per_cloud_{mode}")
                  or cal.get("our_flops_per_cloud_"
                             + ("f32" if args.f32 else "bf16_r16")))
            by = (xc.get(f"bytes_per_cloud_{mode}")
                  or xc.get("bytes_per_cloud_"
                            + ("f32" if args.f32 else "bf16_r16")))
            if fl:
                line["mfu"] = round(fast_cps * fl / peaks[0], 5)
            if by:
                line["hbm_util"] = round(fast_cps * by / peaks[1], 4)
            if fl or by:
                line["roofline_note"] = (
                    "the 200-iter restoration loop is HBM-bandwidth-"
                    "bound by nature (repulsion kNN + plane "
                    "interpolation dominate bytes, tiny matmuls) — "
                    "hbm_util is the roofline-limiting utilisation; "
                    "mfu is reported for completeness and is low by "
                    "design, not by inefficiency")
            line["device_kind"] = kind
    bench_config = {"batch_size": args.batch_size,
                    "num_batches": args.num_batches,
                    "f32": args.f32,
                    "interp_refresh": args.interp_refresh,
                    "rep_cache": repc}
    default_config = (args.batch_size == 48 and args.num_batches == 8
                      and not args.f32 and args.interp_refresh == 16
                      and repc)
    if not args.smoke and jax.default_backend() == "tpu" and default_config:
        # refresh the dead-tunnel fallback record — only from a REAL
        # on-chip run AT THE DEFAULT CONFIG; a CPU-backend run or a
        # non-default workload (--batch_size/--f32/... sweeps) must not
        # poison the "last-known-good on-chip measurement" (ADVICE r3)
        with open(LKG_PATH, "w") as f:
            json.dump({**line, "bench_config": bench_config,
                       "measured_at": time.strftime("%Y-%m-%d %H:%M")},
                      f, indent=2)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
