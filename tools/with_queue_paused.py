"""Run a command with the chip-queue trees SIGSTOPped, resuming them on
ANY exit path — including SIGTERM/SIGINT (a plain try/finally dies
without cleanup on SIGTERM; this installs handlers that convert both to
SystemExit first).

Usage: python tools/with_queue_paused.py -- <cmd> [args...]
"""

import os
import signal
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the pause/resume helpers live there)


def main():
    argv = sys.argv[1:]
    if argv and argv[0] == "--":
        argv = argv[1:]
    if not argv:
        print(__doc__)
        return 2

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: sys.exit(128 + sig))

    stopped = bench._pause_chip_queue()
    print(f"[with_queue_paused] stopped {len(stopped)} queue procs",
          flush=True)
    child = None
    try:
        child = subprocess.Popen(argv)
        return child.wait()
    finally:
        if child is not None and child.poll() is None:
            child.terminate()
            try:
                child.wait(timeout=30)
            except subprocess.TimeoutExpired:
                child.kill()
        bench._resume_chip_queue(stopped)
        print("[with_queue_paused] queue resumed", flush=True)


if __name__ == "__main__":
    sys.exit(main())
