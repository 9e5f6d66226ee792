"""Sentinel-gated bench watcher (VERDICT r08 next-round item #1).

Loops: probe the Spark-free machine sentinel (bench.machine_sentinel);
when the worst ratio vs the idle references drops below FIRE_RATIO,
launch a full ``python bench.py`` run and archive its stdout under
``bench_watch/``.  Stops as soon as one run self-stamps
``sentinel_health: "healthy"`` (both before/after probes within 1.3x of
idle), copying the contract line to ``bench_watch/BENCH_HEALTHY.json``.

Run in the background for the whole round:
    python scripts/bench_watch.py --max-hours 6 &
The pre-probe gate means the watcher will NOT fire while the builder's
own pytest / Spark runs are loading the machine (they degrade the
matmul sentinel), so it only spends bench time on plausibly-idle
windows.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import machine_sentinel, sentinel_health  # noqa: E402

FIRE_RATIO = 1.25  # fire only when the pre-probe is at worst 1.25x idle
PROBE_SLEEP_SEC = 120


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-hours", type=float, default=6.0)
    ap.add_argument("--fire-ratio", type=float, default=FIRE_RATIO)
    args = ap.parse_args()

    outdir = REPO / "bench_watch"
    outdir.mkdir(exist_ok=True)
    logf = outdir / "watch.log"
    deadline = time.time() + args.max_hours * 3600

    def log(msg: str) -> None:
        line = f"{time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        with open(logf, "a") as fh:
            fh.write(line + "\n")

    attempt = 0
    while time.time() < deadline:
        s = machine_sentinel()
        health, worst = sentinel_health(s)
        log(f"probe worst_ratio={worst:.2f} ({s})")
        if worst <= args.fire_ratio:
            attempt += 1
            log(f"FIRING bench attempt {attempt}")
            proc = subprocess.run(
                [sys.executable, str(REPO / "bench.py")],
                capture_output=True, text=True, cwd=str(REPO),
                timeout=3600,
            )
            stamp = time.strftime("%H%M%S")
            raw = outdir / f"attempt_{stamp}.out"
            raw.write_text(proc.stdout + "\n--- stderr tail ---\n" + proc.stderr[-2000:])
            try:
                contract = json.loads(proc.stdout.strip().splitlines()[-1])
            except Exception as exc:  # noqa: BLE001
                log(f"attempt {attempt}: could not parse contract line: {exc}")
                continue
            log(
                f"attempt {attempt}: headline={contract.get('value')} "
                f"health={contract.get('sentinel_health')} "
                f"worst={contract.get('sentinel_worst_ratio')}"
            )
            if contract.get("sentinel_health") == "healthy":
                (outdir / "BENCH_HEALTHY.json").write_text(json.dumps(contract, indent=1))
                log("HEALTHY window captured — stopping")
                return 0
        time.sleep(PROBE_SLEEP_SEC)
    log("deadline reached without a healthy capture")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
