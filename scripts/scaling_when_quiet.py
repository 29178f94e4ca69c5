"""Launch the scaling measurement only when the HOST is actually quiet.

The shared VM's neighbors saturate either the cores or the memory bus in
bursts of minutes to hours; running the 30-minute scaling protocol into a
loud window wastes the budget and records the neighbor.  This wrapper
polls BOTH engine-independent probes (pure-CPU and memory-bandwidth 2→8
multiprocessing scaling, see scaling_bench.py) every few minutes and
launches the full quiet-pair protocol the first time both certify a quiet
window; if the deadline passes without one, it reports the probe series —
itself evidence of sustained external contention.

    python scripts/scaling_when_quiet.py [max_wait_seconds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import (  # noqa: E402
    MEMBW_QUIET_CEILING,
    MEMBW_QUIET_THRESHOLD,
    QUIET_THRESHOLD,
    membw_probe,
    quiet_probe,
)


def main() -> None:
    max_wait = int(sys.argv[1]) if len(sys.argv) > 1 else 7200
    poll = int(os.environ.get("QUIET_POLL_SEC", "150"))
    t0 = time.time()
    series = []
    while time.time() - t0 < max_wait:
        cpu = quiet_probe()
        bw = membw_probe()
        load1 = round(os.getloadavg()[0], 2)
        series.append({"t": round(time.time() - t0), "cpu": cpu, "membw": bw, "load1": load1})
        print(json.dumps(series[-1]), flush=True)
        # same band as the pair criterion: a bw reading far above 1.0 means
        # the probe's own 2-proc baseline hit a burst — launching into such
        # a window wastes the session budget (observed: launcher fired at
        # bw=12.1 and the session yielded 1 quiet pair out of 6)
        if cpu >= QUIET_THRESHOLD and MEMBW_QUIET_THRESHOLD <= bw <= MEMBW_QUIET_CEILING:
            print(json.dumps({"launching": True, "after_sec": series[-1]["t"]}), flush=True)
            rc = subprocess.call(
                [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_bench.py")],
                env={**os.environ, "SCALING_REPEATS": os.environ.get("SCALING_REPEATS", "3")},
            )
            print(json.dumps({"scaling_bench_rc": rc}), flush=True)
            return
        time.sleep(poll)
    print(json.dumps({"launched": False, "probe_series": series}), flush=True)


if __name__ == "__main__":
    main()
