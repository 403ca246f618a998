"""Run the whole pending chip-measurement queue in ONE process.

The tunnel's fresh-process ramp (first-execution queueing of cached
programs: 272-741 s measured for the same executables) is paid per
PROCESS, so chaining the measurement scripts in one interpreter amortizes
it. Order: bench first (warms the serving+train program set and the XLA
disk cache — which also primes the driver's later bench run), then the
profilers.

    python scripts/chip_session.py [only ...]

``only``: optional subset filter by name substring (e.g. ``profile roi``).
Each stage is isolated: a failure prints and the queue continues.
"""

import runpy
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

STAGES = [
    ("bench", REPO / "bench.py"),
    ("train_profile", REPO / "scripts" / "train_profile.py"),
    ("kernel_bench", REPO / "scripts" / "kernel_bench.py"),
    ("roi_overlap", REPO / "scripts" / "roi_overlap_bench.py"),
]


def main():
    only = [a.lower() for a in sys.argv[1:]]
    ran, failed = [], []
    for name, path in STAGES:
        if only and not any(o in name for o in only):
            continue
        print(f"=== chip_session: {name} ({path.name}) ===", flush=True)
        t0 = time.monotonic()
        argv0 = sys.argv
        sys.argv = [str(path)]  # scripts read sys.argv; no smoke args here
        try:
            runpy.run_path(str(path), run_name="__main__")
            ran.append(name)
        except SystemExit as e:  # bench.py exits via sys.exit(main())
            if e.code in (0, None):
                ran.append(name)
            else:
                failed.append((name, f"exit {e.code}"))
        except Exception as e:  # keep the queue moving
            failed.append((name, repr(e)))
            print(f"chip_session: {name} FAILED: {e!r}", file=sys.stderr, flush=True)
        finally:
            sys.argv = argv0
        print(f"=== {name}: {time.monotonic() - t0:.0f}s ===", flush=True)
    print(f"chip_session done: ran={ran} failed={failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
