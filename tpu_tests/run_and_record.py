"""Run the real-Mosaic TPU kernel tests and record the result + revision.

    timeout 1800 python tpu_tests/run_and_record.py

Appends one JSON line to docs/TPU_TESTS_LOG.jsonl (git revision, pass/fail
counts, duration) so the repo records which revision last ran the on-chip
suite green (VERDICT r1 weak #8: the CPU interpret-mode tests cannot catch
Mosaic layout/alignment regressions).
"""

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         cwd=ROOT, capture_output=True, text=True
                         ).stdout.strip()
    dirty = bool(subprocess.run(["git", "status", "--porcelain"],
                                cwd=ROOT, capture_output=True,
                                text=True).stdout.strip())
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tpu_tests/", "-q", "--tb=line"],
        cwd=ROOT, capture_output=True, text=True)
    out = proc.stdout.splitlines()
    summary = out[-1] if out else ""
    rec = {
        "revision": rev + ("+dirty" if dirty else ""),
        "rc": proc.returncode,
        "summary": summary,
        "duration_s": round(time.time() - t0, 1),
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    log = ROOT / "docs" / "TPU_TESTS_LOG.jsonl"
    with open(log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    print(proc.stdout[-3000:])
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
