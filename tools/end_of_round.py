"""End-of-round gate (VERDICT r4 task 1): one judge-reproducible command
that must exit 0 on the final tree before a round closes, so post-gate
additions can never land unaudited again (r4 shipped a CRIT-flagged plan
because the audit ran before the last commits).

Runs, in order, and fails fast on the first red:

  1. doc-count drift      tools/gen_catalog.py --check
  2. window ledger        tools/gen_window_ledger.py --check
  3. window invariants    the single test_queries_smoke window test
                          (PRIORITY parity, headliners in-window,
                          rolling-3 family coverage — seconds)
  4. window determinism   tools/determinism_sweep.py sf0.001 (the
                          3-session certificate — 5-part / 32-part /
                          AQE-off — over the exact window the driver
                          is about to hash; VERDICT r11 task 7)
  5. physical-plan audit  tools/plan_audit.py  (full catalog, sf0.001)
  6. scale-probe bands    tools/scaling_probe.py quick (x1/x4 ratios)
  7. correctness gate     tools/verify_local.py /root/testdata/sf0.01

The FULL pytest suite is intentionally not included (it is its own CI
surface and takes ~20 min); run it separately. Usage:
python tools/end_of_round.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = [
    ("doc-count drift", [sys.executable, "tools/gen_catalog.py", "--check"]),
    ("window ledger", [sys.executable, "tools/gen_window_ledger.py", "--check"]),
    # window-policy invariants (r11): PRIORITY == checked prefix, all
    # oracle-backed, headliners in-window, rolling-3 family coverage —
    # seconds to run, and a bad rotation must fail THIS gate, not pytest
    # hours later
    (
        "window invariants",
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_queries_smoke.py::test_driver_window_samples_every_family",
            "-q",
            "--no-header",
            "-p",
            "no:cacheprovider",
        ],
    ),
    # window-scope 3-session determinism certificate (VERDICT r11
    # task 7): the exact PRIORITY surface the driver will hash, under
    # 5/32 shuffle partitions and an AQE-off pass, in separate
    # processes — partition-count- or scheduling-dependent results
    # fail HERE, not at the driver (~3 min at sf0.001)
    (
        "window determinism",
        [sys.executable, "tools/determinism_sweep.py", "/root/testdata/sf0.001"],
    ),
    ("plan audit", [sys.executable, "tools/plan_audit.py", "/root/testdata/sf0.001"]),
    # quick scale-probe pass (VERDICT r6 task 6): x1/x4 factors of the
    # four probes, per-unit ratios asserted against stored bands so a
    # formulation change that reintroduces a superlinear stage fails
    # THIS gate, not the next judge (~5 min)
    ("scale-probe bands", [sys.executable, "tools/scaling_probe.py", "quick"]),
    ("correctness gate", [sys.executable, "tools/verify_local.py", "/root/testdata/sf0.01"]),
]


def main() -> int:
    for label, cmd in STEPS:
        t0 = time.time()
        print(f"==> {label}: {' '.join(cmd[1:])}", flush=True)
        proc = subprocess.run(cmd, cwd=REPO)
        dt = time.time() - t0
        if proc.returncode != 0:
            print(f"RED  {label} exited {proc.returncode} after {dt:.0f}s")
            return 1
        print(f"ok   {label} [{dt:.0f}s]", flush=True)
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
