"""The driver-window rotation policy (README "Driver-window rotation")
is enforced at test time: tools/rotation_check.py reads the committed
CORRECTNESS_r*.json window history and fails when a never-gated backlog
exists but fewer than five of its members entered the current window.
Running it here means a round that forgets to rotate goes red in the
suite before the driver gate ever sees the stale window."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_policy_holds():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rotation_check.py"),
         "--repo", REPO],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
