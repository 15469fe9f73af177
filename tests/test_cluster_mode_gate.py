"""Default-gate coverage for the multi-executor parity module.

tests/test_cluster_mode.py self-skips whenever another SparkSession is
already active in the process (one JVM gateway per interpreter), which is
always true under a combined ``pytest tests/`` run — so the
``preserve_partitioning=False`` rewrap branch (pregel.truncate_plan) had no
coverage in the default gate.  This wrapper runs that module in a FRESH
interpreter via subprocess, where no session exists yet, and fails if any
of its tests skipped or failed — making `python -m pytest tests/ -q` truly
exercise local-cluster mode with zero skips.
"""

import os
import re
import subprocess
import sys


def test_cluster_mode_module_passes_in_fresh_interpreter():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # keep the child's JVMs off any pinned scaling-leg cores is the
    # caller's concern; the child only needs a clean interpreter
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(repo, "tests", "test_cluster_mode.py"),
         "-q", "--no-header", "-p", "no:cacheprovider"],
        capture_output=True, text=True, timeout=580, cwd=repo, env=env,
    )
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    assert r.returncode == 0, f"cluster-mode module failed:\n{tail}"
    m = re.search(r"(\d+) passed", r.stdout)
    assert m and int(m.group(1)) >= 2, f"expected >=2 passed:\n{tail}"
    assert "skipped" not in r.stdout, (
        f"cluster-mode tests skipped inside the fresh interpreter:\n{tail}"
    )
