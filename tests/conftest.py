"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

jax may already be imported by pytest plugins (jaxtyping) before this conftest
runs, and jax bakes JAX_PLATFORMS into its config at import time — so we must
use jax.config.update, not os.environ. The XLA flag for virtual host devices is
read lazily at first backend init, so the env var is still effective here.
Physics-fidelity tests need float64 (MuJoCo computes in double); RL-op tests
pass explicit float32 inputs so they still exercise the TPU dtype path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the fast tier is compile-dominated on a
# 2-core host (fresh CPU compiles of physics programs), so warm re-runs get
# most of their time back. The cache dir is gitignored; the first run on a
# fresh host seeds it.
if not os.environ.get("PPO_TPU_NO_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


# ---- test_lanes.py process isolation ---------------------------------------
# Known XLA-CPU issue (3x reproduced, cache-independent): the first heavy
# compile AFTER test_lanes.py completes in the same process can segfault
# backend_compile. Rather than asking humans to run the suite in two
# invocations (the round-4 README workaround), run the test_lanes items in ONE
# child pytest process and merge its per-test results back as normal reports —
# `python -m pytest tests/` is a single green command again.

_LANES_GUARD = "PPO_TPU_LANES_IN_SUBPROCESS"
_lanes_cache: dict = {}


def _needs_isolation(item):
    if os.environ.get(_LANES_GUARD):
        return False  # we ARE the child
    if os.path.basename(str(item.fspath)) != "test_lanes.py":
        return False
    # only needed when other files share the process; a pure test_lanes
    # invocation is safe in-process (every file is green alone)
    return any(
        os.path.basename(str(i.fspath)) != "test_lanes.py" for i in item.session.items
    )


def _lanes_results(item):
    """Run ONE test_lanes item in its own child pytest (the segfault can
    strike between heavy in-process compiles WITHIN the file too, not just
    after it — each item gets a fresh process; the persistent compile cache
    keeps repeat compiles cheap). Returns (outcome, message), cached per
    nodeid."""
    if item.nodeid in _lanes_cache:
        return _lanes_cache[item.nodeid]
    import subprocess
    import sys
    import tempfile
    import xml.etree.ElementTree as ET

    xml_path = os.path.join(tempfile.mkdtemp(), "lanes.xml")
    target = f"{item.fspath}::{item.name}"
    cmd = [sys.executable, "-m", "pytest", target, "-q",
           f"--junitxml={xml_path}", "-p", "no:cacheprovider"]
    env = dict(os.environ, **{_LANES_GUARD: "1"})
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=os.path.dirname(os.path.dirname(__file__)))
    result = None
    try:
        root = ET.parse(xml_path).getroot()
        for case in root.iter("testcase"):
            if case.attrib["name"] != item.name:
                continue
            if case.find("failure") is not None or case.find("error") is not None:
                node = case.find("failure") if case.find("failure") is not None else case.find("error")
                result = ("failed", node.attrib.get("message", "") + "\n" + (node.text or ""))
            elif case.find("skipped") is not None:
                result = ("skipped", case.find("skipped").attrib.get("message", ""))
            else:
                result = ("passed", "")
    except Exception:
        pass
    if result is None:
        result = (
            "failed",
            f"child pytest for {target} produced no junit result (rc {proc.returncode})\n"
            f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}",
        )
    _lanes_cache[item.nodeid] = result
    return _lanes_cache[item.nodeid]


def pytest_runtest_protocol(item, nextitem):
    if not _needs_isolation(item):
        return None
    from _pytest.reports import TestReport

    outcome, msg = _lanes_results(item)
    item.ihook.pytest_runtest_logstart(nodeid=item.nodeid, location=item.location)
    reports = []
    for when in ("setup", "call", "teardown"):
        if when == "call":
            rep = TestReport(
                nodeid=item.nodeid, location=item.location,
                keywords={item.name: 1}, outcome=outcome,
                longrepr=None if outcome == "passed" else
                (str(item.fspath), 0, msg) if outcome == "skipped" else msg,
                when=when, duration=0.0,
            )
        else:
            rep = TestReport(
                nodeid=item.nodeid, location=item.location,
                keywords={item.name: 1}, outcome="passed", longrepr=None,
                when=when, duration=0.0,
            )
        reports.append(rep)
        item.ihook.pytest_runtest_logreport(report=rep)
    item.ihook.pytest_runtest_logfinish(nodeid=item.nodeid, location=item.location)
    return True
