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
    """Run tests/test_lanes.py once in a child pytest, return {name: (outcome,
    message)} parsed from its junit xml."""
    if _lanes_cache:
        return _lanes_cache
    import subprocess
    import sys
    import tempfile
    import xml.etree.ElementTree as ET

    xml_path = os.path.join(tempfile.mkdtemp(), "lanes.xml")
    cmd = [sys.executable, "-m", "pytest", str(item.fspath), "-q",
           f"--junitxml={xml_path}", "-p", "no:cacheprovider"]
    markexpr = item.config.option.markexpr
    if markexpr:
        cmd += ["-m", markexpr]
    if item.config.option.keyword:
        cmd += ["-k", item.config.option.keyword]
    env = dict(os.environ, **{_LANES_GUARD: "1"})
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=os.path.dirname(os.path.dirname(__file__)))
    try:
        root = ET.parse(xml_path).getroot()
        for case in root.iter("testcase"):
            name = case.attrib["name"]
            if case.find("failure") is not None or case.find("error") is not None:
                node = case.find("failure") if case.find("failure") is not None else case.find("error")
                _lanes_cache[name] = ("failed", node.attrib.get("message", "") + "\n" + (node.text or ""))
            elif case.find("skipped") is not None:
                _lanes_cache[name] = ("skipped", case.find("skipped").attrib.get("message", ""))
            else:
                _lanes_cache[name] = ("passed", "")
    except Exception:
        _lanes_cache["__error__"] = (
            "failed",
            f"child pytest for test_lanes.py produced no junit xml (rc {proc.returncode})\n"
            f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}",
        )
    return _lanes_cache


def pytest_runtest_protocol(item, nextitem):
    if not _needs_isolation(item):
        return None
    from _pytest.reports import TestReport

    results = _lanes_results(item)
    outcome, msg = results.get(
        item.name,
        results.get("__error__", ("failed", "missing from child test_lanes run")),
    )
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
