"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-substitute test strategy the reference lacks entirely
(SURVEY.md §4): kernels and sharding validate against numpy oracles on
CPU; the real chip is only needed for benchmarks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual devices share the host's cores: one heavy sharded program
    # can legitimately take minutes before every device thread reaches its
    # first collective — the default 20s/40s rendezvous watchdog would
    # kill a correct-but-slow program (observed at 16384-row eval batches)
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import signal  # noqa: E402

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout(seconds): abort the test if it runs longer (SIGALRM; "
        "pytest-timeout is not installed in this image, so the mark is "
        "enforced here — a hung multi-process test must not hang the "
        "whole suite)")
    config.addinivalue_line(
        "markers",
        "slow: heavy 8-virtual-device / multi-process suites. `-m quick` "
        "covers every source module and runs in roughly half the full "
        "suite's wall time (measured ~8-16 min for quick vs ~18-26 min "
        "full, load-dependent, on a 1-CPU box); `-m slow` runs the "
        "rest; no -m runs all")
    config.addinivalue_line(
        "markers", "quick: complement of slow, auto-applied at collection")


# single source of tiering truth: the 8-virtual-device execution suites
# dominate the 20+ min full run on a 1-CPU box. Everything in these files
# is slow EXCEPT the compile-only HLO traffic audits ("hlo" in the name,
# ~20s each) — they are the quick tier's coverage of parallel/.
_SLOW_FILES = {"test_sharding.py", "test_mesh2.py", "test_multihost.py"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.fspath.basename in _SLOW_FILES
                and "hlo" not in item.name):
            item.add_marker(pytest.mark.slow)
    # `-m quick` == everything not marked slow (auto-tag, so the two
    # tiers partition the suite exactly)
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    if marker and hasattr(signal, "SIGALRM"):
        seconds = int(marker.args[0])

        def _on_alarm(signum, frame):
            raise TimeoutError(
                f"{item.nodeid} exceeded its {seconds}s timeout mark")

        old = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(seconds)
        try:
            yield
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    else:
        yield
