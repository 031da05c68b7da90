"""tools/sidecar_cpu.py unit coverage: the scaling campaign's per-actual-
core accounting must read ~1 core for a single busy loop, ~0 for sleep,
follow children, and survive /proc comm names containing spaces/parens.
Loose bounds — this runs on a contended shared host."""

from __future__ import annotations

import subprocess
import sys
import time

sys.path.insert(0, "/root/repo/tools")

from sidecar_cpu import TreeCpuSampler, _stat_fields  # noqa: E402


def test_stat_fields_own_process():
    ppid, cpu = _stat_fields(subprocess.os.getpid())
    assert ppid > 0 and cpu >= 0.0


def test_comm_with_spaces_and_parens():
    """comm is parsed after the LAST ')' — a child named ') 1 2 (' must
    not shift the field offsets."""
    p = subprocess.Popen(
        [sys.executable, "-c",
         "import ctypes, time; "
         "ctypes.CDLL(None).prctl(15, b') 1 2 (', 0, 0, 0); time.sleep(5)"]
    )
    try:
        time.sleep(0.5)
        f = _stat_fields(p.pid)
        assert f is not None
        ppid, cpu = f
        assert 0.0 <= cpu < 2.0  # sleeping: near-zero, parsed sanely
    finally:
        p.kill()
        p.wait()


def test_tree_accounting_follows_children():
    """A parent that spawns a busy child: the TREE total must include the
    child's CPU, and keep it after the child exits (no loss to reaping)."""
    code = (
        "import subprocess, sys, time\n"
        "c = subprocess.Popen([sys.executable, '-c', "
        "'import time,hashlib\\n"
        "t0=time.time()\\n"
        "while time.time()-t0<2: hashlib.md5(b\"x\"*8192).digest()'])\n"
        "c.wait()\n"
        "time.sleep(1.5)\n"  # child reaped; tree total must persist
    )
    p = subprocess.Popen([sys.executable, "-c", code])
    sampler = TreeCpuSampler(p.pid, interval=0.25).start()
    p.wait()
    acct = sampler.stop()
    assert acct["tree_cpu_sec"] >= 1.0, acct  # child burned ~2s CPU
    assert acct["wall_sec"] >= 3.0


def test_sleep_process_reads_near_zero_cores():
    p = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(4)"])
    sampler = TreeCpuSampler(p.pid, interval=0.25).start()
    p.wait()
    acct = sampler.stop()
    assert acct["tree_cpu_sec"] < 1.0
    if "steady_state_cores" in acct:
        assert acct["steady_state_cores"] < 0.5


# ---------------------------------------------------------------------------
# in-flight bus probe (tools/bus_probe.py)
# ---------------------------------------------------------------------------


def test_bus_probe_samples_and_summarizes():
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from bus_probe import BusProbe

    p = BusProbe(period=0.2, burst_mb=1, burst_reps=2).start()
    import time

    time.sleep(1.0)
    s = p.stop()
    assert s["n_samples"] >= 2
    assert s["burst_min_s"] > 0
    assert s["burst_min_s"] <= s["burst_median_s"] <= s["burst_max_s"]
    assert s["median_over_min"] >= 1.0
    assert len(s["samples_s"]) == s["n_samples"]


def test_bus_probe_empty_stop_is_safe():
    from bus_probe import BusProbe

    p = BusProbe(period=10.0)
    # never started: stop() must not hang or divide by zero
    assert p.stop() == {"n_samples": 0}
