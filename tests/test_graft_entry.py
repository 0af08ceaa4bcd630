"""Driver-contract tests for __graft_entry__.

dryrun_multichip must produce a green run under the container's *default*
environment (JAX_PLATFORMS pinned to the tunneled TPU plugin) — round 1
failed exactly here (MULTICHIP_r01.json rc=1: the dry run initialized the
mismatched-libtpu TPU backend instead of the virtual CPU mesh).  These tests
invoke it the way the driver does: a fresh subprocess, no helpful env vars.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(extra_env):
    env = dict(os.environ)
    # Undo conftest's CPU pinning so the subprocess sees the container
    # default (the driver does not set these).
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("_GRAFT_DRYRUN_SUBPROCESS", None)
    env.update(extra_env)
    # cold-cache CPU compile of the 8-device GHND step takes ~13 min on a
    # loaded 1-core host (warm .jax_cache: ~3 min) — budget the cold case
    return subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)


@pytest.mark.slow
@pytest.mark.rendezvous
def test_dryrun_multichip_default_env():
    """Exactly the driver's invocation: default container env, n=8."""
    proc = _run_dryrun({})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): loss=" in proc.stdout


def test_dryrun_multichip_preinitialized_jax_falls_back():
    """If jax was already initialized with too few devices, the dry run must
    re-exec itself into a CPU-pinned subprocess rather than fail.

    The subprocess launch is stubbed: this pins the *fallback decision and
    environment* deterministically (the earlier full-execution variant raced
    XLA-CPU's collective rendezvous under serial-suite load — the real
    end-to-end run is covered once by test_dryrun_multichip_default_env)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("_GRAFT_DRYRUN_SUBPROCESS", None)
    # Without this pop, `import jax` in the stub subprocess still dials the
    # tunneled TPU plugin (sitecustomize registers it off this variable) and
    # hangs for the full timeout whenever the tunnel is wedged — the product
    # code pops it too (__graft_entry__._dryrun_in_subprocess).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.devices()\n"                 # pre-initialize: 1 dev
        "import subprocess\n"
        "calls = []\n"
        "def fake_run(cmd, env=None, cwd=None):\n"
        "    calls.append((env.get('JAX_PLATFORMS'),\n"
        "                  env.get('_GRAFT_DRYRUN_SUBPROCESS'),\n"
        "                  env.get('_GRAFT_DRYRUN_MODE'),\n"
        "                  env.get('XLA_FLAGS', '')))\n"
        "    class P: returncode = 0\n"
        "    return P()\n"
        "subprocess.run = fake_run\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "assert len(calls) == 1, calls\n"
        "plat, sub, mode, flags = calls[0]\n"
        "assert plat == 'cpu' and sub == '1' and mode == 'ghnd', calls\n"
        "assert '--xla_force_host_platform_device_count=8' in flags, flags\n"
        "print('FALLBACK-OK')\n")
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FALLBACK-OK" in proc.stdout


class TestDryrunRetry:
    """Fast unit coverage of the subprocess retry harness (the slow tests
    above exercise the real thing)."""

    def test_falls_back_to_hnd_then_raises(self, monkeypatch):
        import __graft_entry__ as g

        calls = []

        class FakeProc:
            def __init__(self, rc):
                self.returncode = rc

        def fake_run(cmd, env=None, cwd=None):
            calls.append(env["_GRAFT_DRYRUN_MODE"])
            return FakeProc(-6)

        import subprocess as sp
        monkeypatch.setattr(sp, "run", fake_run)
        try:
            g._dryrun_in_subprocess(8, attempts=2)
            raised = False
        except RuntimeError as e:
            raised = "after 2 attempts" in str(e)
        assert raised
        assert calls == ["ghnd", "hnd"]

    def test_succeeds_on_retry(self, monkeypatch):
        import subprocess as sp

        import __graft_entry__ as g

        rcs = iter([-6, 0])
        calls = []

        class FakeProc:
            def __init__(self, rc):
                self.returncode = rc

        def fake_run(cmd, env=None, cwd=None):
            calls.append(env["_GRAFT_DRYRUN_MODE"])
            return FakeProc(next(rcs))

        monkeypatch.setattr(sp, "run", fake_run)
        g._dryrun_in_subprocess(8, attempts=2)  # must not raise
        assert calls == ["ghnd", "hnd"]

    def test_collective_timeout_flags_injected(self, monkeypatch):
        import subprocess as sp

        import __graft_entry__ as g

        seen = {}

        class FakeProc:
            returncode = 0

        def fake_run(cmd, env=None, cwd=None):
            seen.update(env)
            return FakeProc()

        monkeypatch.setattr(sp, "run", fake_run)
        g._dryrun_in_subprocess(8)
        flags = seen["XLA_FLAGS"]
        assert "--xla_force_host_platform_device_count=8" in flags
        assert "--xla_cpu_collective_call_terminate_timeout_seconds" in flags
        assert seen["JAX_PLATFORMS"] == "cpu"
        assert "JAX_COMPILATION_CACHE_DIR" in seen
