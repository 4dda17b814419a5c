"""Driver entry-point gate: ``__graft_entry__`` must work in a FRESH process.

Round 1's ``MULTICHIP_r01.json`` failure happened because ``dryrun_multichip``
assumed the driver's environment already exposed ``n_devices`` JAX devices,
while the axon TPU plugin registers a 1-chip platform regardless of
``XLA_FLAGS=--xla_force_host_platform_device_count``.  These tests run the
entry points in a clean subprocess WITHOUT pytest's conftest environment, so
they reproduce the driver's conditions exactly (VERDICT round 1, item 1).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Driver-like env: no conftest platform forcing."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    return env


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    code = (
        "import jax\n"
        "jax.devices()\n"  # driver may touch the real backend first
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "assert jax.device_count() >= 8, jax.devices()\n"
        "print('MULTICHIP_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert out.returncode == 0, f"stdout={out.stdout}\nstderr={out.stderr[-3000:]}"
    assert "MULTICHIP_OK" in out.stdout


def test_entry_falls_back_to_cpu_on_dead_backend(monkeypatch):
    """entry() must yield a CPU compile-check when the chip backend errors
    out (tunnel outage) instead of crashing the driver gate."""
    import jax

    import __graft_entry__ as g

    real_devices = jax.devices
    calls = {"n": 0}

    def flaky_devices(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("UNAVAILABLE (simulated dead tunnel)")
        return real_devices(*a, **kw)

    monkeypatch.setattr(jax, "devices", flaky_devices)
    monkeypatch.delenv("ITAL_TPU_PLATFORM", raising=False)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert len(out[1]) == 4 and calls["n"] >= 1


def test_provision_devices_noop_when_enough():
    """With >= n devices already present (conftest's 8 CPU), nothing changes."""
    import jax

    import __graft_entry__ as g

    before = jax.devices()
    g._provision_devices(8)
    assert jax.devices() == before
