"""Driver-contract regressions for __graft_entry__."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_force_cpu_mesh_replaces_stale_device_count():
    """A smaller xla_force_host_platform_device_count already in XLA_FLAGS
    must be REPLACED, not kept: skipping the append capped the device count
    below n_devices, _force_cpu_mesh returned False, and the subprocess
    fallback inherited the identical env — recursing forever."""
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    code = (
        "import __graft_entry__ as g\n"
        "import os\n"
        "ok = g._force_cpu_mesh(4)\n"
        "assert ok, (os.environ.get('XLA_FLAGS'),)\n"
        "flags = os.environ['XLA_FLAGS']\n"
        "assert 'device_count=4' in flags and 'device_count=2' not in flags,"
        " flags\n"
        "print('FORCE_CPU_OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "FORCE_CPU_OK" in out.stdout
