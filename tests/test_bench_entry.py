"""Driver entry-point hardening: the two artifacts the driver captures every
round (bench.py's JSON line and __graft_entry__.dryrun_multichip) must stay
usable when the TPU tunnel is unreachable or wedged.

Round 3 lost both records to exactly this: bench.py called jax.devices()
unguarded (rc=1, traceback) and dryrun_multichip initialized the wedged
backend before deciding to re-exec onto the CPU mesh (rc=124 timeout).  These
tests simulate the no-backend environment with a nonexistent JAX platform —
any code path that touches backend init fails FAST instead of hanging, so a
regression shows up as a test failure, not a timeout.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _no_backend_env(n_virtual=None):
    env = dict(os.environ)
    # a platform jax cannot initialize: backend init raises immediately (the
    # fast-failing stand-in for a wedged axon tunnel that would block forever)
    env['JAX_PLATFORMS'] = 'definitely_not_a_platform'
    env.pop('JAX_PLATFORM_NAME', None)
    # the axon plugin's sitecustomize force-overrides jax_platforms to
    # 'axon,cpu' at interpreter start, which would defeat the simulation
    # entirely once the tunnel is healthy (the probe would succeed and the
    # FULL bench would run on the real chip inside this test) — strip it
    # from PYTHONPATH so the fake platform actually takes effect
    pp = [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
          if p and 'axon' not in p]
    if pp:
        env['PYTHONPATH'] = os.pathsep.join(pp)
    else:
        env.pop('PYTHONPATH', None)
    if n_virtual:
        flags = env.get('XLA_FLAGS', '')
        if 'xla_force_host_platform_device_count' not in flags:
            env['XLA_FLAGS'] = (
                flags + f' --xla_force_host_platform_device_count={n_virtual}'
            ).strip()
    return env


def test_bench_emits_json_and_rc0_without_backend():
    """python bench.py with an unreachable backend must exit 0 and print ONE
    parseable JSON record annotated with backend_error + smoke, never a bare
    traceback (VERDICT r03 weak #1)."""
    env = _no_backend_env()
    env['CLIMATEMODEL_TPU_BENCH_TINY'] = '1'       # one sub-minute config
    env['CLIMATEMODEL_TPU_BENCH_PROBE_S'] = '30'   # bad platform fails fast
    proc = subprocess.run([sys.executable, 'bench.py'], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec['metric'] == 'grey_rce_model_days_per_sec'
    extra = rec['extra']
    assert 'backend_error' in extra, extra
    assert extra['smoke'] is True
    assert extra['platform'] == 'cpu'
    # the stdout line must stay COMPACT: the driver records only a ~2k-char
    # tail of stdout, and BENCH_r04's full-extra line was truncated to
    # parsed=null (r04 verdict item 9).  Detail lives in BENCH_FULL.json.
    assert len(line) < 2000, f'stdout record too big ({len(line)} chars)'
    # the tiny config actually ran and produced numbers on the CPU fallback
    assert extra['grey_rce_single_column'] > 0
    with open(os.path.join(REPO, extra['full_record'])) as f:
        full = json.load(f)
    col = full['extra']['grey_rce_single_column']
    assert col['per_step']['model_days_per_sec'] > 0


def test_dryrun_parent_never_initializes_backend():
    """dryrun_multichip's parent decision must not touch jax.devices(): with a
    non-CPU platform configured it must go straight to the virtual-CPU re-exec
    (VERDICT r03 weak #2).  The stubbed re-exec proves the parent reached the
    decision without backend init (which would raise on this fake platform)."""
    code = (
        'import __graft_entry__ as g\n'
        'called = []\n'
        'g._reexec_with_virtual_devices = lambda n: called.append(n)\n'
        'g.dryrun_multichip(8)\n'
        'print("REEXEC_OK" if called == [8] else "FAIL %r" % (called,))\n'
    )
    proc = subprocess.run([sys.executable, '-c', code], cwd=REPO,
                          env=_no_backend_env(), capture_output=True,
                          text=True, timeout=180)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'REEXEC_OK' in proc.stdout, (proc.stdout, proc.stderr[-500:])


def test_dryrun_child_marker_refuses_recursion():
    """A child that still sees too few devices must abort loudly rather than
    fork forever (guards the re-exec against env-propagation bugs)."""
    code = (
        'import os\n'
        'os.environ["_CLIMATEMODEL_TPU_DRYRUN_CHILD"] = "1"\n'
        'import jax\n'
        'jax.config.update("jax_platforms", "cpu")\n'
        'import __graft_entry__ as g\n'
        'try:\n'
        '    g.dryrun_multichip(1024)\n'
        'except RuntimeError as e:\n'
        '    print("REFUSED", e)\n'
    )
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    proc = subprocess.run([sys.executable, '-c', code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=180)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'REFUSED' in proc.stdout


@pytest.mark.parametrize('plat,expected', [
    ('cpu', True), ('cpu,cpu', True), ('axon', False), ('', False),
    ('tpu,cpu', False)])
def test_cpu_only_configured_env(plat, expected, monkeypatch):
    import types

    import __graft_entry__ as g

    # jax.config in THIS process is pinned to cpu by conftest; swap in a stub
    # whose config reports no platform so the helper exercises the env
    # fallback parsing (monkeypatch restores the real module after)
    fake = types.SimpleNamespace(
        config=types.SimpleNamespace(jax_platforms=None))
    monkeypatch.setattr(g, 'jax', fake)
    monkeypatch.setenv('JAX_PLATFORMS', plat)
    assert g._cpu_only_configured() is expected


def test_bench_only_selection_and_cpu_mirror():
    """--only=substring restricts the configs (stamped into the JSON), and an
    explicit JAX_PLATFORMS=cpu run benches the CPU directly (platform
    mirrored into jax.config, no backend_error)."""
    env = _no_backend_env()
    env['JAX_PLATFORMS'] = 'cpu'
    env['CLIMATEMODEL_TPU_BENCH_TINY'] = '1'
    env['CLIMATEMODEL_TPU_BENCH_SMOKE'] = '1'
    env['CLIMATEMODEL_TPU_BENCH_PROBE_S'] = '60'
    proc = subprocess.run(
        [sys.executable, 'bench.py', '--only=grey_rce_single'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    extra = rec['extra']
    assert extra['platform'] == 'cpu'
    assert 'backend_error' not in extra, extra.get('backend_error')
    assert extra['only'] == ['grey_rce_single']
    assert list(extra['config_wall_s']) == ['grey_rce_single_column']
