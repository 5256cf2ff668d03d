"""CLI layer: preset registries must transcribe the reference experiment
blocks exactly, and every preset must construct a physical world."""
import json
import subprocess
import sys

import numpy as np
import pytest

from climatemodel_tpu import cli


@pytest.mark.parametrize('world', cli.GREY_WORLDS)
def test_grey_world_presets_construct(world):
    """Every radiation_script.py experiment block builds a GreyGas with an
    earth-like grid and the block's surface optical depth (the args must land
    in the right parameter slots — p_widths in Pa, taus dimensionless)."""
    from climatemodel_tpu.models.grey import GreyGas
    kw = cli.grey_world_kwargs(world)
    g = GreyGas(nz='auto', ny=1, **kw)
    assert 100 < g.nz < 2000
    # all blocks use tau_lw_surface=4; the auto grid resolves it to ~4
    assert 3.0 < float(np.max(g.tau[0])) < 5.0
    if kw.get('tau_sw_func') is not None:
        assert np.isfinite(np.asarray(g.tau_sw)).all()


def test_grey_world_args_match_reference_blocks():
    """Spot-check the transcriptions against /root/reference/
    radiation_script.py:15-36 (args in the reference's order)."""
    from climatemodel_tpu.constants import p_surface_earth
    th = cli.grey_world_kwargs('thermosphere')
    assert th['tau_lw_func_args'] == [51000, 4, 100, 600, 0.1]
    assert th['tau_sw_func_args'] == [p_surface_earth, 0.12, 100, 20, 0.002]
    me = cli.grey_world_kwargs('mesosphere')
    assert me['tau_lw_func'] == 'scale_height_and_peak_in_atmosphere'
    assert me['tau_sw_func_args'] == [10000, 2000, 0.05]
    st = cli.grey_world_kwargs('stratosphere')
    assert st['tau_lw_func'] == 'exponential'
    assert st['tau_sw_func_args'] == [30000, 2000, 0.5]
    an = cli.grey_world_kwargs('analytic_sw')
    # alpha ratio lw/sw must be the integer 5 for the analytic solution
    from climatemodel_tpu.ops import optical_depth as od
    alpha_lw = od.get_exponential_alpha(an['tau_lw_func_args'][0])
    alpha_sw = od.get_exponential_alpha(an['tau_sw_func_args'][0])
    assert alpha_lw / alpha_sw == pytest.approx(5.0)


@pytest.mark.parametrize('scenario', cli.SHALLOW_SCENARIOS)
def test_shallow_scenarios_construct(scenario):
    from climatemodel_tpu.models.shallow_water import ShallowWater
    kw, run = cli.shallow_scenario(scenario)
    world = ShallowWater(**kw)
    assert np.isfinite(np.asarray(world.h)).all()
    assert run['n_days'] > 0


def test_main_module_importable():
    """`import climatemodel_tpu.__main__` must not execute the CLI
    (no SystemExit at import time)."""
    code = ('import importlib; '
            'importlib.import_module("climatemodel_tpu.__main__"); '
            'print("import-ok")')
    out = subprocess.run([sys.executable, '-c', code], capture_output=True,
                         text=True)
    assert out.returncode == 0, out.stderr
    assert 'import-ok' in out.stdout


def test_cli_real_gas_sweep_find_tg():
    """real-gas --sweep N --find-tg: vmapped insolation members, vectorised
    T_g solve, JSON record with per-member results."""
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(['real-gas', '--nz', '30', '--sweep', '2',
                  '--find-tg', '--flux-thresh', '0.1'])
    rec = json.loads(buf.getvalue().splitlines()[-1])
    assert rec['converged'] == 2
    assert len(rec['T_g']) == 2
    # brighter star solves a warmer balanced ground temperature
    assert rec['T_g'][1] > rec['T_g'][0]


def test_cli_find_tg_requires_sweep():
    with pytest.raises(SystemExit, match='requires --sweep'):
        cli.main(['real-gas', '--find-tg'])


def test_cli_sweep_writes_plot_and_out(tmp_path):
    import contextlib
    import io
    plot = tmp_path / 'sweep.png'
    out = tmp_path / 'sweep.npz'
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(['real-gas', '--nz', '30', '--sweep', '2',
                  '--flux-thresh', '0.5', '--plot', str(plot),
                  '--out', str(out)])
    assert plot.exists() and plot.stat().st_size > 0
    assert out.exists() and out.stat().st_size > 0


def test_cli_grey_end_to_end(tmp_path):
    """One fast end-to-end CLI march (small fixed grid, loose threshold)."""
    argv = ['grey', '--world', 'scale_height', '--nz', '40',
            '--flux-thresh', '5.0']
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(argv)
    rec = json.loads(buf.getvalue().splitlines()[-1])
    assert rec['world'] == 'scale_height'
    assert rec['nz'] == 40
    assert rec['steps'] > 0
    assert np.isfinite(rec['T_surface'])


def test_grey_sensitivity_flag(capsys, tmp_path, monkeypatch):
    """--sensitivity reports dT_surface/dF_stellar at the marched radiative
    equilibrium (matching the exact grey oracle T/(4F)); with --convective it
    routes to the pooled RCE solve instead of refusing (r03 advisor)."""
    from climatemodel_tpu.constants import F_sun
    cli.main(['grey', '--world', 'scale_height', '--nz', '40',
              '--sensitivity'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    expect = out['T_surface'] / (4.0 * F_sun)
    assert abs(out['dT_surface_dF_stellar'] / expect - 1) < 0.02
    cli.main(['grey', '--world', 'scale_height', '--nz', '40',
              '--convective', '--sensitivity'])
    out_c = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # same order of magnitude as the radiative response; finite and positive
    assert 0 < out_c['dT_surface_dF_stellar'] < 10 * expect


def test_cli_dip_memory_matches_per_step(capsys):
    """--check-every 8 --dip-memory returns the per-step march's exact
    endpoint and step count (the dip-memory chunked exit is bit-identical,
    column.evolve_to_equilibrium)."""
    argv = ['grey', '--world', 'thermosphere', '--nz', '40',
            '--flux-thresh', '1e-1', '--convective']
    cli.main(argv)
    per_step = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cli.main(argv + ['--check-every', '8', '--dip-memory'])
    dip = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dip['steps'] == per_step['steps']
    assert dip['T_surface'] == per_step['T_surface']
    assert dip['max_net_flux'] == per_step['max_net_flux']


def test_cli_honors_jax_platforms_env():
    """The CLI must mirror JAX_PLATFORMS into jax.config before any jax use:
    plugin backends ignore the env var alone (the axon sitecustomize even
    force-overrides jax_platforms at interpreter start), so without the
    mirror a CPU-intended run initializes the TPU tunnel — and hangs forever
    when it is wedged.  A nonexistent platform stands in for the wedged
    tunnel: the run must fail FAST with the configured platform in the error,
    proving the env var (not the sitecustomize default) won."""
    import os
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'definitely_not_a_platform'
    env.pop('JAX_PLATFORM_NAME', None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, '-m', 'climatemodel_tpu', 'grey', '--world',
         'scale_height', '--nz', '40', '--flux-thresh', '5.0'],
        cwd=repo, env=env, capture_output=True, text=True, timeout=180)
    assert proc.returncode != 0
    assert 'definitely_not_a_platform' in (proc.stderr + proc.stdout)


def test_examples_honor_platform_env():
    """Every example script must mirror JAX_PLATFORMS into jax.config right
    after making the package importable: plugin backends (the axon TPU
    tunnel) ignore the env var alone, so without the mirror a
    JAX_PLATFORMS=cpu run of an example initializes the tunnel and hangs
    when it is wedged (the r04 arctic-walkthrough incident).  Static check
    so any future example inherits the rule."""
    import glob
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = sorted(glob.glob(os.path.join(root, 'examples', '*.py')))
    assert scripts
    import re
    for path in scripts:
        src = open(path).read()
        # a REAL top-level call statement, not a mention in a comment or
        # docstring
        m = re.search(r'^honor_platform_env\(\)', src, re.MULTILINE)
        assert m, os.path.basename(path)
        # and the call must come before the first climatemodel/jax import
        # that could trigger backend init (any model/ops import)
        call = m.start()
        for needle in ('from climatemodel_tpu.models', 'import jax',
                       'from climatemodel_tpu.diagnostics'):
            pos = src.find(needle)
            if pos != -1:
                assert call < pos, (os.path.basename(path), needle)


def test_honor_platform_env_helper(tmp_path):
    """Functional: with JAX_PLATFORMS set to a bogus platform the helper
    makes jax fail FAST (config rejects it / backend lookup errors) instead
    of silently initializing the plugin backend."""
    code = (
        "import os; os.environ['JAX_PLATFORMS']='definitely_not_a_platform'\n"
        "from climatemodel_tpu.utils.platform import honor_platform_env\n"
        "assert honor_platform_env() == 'definitely_not_a_platform'\n"
        "import jax\n"
        "try:\n"
        "    jax.devices(); raise SystemExit(3)\n"
        "except RuntimeError:\n"
        "    print('failed fast')\n"
    )
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, '-c', code], capture_output=True,
                          text=True, timeout=120, cwd=repo)
    assert proc.returncode == 0, proc.stderr
    assert 'failed fast' in proc.stdout


def test_api_doc_in_sync():
    """docs/api.md is generated from the sources' docstrings; regenerating
    must reproduce the committed file (run python tools/gen_api_doc.py after
    adding or renaming public symbols), and every public symbol must carry a
    docstring (the generator would emit '(see source)')."""
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, 'tools'))
    try:
        import gen_api_doc
        want = gen_api_doc.generate()
    finally:
        sys.path.pop(0)
    got = open(os.path.join(root, 'docs', 'api.md')).read()
    assert got == want, 'docs/api.md stale: run python tools/gen_api_doc.py'
    assert '(see source)' not in want, 'public symbol missing a docstring'
