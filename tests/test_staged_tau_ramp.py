"""Smoke test for the staged time-varying-tau experiment block
(reference radiation_script.py:54-116): per-step lw ramp with
changing_tau=True, sw ramp staging, data_dict-chained equilibrations and the
tau/flux animation all execute on a miniature configuration."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples'))


def test_staged_tau_ramp_mini():
    from staged_tau_ramp import run_staged_tau_ramp
    # nz=60: coarse grids under-resolve the 2000 Pa sw absorption peak and
    # can march stratospheric levels below zero during the sw drop (the
    # reference runs this experiment on the dense nz='auto' grid)
    world, data = run_staged_tau_ramp(
        nz=60, lw_rate=3e-7, sw_rate=3e-2, t_end_years=10.0,
        max_ramp_steps=4000, save_gif=False, n_plot_frames=8)
    T = np.asarray(world.T)
    # all three stages completed: lw ramp topped out, sw ramp reached its
    # final strength, then was dropped to zero and re-equilibrated
    assert world.tau_lw_func_args[1] == 6.0
    assert world.tau_sw_func_args[2] == 0.0
    assert np.isfinite(T).all() and 150 < float(T[0, 0]) < 500
    # the chained data dict holds a consistent trajectory incl. tau/flux views
    assert len(data['t']) == len(data['T']) == len(data['tau']['lw'])
    assert len(data['flux']['lw_up']) == len(data['t'])
    assert len(data['t']) > 10
    t = np.asarray(data['t'], dtype=float)
    assert (np.diff(t) >= 0).all()
    # warming world: tau_lw 4 -> 6 raises the surface temperature
    assert float(T[0, 0]) > float(np.asarray(data['T'][0])[0, 0])
