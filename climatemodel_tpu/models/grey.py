"""Grey-gas two-stream radiative column model, TPU-native.

Re-design of the reference ``GreyGas`` (/root/reference/Model/radiation/grey.py:15-504):

  * grid construction stays host-side NumPy (shape-determining, grey.py:129-249);
  * the per-level flux recursion (grey.py:251-275) becomes a log-depth
    associative scan (ops/two_stream.py);
  * the march to equilibrium (base.py:266-335) is a single ``lax.while_loop``;
  * all forcing (dtau grids, albedo, stellar constant) enters the compiled step
    as a dynamic pytree, so parameter sweeps (ice-albedo hysteresis, time-varying
    tau scenarios) never retrigger compilation;
  * the sympy-powered analytic equilibrium with short-wave absorber
    (ShortWavelengthEqbCalc, grey.py:507-647) is replaced by the hand-derived
    closed form (binomial expansion + incomplete-gamma antiderivatives).

Array orientation matches the reference grey model: axis 0 index 0 = surface,
index nz-1 = top of atmosphere (descending pressure).
"""
from __future__ import annotations

import functools
import math
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import checkify

from ..constants import (F_sun, SECONDS_PER_YEAR, g, p_surface_earth,
                         p_toa_earth, sigma)
from ..ops import optical_depth as od
from ..ops.convection import convective_adjustment
from ..ops.two_stream import lw_flux, sw_flux
from ..utils import grids
from . import column
from .column import (ColumnState, EquilibriumInfo, get_isothermal_temp,
                     init_time_step_info, latitudinal_solar_distribution)


@struct.dataclass
class GreyForcing:
    """Dynamic inputs to the compiled grey radiation step."""
    dtau: jnp.ndarray                # [nz-1, ny] |d tau_lw| across cells
    tau_sw_interface: jnp.ndarray    # [nz, ny] short-wave optical depth
    albedo_mod: jnp.ndarray          # [ny] albedo * exp(-2 tau_sw_surface)
    solar_latitude_factor: jnp.ndarray  # [ny]
    F_stellar: jnp.ndarray           # [] stellar constant (W/m^2)


def grey_fluxes(T, forcing: GreyForcing):
    """All four interface flux arrays from cell temperatures (grey.py:251-294)."""
    up_toa = (1.0 - forcing.albedo_mod) * forcing.solar_latitude_factor * \
        forcing.F_stellar / 4.0
    up_lw, down_lw = lw_flux(T, forcing.dtau, up_toa, surface_first=True)
    up_sw, down_sw = sw_flux(forcing.tau_sw_interface, forcing.albedo_mod,
                             forcing.solar_latitude_factor, forcing.F_stellar)
    return up_lw, down_lw, up_sw, down_sw


def grey_net_flux(T, forcing: GreyForcing):
    """Net upward flux at every interface, up_lw - down_lw + up_sw -
    down_sw (grey.py:296-300)."""
    up_lw, down_lw, up_sw, down_sw = grey_fluxes(T, forcing)
    return up_lw - down_lw + up_sw - down_sw


# jitted alias for host-side (outside-the-march) flux refreshes: calling the
# bare function eagerly dispatches the whole associative scan op-by-op, which
# is latency-bound through the axon tunnel (~0.3 s per call)
_grey_fluxes_jit = jax.jit(grey_fluxes)


@functools.partial(jax.jit, static_argnames=('changing_tau', 'convective_adjust',
                                             'net_flux_percentile'))
def _grey_step(state: ColumnState, forcing: GreyForcing, p_interface, p_centre_col,
               changing_tau=False, convective_adjust=False, net_flux_thresh=1e-7,
               net_flux_percentile=95, conv_thresh=1e-5, conv_t_multiplier=5.0):
    """One compiled take_time_step (grey.py:296-344): fluxes then temp update."""
    up_lw, down_lw, up_sw, down_sw = grey_fluxes(state.T, forcing)
    net = up_lw - down_lw + up_sw - down_sw
    state, delta = column.update_temp(
        state, net, p_interface, p_centre_col, changing_tau=changing_tau,
        convective_adjust=convective_adjust, net_flux_thresh=net_flux_thresh,
        net_flux_percentile=net_flux_percentile, conv_thresh=conv_thresh,
        conv_t_multiplier=conv_t_multiplier)
    return state, delta, (up_lw, down_lw, up_sw, down_sw)


# max_steps stays dynamic (it's only compared in the while cond): the chunked
# march passes a growing i0+chunk_steps and must not retrace per chunk
def _grey_evolve_core(state: ColumnState, forcing: GreyForcing, p_interface,
                      p_centre_col, flux_thresh, convective_adjust=False,
                      t_end=4.0, conv_thresh=1e-5, conv_t_multiplier=5.0,
                      net_flux_thresh=1e-7, net_flux_percentile=95,
                      max_steps=500_000, conv_method='reference', i0=0,
                      final_reset=True, check_every=1, dip_memory=False,
                      debug=False):
    net_fn = lambda T: grey_net_flux(T, forcing)
    return column.evolve_to_equilibrium(
        state, net_fn, p_interface, p_centre_col, flux_thresh=flux_thresh,
        convective_adjust=convective_adjust, t_end=t_end, conv_thresh=conv_thresh,
        conv_t_multiplier=conv_t_multiplier, net_flux_thresh=net_flux_thresh,
        net_flux_percentile=net_flux_percentile, max_steps=max_steps,
        conv_method=conv_method, i0=i0, final_reset=final_reset,
        check_every=check_every, dip_memory=dip_memory, debug=debug)


_grey_evolve = functools.partial(jax.jit, static_argnames=(
    'convective_adjust', 'net_flux_percentile', 'conv_method', 'final_reset',
    'check_every', 'dip_memory', 'debug'))(_grey_evolve_core)

# bake_forcing=True closures, keyed by forcing VALUE fingerprint + march
# options (GreyGas._baked_evolve); module-level so identical worlds share one
# compiled executable
_BAKED_EVOLVE_CACHE: dict = {}


@functools.partial(jax.jit, static_argnames=('convective_adjust',
                                             'net_flux_percentile',
                                             'conv_method', 'final_reset'))
def _grey_evolve_debug(state: ColumnState, forcing: GreyForcing, p_interface,
                       p_centre_col, flux_thresh, convective_adjust=False,
                       t_end=4.0, conv_thresh=1e-5, conv_t_multiplier=5.0,
                       net_flux_thresh=1e-7, net_flux_percentile=95,
                       max_steps=500_000, conv_method='reference', i0=0,
                       final_reset=True):
    """checkify-instrumented march (SURVEY §5 sanitizer row): same physics
    as :func:`_grey_evolve` but every step carries user checks locating the
    first non-finite flux/temperature (flat index, step, simulated time).
    Returns ``(checkify_error, (state, info))``; the caller throws the error
    on the host.  Per-step checking only (the failing step is the payload)."""
    checked = checkify.checkify(
        functools.partial(_grey_evolve_core,
                          convective_adjust=convective_adjust,
                          net_flux_percentile=net_flux_percentile,
                          conv_method=conv_method, final_reset=final_reset,
                          debug=True),
        errors=checkify.user_checks)
    return checked(state, forcing, p_interface, p_centre_col, flux_thresh,
                   t_end=t_end, conv_thresh=conv_thresh,
                   conv_t_multiplier=conv_t_multiplier,
                   net_flux_thresh=net_flux_thresh, max_steps=max_steps,
                   i0=i0)


@functools.partial(jax.jit, static_argnames=('convective_adjust', 'conv_method',
                                             'n_snaps', 'with_fluxes'))
def _grey_evolve_snapshots(state: ColumnState, forcing: GreyForcing,
                           p_interface, p_centre_col, flux_thresh, n_snaps,
                           convective_adjust=False, t_end=4.0, conv_thresh=1e-5,
                           conv_t_multiplier=5.0, conv_method='reference', i0=0,
                           with_fluxes=False):
    """Fused save-mode march: one lax.scan emitting a per-step snapshot (and
    optionally the four flux fields, lagged like the reference's save_data)."""
    net_fn = lambda T: grey_net_flux(T, forcing)
    snap_fn = (lambda T: grey_fluxes(T, forcing)) if with_fluxes else None
    return column.evolve_snapshots(
        state, net_fn, p_interface, p_centre_col, n_snaps=n_snaps,
        steps_per_snap=1, snapshot_fn=snap_fn, flux_thresh=flux_thresh,
        convective_adjust=convective_adjust, t_end=t_end,
        conv_thresh=conv_thresh, conv_t_multiplier=conv_t_multiplier,
        conv_method=conv_method, i0=i0)


class GreyGas:
    """User-facing grey-gas column model mirroring the reference state API
    (grey.py:17-106): same constructor vocabulary, same attribute names."""

    def __init__(self, nz, ny, tau_lw_func, tau_lw_func_args, tau_sw_func=None,
                 tau_sw_func_args=None, F_stellar_constant=F_sun, albedo=0.3,
                 temp_change=1.0, delta_temp_change=0.01,
                 p_surface=p_surface_earth, p_toa=p_toa_earth, dtype=None):
        self.ny = int(ny)
        self.p_surface = float(p_surface)
        self.p_toa = float(p_toa)
        self.F_stellar_constant = float(F_stellar_constant)
        self.temp_change = float(temp_change)
        self.delta_temp_change = float(delta_temp_change)
        self.dtype = dtype or jnp.zeros(0).dtype

        self.latitude = np.linspace(-90, 90, self.ny)
        if callable(albedo):                      # base.py:111-117
            self.albedo = np.asarray(albedo(self.latitude), dtype=np.float64)
        else:
            self.albedo = np.broadcast_to(np.asarray(albedo, np.float64),
                                          (self.ny,)).copy()
        self.solar_latitude_factor = np.asarray(
            latitudinal_solar_distribution(self.latitude), np.float64)
        self.T0 = get_isothermal_temp(self.albedo, self.F_stellar_constant,
                                      self.latitude)

        # tau profiles with p_surface pinned (grey.py:108-127)
        self.tau_lw_func = tau_lw_func
        self.tau_lw_func_args = tuple(tau_lw_func_args)
        self.tau_sw_func = tau_sw_func
        self.tau_sw_func_args = tuple(tau_sw_func_args) if tau_sw_func_args else None
        self._build_profiles()

        # pressure grid: host-side, frozen shapes (grey.py:129-249)
        p_col, self.nz = grids.grey_p_grid(
            self._lw, self._sw if not self.sw_tau_is_zero else None, nz,
            p_surface=self.p_surface, p_toa=self.p_toa)
        self.p_interface = np.tile(p_col[:, None], (1, self.ny))
        self.p = grids.cell_centre_pressure(self.p_interface)
        self._refresh_tau_grids()

        # albedo_mod is FROZEN at construction when an sw absorber is present
        # (reference semantics, grey.py:91-96: set once in __init__ and never
        # recomputed by update_grid — later tau_sw mutations do NOT refresh
        # it; load-bearing for the staged time-varying-tau experiment, whose
        # world is built at full sw strength and keeps that albedo_mod while
        # the strength ramps 0 -> 1.2 -> 0).  Without an absorber the
        # reference ALIASES albedo_mod to the albedo array, so in-place
        # albedo mutations propagate (the ice-albedo ramp path) — our
        # property mirrors that by returning self.albedo live.
        self._albedo_mod_frozen = (
            None if self.sw_tau_is_zero
            else self.albedo * np.exp(-2 * self.tau_sw_interface[0]))

        # initial condition: isothermal energy balance (grey.py:98-105)
        T = np.ones((self.nz - 1, self.ny)) * self.T0
        up_lw = np.ones((self.nz, self.ny)) * self.F_sw0
        down_lw = np.zeros((self.nz, self.ny))
        up_sw, down_sw = np.asarray(sw_flux(
            jnp.asarray(self.tau_sw_interface), jnp.asarray(self.albedo_mod),
            jnp.asarray(self.solar_latitude_factor), self.F_stellar_constant,
            isothermal=True))
        net = up_lw - down_lw + up_sw - down_sw
        self._state = ColumnState(
            T=jnp.asarray(T, self.dtype), net_flux=jnp.asarray(net, self.dtype),
            t=jnp.asarray(0.0, self.dtype),
            tsi=init_time_step_info((self.nz - 1) * self.ny, self.temp_change,
                                    self.delta_temp_change, self.dtype))
        self._fluxes = tuple(jnp.asarray(a, self.dtype)
                             for a in (up_lw, down_lw, up_sw, down_sw))

    # ---------------- host-side grid/profile management ----------------

    def _build_profiles(self):
        self._lw = od.make_profile(self.tau_lw_func, self.tau_lw_func_args,
                                   self.p_surface)
        if self.tau_sw_func is not None:
            self._sw = od.make_profile(self.tau_sw_func, self.tau_sw_func_args
                                       or (), self.p_surface)
        else:
            self._sw = None
        # expose the pinned full arg tuples like the reference does
        self.tau_lw_func_args = self._lw.args
        if self._sw is not None:
            self.tau_sw_func_args = self._sw.args
        self.sw_tau_is_zero = self._sw is None or self._sw.is_zero  # grey.py:81

    def _refresh_tau_grids(self):
        """(Re)compute tau/q grids on the fixed pressure grid — also the
        ``update_grid`` path for changing forcing (grey.py:346-358)."""
        self.tau_interface = np.asarray(self._lw.tau(self.p_interface))
        self.q = np.asarray(self._lw.q(self.p))
        self.tau = np.asarray(self._lw.tau(self.p))
        self.dtau = np.abs(self.tau_interface[1:] - self.tau_interface[:-1])
        if not self.sw_tau_is_zero:
            self.tau_sw_interface = np.asarray(self._sw.tau(self.p_interface))
            self.q_sw = np.asarray(self._sw.q(self.p))
            self.tau_sw = np.asarray(self._sw.tau(self.p))
        else:
            self.tau_sw_interface = np.zeros_like(self.tau_interface)
            self.q_sw = np.zeros_like(self.q)
            self.tau_sw = np.zeros_like(self.tau)

    def update_grid(self):
        """Re-evaluate tau after mutating tau_*_func_args (grey.py:346-358)."""
        self._build_profiles()
        self._refresh_tau_grids()

    @property
    def _p_device(self):
        """Cached device copies of the fixed pressure grid: host-driven
        take_time_step loops (the staged-tau ramp) must not re-upload the
        static geometry every step over the tunnel (r04 review finding).
        The grid is built once in __init__ — update_grid never changes p —
        so the cache needs no invalidation."""
        if getattr(self, '_p_device_cache', None) is None:
            self._p_device_cache = (
                jnp.asarray(self.p_interface, self.dtype),
                jnp.asarray(self.p[:, 0], self.dtype))
        return self._p_device_cache

    @property
    def albedo_mod(self):
        """Albedo corrected for the missing exp(tau_sw_surface) term
        (grey.py:91-96).  Reference parity: FROZEN at the construction-time
        tau_sw when an sw absorber exists (update_grid never refreshes it —
        see __init__); aliased to the live ``albedo`` otherwise, so the
        ice-albedo harness's in-place albedo mutations propagate exactly
        like the reference's numpy aliasing."""
        if self._albedo_mod_frozen is not None:
            return self._albedo_mod_frozen
        return self.albedo

    @property
    def F_sw0(self):
        """Net absorbed stellar flux per latitude (grey.py:99)."""
        return (1 - self.albedo_mod) * self.solar_latitude_factor * \
            self.F_stellar_constant / 4

    @property
    def forcing(self) -> GreyForcing:
        d = self.dtype
        return GreyForcing(
            dtau=jnp.asarray(self.dtau, d),
            tau_sw_interface=jnp.asarray(self.tau_sw_interface, d),
            albedo_mod=jnp.asarray(self.albedo_mod, d),
            solar_latitude_factor=jnp.asarray(self.solar_latitude_factor, d),
            F_stellar=jnp.asarray(self.F_stellar_constant, d))

    # ---------------- state views (reference attribute parity) ----------------

    @property
    def T(self):
        return np.asarray(self._state.T)

    @T.setter
    def T(self, value):
        self._state = self._state.replace(T=jnp.asarray(value, self.dtype))

    @property
    def net_flux(self):
        return np.asarray(self._state.net_flux)

    @property
    def up_lw_flux(self):
        return np.asarray(self._fluxes[0])

    @property
    def down_lw_flux(self):
        return np.asarray(self._fluxes[1])

    @property
    def up_sw_flux(self):
        return np.asarray(self._fluxes[2])

    @property
    def down_sw_flux(self):
        return np.asarray(self._fluxes[3])

    @property
    def state(self) -> ColumnState:
        return self._state

    # ---------------- stepping ----------------

    def take_time_step(self, t, T_initial=None, changing_tau=False,
                       convective_adjust=False, net_flux_thresh=1e-7,
                       net_flux_percentile=95, conv_thresh=1e-5,
                       conv_t_multiplier=5, return_dt=False):
        """One time step (grey.py:296-344).  Returns (t, delta_net_flux), or
        (t, delta_net_flux, dt) with ``return_dt=True`` — riding the same
        batched device pull, for host loops that consume the controller's dt
        (the reference's per-step sw-tau ramp divides by time_step_info['dt'],
        radiation_script.py:97-99; a separate eager tsi.dt read would cost an
        extra ~25 ms tunnel round trip per step)."""
        if changing_tau:
            self.update_grid()
        if t == 0 and T_initial is not None:
            self.T = T_initial
        self._state = self._state.replace(t=jnp.asarray(t, self.dtype))
        p_int_dev, p_c_dev = self._p_device
        self._state, delta, self._fluxes = _grey_step(
            self._state, self.forcing, p_int_dev,
            p_c_dev, changing_tau=changing_tau,
            convective_adjust=convective_adjust, net_flux_thresh=net_flux_thresh,
            net_flux_percentile=net_flux_percentile, conv_thresh=conv_thresh,
            conv_t_multiplier=conv_t_multiplier)
        if return_dt:
            t_np, delta_np, dt_np = jax.device_get(
                (self._state.t, delta, self._state.tsi.dt))
            return float(t_np), float(delta_np), float(np.max(dt_np))
        t_np, delta_np = jax.device_get((self._state.t, delta))
        return float(t_np), float(delta_np)

    def _forcing_fingerprint(self):
        """Value hash of everything a baked march closes over — catches
        in-place mutations (the ice-albedo ramp mutates ``albedo`` through
        the reference's aliasing) that an identity-keyed cache would miss."""
        import hashlib
        h = hashlib.sha1()
        for a in (self.dtau, self.tau_sw_interface, self.albedo_mod,
                  self.solar_latitude_factor, self.p_interface,
                  self.p[:, 0]):
            h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
        h.update(np.float64(self.F_stellar_constant).tobytes())
        return h.hexdigest()

    def _baked_evolve(self, convective_adjust, conv_method, conv_thresh,
                      conv_t_multiplier, check_every, dip_memory,
                      final_reset):
        """jitted march whose forcing and pressure grids are CLOSED OVER as
        compile-time constants instead of dynamic arguments.

        Measured on v5e (tools/conv_while_bisect.py probe, nz=150
        thermosphere, identical per-step work — 292/300 steps firing real
        ~4.7 K group-blend adjustments in both): 0.46 ms/step with the
        forcing passed dynamically vs 0.17 ms/step baked.  XLA schedules the
        nested convective while_loops far better when the flux coefficients
        are literals; manually hoisting the same values as dynamic tracers
        recovers nothing (measured), so this is a compile-mode, not a code
        restructure.  Trajectories are NOT bit-identical to the dynamic
        path (host-folded exp differs from the device's by ulps, which the
        adaptive march amplifies like any other f32 path choice); equilibria
        agree within the same envelope as the CPU/TPU or scan/kernel paths.
        One compile per distinct (forcing values, march options) — use for
        repeated marches of an unchanged world, NOT inside forcing sweeps."""
        key = (self._forcing_fingerprint(), bool(convective_adjust),
               conv_method, float(conv_thresh), float(conv_t_multiplier),
               int(check_every), bool(dip_memory), bool(final_reset))
        # module-level, value-keyed: fresh model objects with identical
        # forcing (e.g. a benchmark building one world per trial) share the
        # compiled closure instead of retracing per instance
        cache = _BAKED_EVOLVE_CACHE
        fn = cache.get(key)
        if fn is None:
            forcing = self.forcing
            p_int = jnp.asarray(self.p_interface, self.dtype)
            p_c = jnp.asarray(self.p[:, 0], self.dtype)

            @jax.jit
            def fn(state, ft, t_end, i0, max_steps):
                return _grey_evolve_core(
                    state, forcing, p_int, p_c, ft,
                    convective_adjust=convective_adjust, t_end=t_end,
                    conv_thresh=conv_thresh,
                    conv_t_multiplier=conv_t_multiplier,
                    conv_method=conv_method, i0=i0, max_steps=max_steps,
                    final_reset=final_reset, check_every=int(check_every),
                    dip_memory=bool(dip_memory))
            while len(cache) >= 8:          # bound the live-executable count
                cache.pop(next(iter(cache)))
            cache[key] = fn
        return fn

    def evolve_to_equilibrium(self, data_dict=None, flux_thresh=1e-3,
                              T_initial=None, convective_adjust=False, save=True,
                              t_end=4.0, conv_thresh=1e-5, conv_t_multiplier=5,
                              verbose=False, conv_method='reference',
                              chunk_steps=None, check_every=1,
                              dip_memory=False, debug=False,
                              bake_forcing=False) -> dict:
        """March to equilibrium (base.py:266-335).

        save=False runs a single fused lax.while_loop on device (fast path);
        save=True steps through a compiled step from the host, appending
        snapshots for animation like the reference data_dict.

        :param conv_method: 'reference' (faithful group-blend, needed for
            bit-level parity) or 'isotonic' (fully parallel weighted PAVA —
            much faster on TPU, same physics).
        :param chunk_steps: split the device march into chunks of this many
            steps, returning to the host between chunks — use for long
            convective marches on accelerators whose runtimes kill
            single executions running for minutes.  Combined with
            ``check_every=K`` a chunk can overshoot its boundary by up to
            K-1 steps (the while cond is tested before each K-step body), so
            the single-execution bound is effectively
            ``chunk_steps + check_every - 1`` steps.
        :param check_every: evaluate the exit criteria every this many steps
            (save=False path only) — amortises the per-step percentile/exit
            machinery that dominates small-column marches on TPU; may
            overshoot the exit by up to check_every-1 steps (see
            column.evolve_to_equilibrium).  Default 1 = reference semantics.
        :param dip_memory: with ``check_every=K``, evaluate the full exit
            criteria every step inside the chunk and freeze the carry at the
            first stop event — endpoints/steps/flags bit-identical to
            ``check_every=1`` (detection deferred to the chunk boundary).
            Use for convective marches and oscillating-delta configs where
            plain sparse checks miss their exit (see
            column.evolve_to_equilibrium).
        :param bake_forcing: compile the march with this world's forcing and
            pressure grids as COMPILE-TIME CONSTANTS (save=False only;
            ignored under debug).  ~2.7x on v5e convective marches at
            identical per-step work — XLA schedules the nested adjustment
            loops far better around literal flux coefficients (see
            :meth:`_baked_evolve` for the measurements).  One compile per
            distinct forcing (value-fingerprinted, so in-place albedo
            mutations are caught); keep False inside forcing sweeps, where
            the dynamic-pytree path compiles once for every member.
            Trajectories differ from the dynamic path at the f32-bit level
            (like CPU vs TPU); equilibrium endpoints agree within the same
            envelope.
        :param debug: run the march under :mod:`jax.experimental.checkify`
            user checks (SURVEY §5 sanitizer row): a failure raises
            ``checkify.JaxRuntimeError`` on the host naming the first
            non-finite net-flux interface / non-finite temperature level /
            below-zero level plus the step and simulated time, instead of
            the plain path's location-free ``FloatingPointError``.
            save=False + check_every=1 only; numerics are unchanged.
        """
        if debug and (save or check_every != 1 or dip_memory):
            raise ValueError('debug=True supports the fused save=False '
                             'per-step march only (check_every=1, '
                             'dip_memory=False)')
        # data_dict=None restarts the clock (base.py:301-306) — each fresh
        # call gets the t=0 forced first step, so a localized forcing change
        # can't look instantly 'converged'.  The starting t is tracked as a
        # HOST value so neither the T_initial t==0 check nor the fresh
        # data_dict seed forces a device sync (each eager pull is a ~25 ms
        # tunnel round trip — they dominated single-march walls); the fresh
        # seed's T snapshot is deferred into the march's final batched pull.
        t_host = 0.0 if data_dict is None else float(data_dict['t'][-1])
        self._state = self._state.replace(t=jnp.asarray(t_host, self.dtype))
        if T_initial is not None and t_host == 0:
            self.T = T_initial
        T_seed_dev = None
        if data_dict is None:
            T_seed_dev = self._state.T        # device ref; pulled at the end
            data_dict = {'t': [t_host], 'T': [None]}

        forcing = self.forcing              # hoist: one upload, not per chunk
        if not save:
            p_int = jnp.asarray(self.p_interface, self.dtype)
            p_c = jnp.asarray(self.p[:, 0], self.dtype)
            ft = jnp.asarray(flux_thresh, self.dtype)
            # all device->host reads below are batched into single
            # jax.device_get calls: each separate sync costs a full tunnel
            # round trip (~25 ms) on axon
            if verbose and chunk_steps is None:
                chunk_steps = 1000
            if chunk_steps is None:
                if debug:
                    err, (self._state, info) = _grey_evolve_debug(
                        self._state, forcing, p_int, p_c, ft,
                        convective_adjust=convective_adjust,
                        t_end=float(t_end), conv_thresh=conv_thresh,
                        conv_t_multiplier=conv_t_multiplier,
                        conv_method=conv_method)
                    err.throw()    # raises JaxRuntimeError with the location
                elif bake_forcing:
                    baked = self._baked_evolve(
                        convective_adjust, conv_method, conv_thresh,
                        conv_t_multiplier, check_every, dip_memory,
                        final_reset=True)
                    self._state, info = baked(
                        self._state, ft, float(t_end),
                        jnp.asarray(0, jnp.int32), 500_000)
                else:
                    self._state, info = _grey_evolve(
                        self._state, forcing, p_int, p_c, ft,
                        convective_adjust=convective_adjust,
                        t_end=float(t_end), conv_thresh=conv_thresh,
                        conv_t_multiplier=conv_t_multiplier,
                        conv_method=conv_method, check_every=int(check_every),
                        dip_memory=bool(dip_memory))
            else:
                baked_chunk = self._baked_evolve(
                    convective_adjust, conv_method, conv_thresh,
                    conv_t_multiplier, check_every, dip_memory,
                    final_reset=False) if (bake_forcing and not debug) \
                    else None

                def chunk_evolve(state, ft_c, *, i0, t_end, max_steps):
                    if debug:
                        err, out = _grey_evolve_debug(
                            state, forcing, p_int, p_c, ft_c,
                            convective_adjust=convective_adjust, t_end=t_end,
                            conv_thresh=conv_thresh,
                            conv_t_multiplier=conv_t_multiplier,
                            conv_method=conv_method, i0=i0,
                            max_steps=max_steps, final_reset=False)
                        err.throw()   # per chunk: a debug march syncs anyway
                        return out
                    if baked_chunk is not None:
                        return baked_chunk(state, ft_c, t_end,
                                           jnp.asarray(i0, jnp.int32),
                                           jnp.asarray(max_steps, jnp.int32))
                    return _grey_evolve(
                        state, forcing, p_int, p_c, ft_c,
                        convective_adjust=convective_adjust, t_end=t_end,
                        conv_thresh=conv_thresh,
                        conv_t_multiplier=conv_t_multiplier,
                        conv_method=conv_method, i0=i0, max_steps=max_steps,
                        final_reset=False, check_every=int(check_every),
                        dip_memory=bool(dip_memory))
                self._state, info = column.run_chunked_march(
                    self._state, chunk_evolve,
                    t_host_start=data_dict['t'][-1], t_end=t_end,
                    chunk_steps=chunk_steps, flux_thresh=ft, verbose=verbose)
            # refresh flux views at the equilibrium temperature (async)
            self._fluxes = tuple(
                jnp.asarray(a) for a in _grey_fluxes_jit(self._state.T,
                                                         forcing))
            self._equilibrium_info, t_np, T_np, T_seed_np = jax.device_get(
                (info, self._state.t, self._state.T, T_seed_dev))
            if T_seed_np is not None:
                data_dict['T'][0] = np.asarray(T_seed_np)
            if bool(self._equilibrium_info.nan):
                raise FloatingPointError(
                    'non-finite temperature or flux encountered during the '
                    'march (NaN sentinel) — check forcing inputs')
            if bool(self._equilibrium_info.failed):
                raise ValueError('Temperature is below zero')
            if not bool(self._equilibrium_info.equilibrium) and \
                    not bool(self._equilibrium_info.timed_out):
                raise RuntimeError(
                    'march hit the max_steps safety cap without converging '
                    'or reaching t_end — use chunk_steps, raise t_end, or '
                    'loosen flux_thresh')
            data_dict['t'].append(float(t_np))
            data_dict['T'].append(np.asarray(T_np))
            return data_dict

        # fused snapshot march (save=True): chunks of per-step snapshots run
        # as one lax.scan each, with ONE batched device_get per chunk instead
        # of the reference's two host syncs per step (base.py:266-335 +
        # save_data semantics, including the flux lag: fluxes stored with step
        # k are the ones computed from step k's starting temperature).
        p_int = jnp.asarray(self.p_interface, self.dtype)
        p_c = jnp.asarray(self.p[:, 0], self.dtype)
        ft = jnp.asarray(flux_thresh, self.dtype)
        with_fluxes = 'flux' in data_dict
        with_tau = 'tau' in data_dict
        if T_seed_dev is not None:    # snapshot path appends per chunk anyway
            data_dict['T'][0] = np.asarray(jax.device_get(T_seed_dev))
        chunk = int(chunk_steps) if chunk_steps else 256
        i0 = 0
        t_start = data_dict['t'][-1]
        t_chunk_start = t_start
        while True:
            # t_end is a whole-march budget: hand each chunk the remainder
            t_end_chunk = float(t_end) - (t_chunk_start - t_start) \
                / SECONDS_PER_YEAR
            self._state, info, snaps = _grey_evolve_snapshots(
                self._state, forcing, p_int, p_c, ft, n_snaps=chunk,
                convective_adjust=convective_adjust, t_end=t_end_chunk,
                conv_thresh=conv_thresh, conv_t_multiplier=conv_t_multiplier,
                conv_method=conv_method, i0=i0, with_fluxes=with_fluxes)
            info_np, snaps_np = jax.device_get((info, snaps))
            steps = np.asarray(snaps_np['steps'])
            prev = i0
            for k in range(chunk):
                if steps[k] <= prev:
                    break                     # march ended mid-chunk
                prev = int(steps[k])
                t_k = float(snaps_np['t'][k])
                data_dict['t'].append(t_k)
                data_dict['T'].append(np.asarray(snaps_np['T'][k]))
                if with_tau:
                    data_dict['tau']['lw'].append(self.tau.copy())
                    data_dict['tau']['sw'].append(self.tau_sw.copy())
                if with_fluxes:
                    fx = snaps_np['extra']
                    data_dict['flux']['lw_up'].append(np.asarray(fx[0][k]))
                    data_dict['flux']['lw_down'].append(np.asarray(fx[1][k]))
                    data_dict['flux']['sw_up'].append(np.asarray(fx[2][k]))
                    data_dict['flux']['sw_down'].append(np.asarray(fx[3][k]))
                if verbose:
                    print(f't = {t_k / SECONDS_PER_YEAR:.3f} yr, '
                          f'delta_net_flux = '
                          f'{float(snaps_np["delta"][k]):.4f}', end='\r')
            i0 = int(info_np.steps)
            ft = info.flux_thresh             # keep the tightened threshold
            t_chunk_start = data_dict['t'][-1]
            if bool(info_np.nan):
                raise FloatingPointError(
                    'non-finite temperature or flux encountered during the '
                    'march (NaN sentinel) — check forcing inputs')
            if bool(info_np.failed):
                raise ValueError('Temperature is below zero')
            if bool(info_np.equilibrium) or bool(info_np.timed_out):
                break
        # with_fluxes: views lagged like the reference's save_data; otherwise
        # refreshed at the FINAL temperature — a deliberate divergence (the
        # reference attributes hold pre-final-step fluxes; ours are the
        # self-consistent equilibrium fluxes, see CLAUDE.md quirks)
        if with_fluxes:
            self._fluxes = tuple(jnp.asarray(data_dict['flux'][key][-1],
                                             self.dtype)
                                 for key in ('lw_up', 'lw_down', 'sw_up',
                                             'sw_down'))
        else:
            self._fluxes = tuple(
                jnp.asarray(a) for a in _grey_fluxes_jit(self._state.T,
                                                         forcing))
        self._equilibrium_info = info_np
        self._state = self._state.replace(
            tsi=column.reset_time_step_info(self._state.tsi))
        return data_dict

    def save_data(self, data_dict, t):
        """Append snapshot arrays (grey.py:360-383)."""
        data_dict['t'].append(t)
        data_dict['T'].append(self.T.copy())
        if 'tau' in data_dict:
            data_dict['tau']['lw'].append(self.tau.copy())
            data_dict['tau']['sw'].append(self.tau_sw.copy())
        if 'flux' in data_dict:
            data_dict['flux']['lw_up'].append(self.up_lw_flux)
            data_dict['flux']['lw_down'].append(self.down_lw_flux)
            data_dict['flux']['sw_up'].append(self.up_sw_flux)
            data_dict['flux']['sw_down'].append(self.down_sw_flux)
        return data_dict

    # ---------------- analytic equilibrium oracles (grey.py:385-451) ----------

    def equilibrium_sol(self, convective_adjust=False):
        """Analytic radiative-equilibrium profiles for the current grids.

        Returns (up_lw, down_lw, T_eqb, up_sw, down_sw, correct_solution), where
        correct_solution is False if the short-wave absorber had to be ignored
        (only exponential lw+sw with integer alpha ratio < 10 admits the closed
        form, grey.py:406-428).
        """
        if self.sw_tau_is_zero:
            correct = True
        elif self._lw.name == 'exponential' and self._sw.name == 'exponential':
            alpha_lw = self._lw.params[1]
            alpha_sw = self._sw.params[1]
            ratio = alpha_lw / alpha_sw
            correct = abs(round(ratio) - ratio) < 1e-5 and ratio < 10
            if not correct:
                warnings.warn(
                    'Exact solution needs integer alpha_lw/alpha_sw < 10; got '
                    f'{ratio}. Returning the tau_sw = 0 solution.')
        else:
            warnings.warn(
                'Exact solution needs exponential lw and sw profiles; got '
                f'{self._lw.name} / {self._sw.name}. Returning the tau_sw = 0 '
                'solution.')
            correct = False

        if not self.sw_tau_is_zero and correct:
            # the sw closed form is single-latitude (the reference raises
            # 'Must provide a single latitude bin', grey.py:529-530) —
            # silently using latitude 0's albedo would return wrong profiles
            # for every other latitude with correct_solution still True
            if np.size(self.albedo_mod) > 1:
                raise ValueError('Must provide a single latitude bin')
            calc = GreySwEquilibrium(self.F_stellar_constant,
                                     float(np.asarray(self.albedo_mod).ravel()[0]),
                                     self._lw, self._sw)
            up_lw = calc.up_lw_flux(self.tau_sw_interface)
            down_lw = calc.down_lw_flux(self.tau_sw_interface)
            T_eqb = calc.T(self.tau_sw)
            up_sw = calc.up_sw_flux(self.tau_sw_interface)
            down_sw = calc.down_sw_flux(self.tau_sw_interface)
        else:
            # closed form with no short-wave absorber (grey.py:441-448)
            up_lw = 0.5 * self.F_sw0 * (2 + self.tau_interface)
            down_lw = 0.5 * self.F_sw0 * self.tau_interface
            T_eqb = np.power((self.F_sw0 / (2 * sigma)) * (1 + self.tau), 0.25)
            up_sw = np.ones_like(up_lw) * self.albedo_mod * \
                self.F_stellar_constant / 4
            down_sw = np.ones_like(up_lw) * self.F_stellar_constant / 4
        if convective_adjust:
            T_eqb = np.asarray(convective_adjustment(
                jnp.asarray(self.p[:, 0]), jnp.asarray(T_eqb)))
        return up_lw, down_lw, T_eqb, up_sw, down_sw, correct

    def plot_eqb(self, up_lw_flux_eqb, down_lw_flux_eqb, T_eqb, up_sw_flux_eqb,
                 down_sw_flux_eqb):
        """Optical depth / equilibrium T / equilibrium flux triple panel
        (grey.py:453-501).  Takes the arrays returned by ``equilibrium_sol``;
        with a short-wave absorber present, overlays the tau_sw = 0 world's
        analytic solution as dotted curves for comparison."""
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(1, 3, sharey=True, figsize=(12, 5))
        sw_color = '#1f77b4'
        lw_color = '#ff7f0e'
        if not self.sw_tau_is_zero:
            ax[0].plot(self.tau_sw_interface, self.p_interface,
                       label=r'short wave, $\tau_{sw}$', color=sw_color)
        ax[0].plot(self.tau_interface, self.p_interface,
                   label=r'long wave, $\tau_{lw}$', color=lw_color)
        ax[0].set_xlabel(r'Optical depth, $\tau$')
        ax[0].set_ylabel('Pressure / Pa')
        ax[1].plot(T_eqb, self.p, label=r'$\tau_{sw}\neq0$', color=sw_color)
        ax[1].set_xlabel('Temperature / K')
        net_flux = up_lw_flux_eqb + up_sw_flux_eqb - down_lw_flux_eqb \
            - down_sw_flux_eqb
        F_norm = self.F_stellar_constant / 4
        ax[2].plot(up_sw_flux_eqb / F_norm, self.p_interface, color=sw_color)
        sw_suffix = r'(\tau_{sw}\neq0)' if not self.sw_tau_is_zero else ''
        ax[2].plot(-down_sw_flux_eqb / F_norm, self.p_interface, color=sw_color,
                   label=rf'$F_{{sw}}{sw_suffix}$')
        ax[2].plot(up_lw_flux_eqb / F_norm, self.p_interface, color=lw_color,
                   label=rf'$F_{{lw}}{sw_suffix}$')
        ax[2].plot(-down_lw_flux_eqb / F_norm, self.p_interface, color=lw_color)
        ax[2].plot(net_flux / F_norm, self.p_interface, label=r'$F_{net}$',
                   color='#d62728')
        ax[2].set_xlabel(r'Radiation Flux, $F$, as fraction of Incoming Solar, '
                         r'$\frac{F^\odot}{4}$')
        ax[0].invert_yaxis()
        if not self.sw_tau_is_zero:
            # dotted overlays from a no-short-wave twin world (grey.py:487-500)
            ax[0].plot(self.tau_sw_interface * 0, self.p_interface,
                       color=sw_color, linestyle='dotted',
                       label=r'$\tau_{sw}=0$')
            ax[0].legend()
            no_sw = GreyGas(self.nz, self.ny, self.tau_lw_func,
                            self.tau_lw_func_args,
                            F_stellar_constant=self.F_stellar_constant,
                            albedo=self.albedo,
                            p_surface=self.p_surface, p_toa=self.p_toa)
            up_lw0, down_lw0, T0, up_sw0, down_sw0, _ = no_sw.equilibrium_sol()
            ax[1].plot(T0, no_sw.p, label=r'$\tau_{sw}=0$', color=sw_color,
                       linestyle='dotted')
            ax[1].legend()
            ax[2].plot(up_sw0 / F_norm, no_sw.p_interface, color=sw_color,
                       linestyle='dotted', label=r'$F_{sw}(\tau_{sw}=0)$')
            ax[2].plot(-down_sw0 / F_norm, no_sw.p_interface, color=sw_color,
                       linestyle='dotted')
            ax[2].plot(up_lw0 / F_norm, no_sw.p_interface, color=lw_color,
                       linestyle='dotted', label=r'$F_{lw}(\tau_{sw}=0)$')
            ax[2].plot(-down_lw0 / F_norm, no_sw.p_interface, color=lw_color,
                       linestyle='dotted')
        ax[2].legend()
        return fig, ax

    def __str__(self):
        return 'Grey Gas'


class GreySwEquilibrium:
    """Closed-form radiative equilibrium with exponential lw + sw absorbers.

    Replaces the sympy machinery of ShortWavelengthEqbCalc (grey.py:507-647).
    With tau_lw = c1 (e^{a1 p} - 1) and tau_sw = c2 (e^{a2 p} - 1) and integer
    n = a1/a2, tau_lw(tau_sw) = c1 ((t2/c2 + 1)^n - 1), so D = d tau1/d tau2 =
    (c1 n / c2)(t2/c2 + 1)^{n-1} and the optical-depth integral

        I(t2) = int D(t2) (e^{-t2} - A e^{t2}) dt2

    expands binomially into sums of int t^k e^{-/+t} dt, which have elementary
    antiderivatives.  The flux/temperature formulas follow grey.py:608-627:

        sigma T^4 = F/8 [ (e^{-t2} + A e^{t2}) / D + I(t2) + C ],
        C = 1 - A - I(0),
        F_lw_down = sigma T^4 - F/8 [ (e^{-t2} + A e^{t2}) / D + e^{-t2} - A e^{t2} ],
        F_lw_up = F_lw_down + F_sw_down - F_sw_up.

    Note the reference substitutes the solar constant F_sun in the down_lw
    expression even when F_stellar differs (grey.py:617); we use F_stellar
    consistently (identical for the default F_stellar = F_sun).
    """

    def __init__(self, F_stellar_const, albedo_mod, lw_profile, sw_profile):
        if np.size(albedo_mod) > 1:
            raise ValueError(
                'Must provide a single latitude bin to get analytical solution')
        c1, a1 = lw_profile.params
        c2, a2 = sw_profile.params
        n = a1 / a2
        if abs(round(n) - n) > 1e-5 or n >= 10:
            raise ValueError('alpha_lw/alpha_sw must be an integer < 10')
        self.n = int(round(n))
        self.c1, self.c2 = float(c1), float(c2)
        self.F = float(F_stellar_const)
        self.A = float(albedo_mod)
        self._I0 = self._integral(np.array(0.0))
        self.C = 1 - self.A - self._I0

    def _D(self, t2):
        """d tau_lw / d tau_sw."""
        return (self.c1 * self.n / self.c2) * (t2 / self.c2 + 1) ** (self.n - 1)

    @staticmethod
    def _int_tk_exp_neg(t, k):
        """Antiderivative of t^k e^{-t}: -e^{-t} sum_j k!/j! t^j."""
        s = sum(math.factorial(k) / math.factorial(j) * t ** j
                for j in range(k + 1))
        return -np.exp(-t) * s

    @staticmethod
    def _int_tk_exp_pos(t, k):
        """Antiderivative of t^k e^{+t}: e^{t} sum_j (-1)^{k-j} k!/j! t^j."""
        s = sum((-1) ** (k - j) * math.factorial(k) / math.factorial(j) * t ** j
                for j in range(k + 1))
        return np.exp(t) * s

    def _integral(self, t2):
        """I(t2) = int D (e^{-t} - A e^{t}) dt, constant-free antiderivative."""
        t2 = np.asarray(t2, dtype=np.float64)
        pref = self.c1 * self.n / self.c2
        total = np.zeros_like(t2)
        for k in range(self.n):
            binom = math.comb(self.n - 1, k) * self.c2 ** (-k)
            total = total + binom * (self._int_tk_exp_neg(t2, k)
                                     - self.A * self._int_tk_exp_pos(t2, k))
        return pref * total

    def sigma_T4(self, t2):
        t2 = np.asarray(t2, dtype=np.float64)
        return self.F / 8 * ((np.exp(-t2) + self.A * np.exp(t2)) / self._D(t2)
                             + self._integral(t2) + self.C)

    def T(self, t2):
        return (self.sigma_T4(t2) / sigma) ** 0.25

    def up_sw_flux(self, t2):
        return self.A * self.F / 4 * np.exp(np.asarray(t2, np.float64))

    def down_sw_flux(self, t2):
        return self.F / 4 * np.exp(-np.asarray(t2, np.float64))

    def down_lw_flux(self, t2):
        t2 = np.asarray(t2, dtype=np.float64)
        return self.sigma_T4(t2) - self.F / 8 * (
            (np.exp(-t2) + self.A * np.exp(t2)) / self._D(t2)
            + np.exp(-t2) - self.A * np.exp(t2))

    def up_lw_flux(self, t2):
        return self.down_lw_flux(t2) + self.down_sw_flux(t2) - self.up_sw_flux(t2)
