"""Level-axis (pipeline-parallel analogue) sharding of the flux recurrence.

The grey long-wave flux is a first-order affine recurrence over pressure
levels (reference GreyGas.get_lw_flux, grey.py:251-275), evaluated on one chip
as a log-depth ``lax.associative_scan`` (ops/two_stream.py).  When a column is
tall enough to shard over devices — or when the level axis is the only axis
left to parallelise — the recurrence splits into contiguous level blocks, one
per device, and the carry flows device-to-device: the pipeline-parallel
pattern of this framework (SURVEY.md §2 "parallelism & communication").

Algorithm (classic block-scan pipeline):

1. each device runs the associative scan over its local block and reduces the
   block to its affine summary ``(A_tot, B_tot)`` (composition of all local
   steps);
2. the scalar carry ``x`` enters at device 0 and hops down the device ring via
   ``lax.ppermute`` — device k forwards ``A_tot*x + B_tot`` to device k+1 —
   ``n_devices - 1`` sequential hops over ICI, exactly a pipeline "bubble";
3. each device applies its received carry to its local prefix scan.

Step 2 is O(n_devices) latency but moves only one interface row per hop; the
O(n_levels) scan work in steps 1/3 stays fully parallel.  Results are
bit-identical to the single-device ``affine_scan`` composition order up to
float reassociation of the block boundaries (same reassociation the
associative scan already performs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:                    # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..constants import sigma


def _combine(c1, c2):
    a1, b1 = c1
    a2, b2 = c2
    return a1 * a2, a2 * b1 + b2


def sharded_affine_scan(a, b, x0, mesh, axis_name, reverse=False,
                        batch_axis_name=None):
    """Solve x_{k+1} = a_k x_k + b_k with the level axis (axis 0) sharded.

    Mirrors :func:`climatemodel_tpu.ops.two_stream.affine_scan` (same
    signature + mesh): returns ``[n+1, ...]`` with element 0 (or n when
    ``reverse``) equal to ``x0``.  Axis 0 of ``a``/``b`` must divide evenly by
    ``mesh.shape[axis_name]``.

    ``batch_axis_name`` optionally shards axis 1 (the batch/member axis)
    over a SECOND mesh axis — the composed dp x pp layout: each data-shard
    of members runs its own carry pipeline over the level axis, and the
    ppermute hops act within the data slice.  Axis 1 must then divide by
    ``mesh.shape[batch_axis_name]``.
    """
    n_dev = int(mesh.shape[axis_name])
    n = a.shape[0]
    if n % n_dev:
        raise ValueError(f'level count {n} not divisible by {n_dev} devices')
    if batch_axis_name is not None:
        if a.ndim < 2:
            raise ValueError('batch_axis_name needs a batch axis (a.ndim>=2)')
        if a.shape[1] % int(mesh.shape[batch_axis_name]):
            raise ValueError(
                f'batch {a.shape[1]} not divisible by '
                f'{mesh.shape[batch_axis_name]} devices')
    if reverse:
        a = jnp.flip(a, axis=0)
        b = jnp.flip(b, axis=0)

    rest = ((batch_axis_name,) + (None,) * (a.ndim - 2)
            if batch_axis_name is not None else (None,) * (a.ndim - 1))
    spec_lev = P(axis_name, *rest)
    spec_rep = P(*rest) if a.ndim > 1 else P()

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec_lev, spec_lev, spec_rep),
                       out_specs=spec_lev)
    def block_scan(a_blk, b_blk, x0):
        idx = lax.axis_index(axis_name)
        A, B = lax.associative_scan(_combine, (a_blk, b_blk), axis=0)
        A_tot, B_tot = A[-1], B[-1]
        # pipeline the carry down the device chain: device k's carry becomes
        # valid at hop k; hops after that leave it untouched
        x_in = jnp.where(idx == 0, x0, jnp.zeros_like(x0))
        perm = [(i, i + 1) for i in range(n_dev - 1)]

        def hop(s, x_in):
            x_out = A_tot * x_in + B_tot
            x_recv = lax.ppermute(x_out, axis_name, perm)
            return jnp.where(idx == s + 1, x_recv, x_in)

        x_in = lax.fori_loop(0, n_dev - 1, hop, x_in) if n_dev > 1 else x_in
        return A * x_in + B

    a_sh = jax.device_put(a, NamedSharding(mesh, spec_lev))
    b_sh = jax.device_put(b, NamedSharding(mesh, spec_lev))
    xs = block_scan(a_sh, b_sh, jnp.broadcast_to(x0, a.shape[1:]).astype(
        a.dtype))
    out = jnp.concatenate([jnp.expand_dims(jnp.broadcast_to(
        x0, a.shape[1:]).astype(a.dtype), 0), xs], axis=0)
    if reverse:
        out = jnp.flip(out, axis=0)
    return out


def lw_flux_level_sharded(T, dtau, up_flux_toa, mesh, axis_name,
                          surface_first=True, batch_axis_name=None):
    """Grey lw up/down fluxes with the LEVEL axis sharded over ``axis_name``
    (pp analogue) — mirrors :func:`ops.two_stream.lw_flux` (which cites
    grey.py:251-275).  Both streams ride one pipelined scan via a trailing
    channel axis.
    """
    dtau = jnp.asarray(dtau)
    while dtau.ndim < T.ndim:                  # column-shared dtau, like lw_flux
        dtau = dtau[..., None]
    dtau = jnp.broadcast_to(dtau, T.shape)
    e_plus = jnp.exp(dtau)
    e_minus = jnp.exp(-dtau)
    source = sigma * T ** 4
    # trailing channel axis (0 = up, 1 = down) keeps axis 0 = levels shardable
    a = jnp.stack([e_plus, e_minus], axis=-1)
    b = jnp.stack([source * (1.0 - e_plus), source * (1.0 - e_minus)],
                  axis=-1)
    x_toa = jnp.stack([jnp.broadcast_to(up_flux_toa, T.shape[1:]),
                       jnp.zeros(T.shape[1:], T.dtype)], axis=-1)
    flux = sharded_affine_scan(a, b, x_toa, mesh, axis_name,
                               reverse=surface_first,
                               batch_axis_name=batch_axis_name)
    return flux[..., 0], flux[..., 1]
