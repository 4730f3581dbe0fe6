"""Distribution layer: mesh construction, data sharding, batched evaluation.

Replaces the reference's host-driven MPI layer (CHIMERA/parallel.py — bcast /
allreduce / comm.Split, stale and unimportable upstream per SURVEY.md 2.4)
with *in-program* sharding: data leaves are placed with NamedShardings over a
``jax.sharding.Mesh`` and XLA's GSPMD partitioner inserts the collectives
(psum over the event and injection reductions rides ICI).  The host broadcast
and barrier disappear — hyper-lambda is replicated by construction and the
jitted program is the synchronization.

The reference's three MPI schemes (parallel.py:55-229) map onto mesh axes:

* 'params' (replicate data, split the lambda batch)  -> shard the walker
  batch over the PARAMS axis (`log_like_batch_sharded`);
* 'data' (shard events + injections, allreduce)      -> shard event/injection
  leaves over the DATA axis (`shard_hyperlikelihood`);
* 'both' (2-level comm split)                        -> use both axes of one
  2-D mesh; no communicator gymnastics required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chimera_tpu import pytree
from chimera_tpu.data.structs import ThetaInjDet, ThetaPEDet
from chimera_tpu.likelihood import HyperLikelihood, log_hyperlikelihood
from chimera_tpu.selection import SelectionFunction

DATA_AXIS = "data"
PARAMS_AXIS = "params"


def init_distributed(require: bool = False, **kwargs) -> None:
    """Multi-host initialization for pod slices (the TPU-native replacement
    for the reference's ``mpirun`` + mpi4py bring-up, parallel.py:5-6 and
    docs/user_guide/hpc_gpu_installation.rst).  On a single host this is a
    no-op; on multi-host deployments call it once before building meshes —
    coordinator discovery comes from the standard TPU environment, or pass
    ``coordinator_address/num_processes/process_id`` explicitly.

    The 2-process path is exercised for real in tests/test_multihost.py
    (CPU devices, local coordinator).  ``require=True`` raises instead of
    silently degrading to single-process when no coordinator is found."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        if require:
            raise
        # single-process environment (no coordinator configured)


def make_mesh(params: int = 1, data: int | None = None, devices=None,
              hybrid: bool = False) -> Mesh:
    """Build a (params x data) 2-D device mesh.

    ``data=None`` uses all remaining devices.  With a single device this
    degenerates gracefully to a 1x1 mesh (annotations become no-ops), so the
    same code path runs on one chip and on a pod slice.

    ``hybrid=True`` lays the mesh out for multi-slice deployments: the
    PARAMS axis rides the slow DCN links between slices (walker batches are
    embarrassingly parallel — one replicated-lambda broadcast per step) and
    the DATA axis stays on intra-slice ICI where the per-step psums of the
    event/injection reductions live (SURVEY.md 5.8).  On a single slice (or
    CPU) this is identical to the default layout.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        if n % params:
            raise ValueError(f"{n} devices not divisible by params={params}")
        data = n // params
    if params * data != n:
        raise ValueError(f"mesh {params}x{data} != {n} devices")
    if hybrid:
        slice_ids = sorted({getattr(d, "slice_index", 0)
                            for d in devices.ravel()})
        n_slices = len(slice_ids)
        if n_slices > 1:
            if params % n_slices:
                raise ValueError(
                    f"hybrid mesh needs params ({params}) divisible by the "
                    f"slice count ({n_slices}) so the params axis maps onto "
                    "DCN")
            from jax.experimental import mesh_utils

            dev_arr = mesh_utils.create_hybrid_device_mesh(
                (params // n_slices, data), (n_slices, 1),
                devices=list(devices.ravel()))
            return Mesh(dev_arr.reshape(params, data),
                        (PARAMS_AXIS, DATA_AXIS))
    return Mesh(devices.reshape(params, data), (PARAMS_AXIS, DATA_AXIS))


# ---------------------------------------------------------------------------
# Padding to shardable sizes
# ---------------------------------------------------------------------------

def _pad_axis0(x, n_target: int, fill=None):
    """Pad axis 0 to ``n_target``: edge-replication by default (padding rows
    duplicate the last REAL row, so every primal stays finite and gradients
    through masked-out rows are clean zeros — constant fillers produce 0/0
    weight rows whose NaNs leak into backward passes), or a constant
    ``fill`` where a specific sentinel is required."""
    pad = n_target - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    if fill is None:
        return jnp.pad(x, widths, mode="edge")
    return jnp.pad(x, widths, constant_values=fill)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def pad_events(hl: HyperLikelihood, multiple: int) -> HyperLikelihood:
    """Pad the event axis to a multiple of the mesh data-axis size.

    Padding events carry valid-looking arrays (copies of event 0's shapes
    with benign values) but are excluded from every reduction through
    ``event_mask`` — adding them never changes the likelihood (the padding
    invariance is tested explicitly)."""
    nev = hl.n_events
    n_target = _round_up(nev, multiple)
    if n_target == nev and hl.event_mask is not None:
        return pytree.replace(hl, z_full_buckets=None)
    if hl.event_mask is not None:
        # already-padded input (e.g. create()'s %8 padding): extend the
        # existing mask instead of marking old padding rows as real
        mask = jnp.concatenate(
            [hl.event_mask, jnp.zeros((n_target - nev,), dtype=bool)])
    else:
        mask = jnp.arange(n_target) < nev

    def pad_leaf(x):
        if x is None or not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if x.shape[0] != nev:
            return x
        return _pad_axis0(x, n_target)

    theta = jax.tree_util.tree_map(pad_leaf, hl.theta_gw)
    z_grids = jax.vmap(lambda i: hl.z_grids[jnp.minimum(i, nev - 1)])(
        jnp.arange(n_target))
    compact = None
    if hl.compact is not None:
        # padded events duplicate the last real event's rows (finite
        # kernels and gradients; excluded from reductions by the mask);
        # the flagship layout nests the chunk-rows dict under 'rows'
        def _pad_compact(d):
            return {k: _pad_compact(v) if isinstance(v, dict)
                    else _pad_axis0(v, n_target) for k, v in d.items()}

        compact = _pad_compact(hl.compact)
    population = hl.population
    gal_cat = getattr(population, "gal_cat", None)
    if gal_cat is not None and getattr(gal_cat, "pixelated", False):
        # the pixelated catalog prior carries event-indexed leaves too —
        # pad them in lock-step (explicit fields, not tree_map: the nested
        # completeness model owns tables whose length could coincide with
        # the event count)
        updates = {f: _pad_axis0(getattr(gal_cat, f), n_target)
                   for f in ("p_cat", "P_compl", "pixel_mask", "n_gal")
                   if getattr(gal_cat, f, None) is not None}
        population = pytree.replace(
            population, gal_cat=pytree.replace(gal_cat, **updates))
    # reuse real z-grids for padding rows (monotone grids keep trapz sane)
    return pytree.replace(hl, theta_gw=theta, z_grids=z_grids,
                          event_mask=mask, compact=compact,
                          population=population,
                          # per-event recurrence tiers carry GLOBAL event
                          # indices, which neither the new padding rows nor
                          # a per-shard slice of the event axis preserve;
                          # the sharded 'full' path falls back to the
                          # batch-global z_block_full (shard-safe)
                          z_full_buckets=None)


def pad_injections(sel: SelectionFunction, multiple: int) -> SelectionFunction:
    """Pad the injection axis; padding injections have masses far below any
    mass model's support (m = 0.01) so their population rate is exactly zero
    and xi / N_eff are unchanged."""
    n = sel.theta_inj.n_detected
    n_target = _round_up(n, multiple)
    if n_target == n:
        return sel
    ti = sel.theta_inj
    theta = ThetaInjDet(
        m1det=_pad_axis0(ti.m1det, n_target, 0.01),
        m2det=_pad_axis0(ti.m2det, n_target, 0.01),
        dL=_pad_axis0(ti.dL, n_target, 1.0),
        p_draw=_pad_axis0(ti.p_draw, n_target, 1.0),
    )
    return pytree.replace(sel, theta_inj=theta)


# ---------------------------------------------------------------------------
# Sharding placement
# ---------------------------------------------------------------------------

def shard_hyperlikelihood(hl: HyperLikelihood, mesh: Mesh) -> HyperLikelihood:
    """Place event- and injection-indexed leaves sharded over the DATA axis;
    everything else replicated.  Pads both axes as needed first (events to
    8 per shard so the fused Pallas kernel tiles locally)."""
    n_data = mesh.shape[DATA_AXIS]
    hl = pad_events(hl, 8 * n_data)
    hl = pytree.replace(hl, selection=pad_injections(hl.selection, n_data))

    nev = hl.n_events
    ninj = hl.selection.theta_inj.n_detected
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())
    multiproc = jax.process_count() > 1

    def place(x):
        if x is None or not hasattr(x, "ndim"):
            return x
        sh = sharded if (x.ndim >= 1 and x.shape[0] in (nev, ninj)) \
            else replicated
        if multiproc:
            # every process holds the full (identically built) value;
            # device_put cannot target a cross-process sharding, but a
            # callback materializing each addressable shard can
            val = np.asarray(x)
            return jax.make_array_from_callback(val.shape, sh,
                                                lambda idx, v=val: v[idx])
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, hl)


def _data_specs(hl: HyperLikelihood):
    """PartitionSpec pytree mirroring ``shard_hyperlikelihood``'s placement."""
    nev = hl.n_events
    ninj = hl.selection.theta_inj.n_detected

    def spec(x):
        if x is None or not hasattr(x, "ndim"):
            return P()
        if x.ndim >= 1 and x.shape[0] in (nev, ninj):
            return P(DATA_AXIS)
        return P()

    return jax.tree_util.tree_map(spec, hl)


def log_like_batch_sharded(hl: HyperLikelihood, hyper_batch: dict,
                           mesh: Mesh) -> jax.Array:
    """Evaluate a hyper-lambda batch with the batch sharded over PARAMS and
    the data over DATA (the reference's 'both' scheme as one jit).

    Explicit SPMD: each device evaluates its walker shard against its
    event/injection shard (through the fused Pallas kernel when eligible —
    GSPMD cannot auto-partition an opaque kernel call), then psums the
    per-event log terms and the selection partial sums over the DATA axis —
    the in-program form of the reference's MPI allreduces
    (parallel.py:277-407).  The batch size must be a multiple of the
    params-axis size."""
    from jax import shard_map

    from chimera_tpu.likelihood import _finish_batch, _sum_log_evs, batch_numerators

    batch_sharding = NamedSharding(mesh, P(PARAMS_AXIS))
    if jax.process_count() > 1:
        hyper_batch = {
            k: jax.make_array_from_callback(
                np.asarray(v).shape, batch_sharding,
                lambda idx, val=np.asarray(v): val[idx])
            for k, v in hyper_batch.items()}
    else:
        hyper_batch = {k: jax.device_put(jnp.asarray(v), batch_sharding)
                       for k, v in hyper_batch.items()}
    specs = _data_specs(hl)
    batch_specs = {k: P(PARAMS_AXIS) for k in hyper_batch}

    def local_eval(hl_local, batch_local):
        pop_b = jax.vmap(lambda lam: hl_local.population.update(**lam))(
            batch_local)
        num = batch_numerators(hl_local, pop_b)            # (Lloc, Eloc)
        log_evs = jax.lax.psum(_sum_log_evs(hl_local, num), DATA_AXIS)
        s1, s2 = jax.vmap(hl_local.selection.partial_sums)(pop_b)
        s1 = jax.lax.psum(s1, DATA_AXIS)
        s2 = jax.lax.psum(s2, DATA_AXIS)
        if hl_local.event_mask is not None:
            nev_real = jax.lax.psum(jnp.sum(hl_local.event_mask), DATA_AXIS)
        else:
            nev_real = jax.lax.psum(hl_local.n_events, DATA_AXIS)
        n_exp = jax.vmap(hl_local.selection.n_exp_from_sums)(pop_b, s1, s2)
        return _finish_batch(hl_local, pop_b, log_evs, n_exp, nev_real)

    # check_vma=False: the varying-mesh-axes checker cannot see through
    # pallas_call's out_shape (the fused kernel); correctness is covered by
    # the sharded-vs-single equivalence tests.
    run = jax.jit(shard_map(
        local_eval, mesh=mesh, in_specs=(specs, batch_specs),
        out_specs=P(PARAMS_AXIS), check_vma=False))
    return run(hl, hyper_batch)
