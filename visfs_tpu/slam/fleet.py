"""FleetSystem: B independent VO streams per chip via one vmapped step.

**Measured reality (rounds 3-4, one v5e chip, B=8, VGA/120 features):
aggregate throughput is ~1x a single stream — vmap does NOT amortize this
workload.**  The hypothesis that batching would multiply arithmetic
intensity at the same sequential depth failed on measurement: the step's
dominant costs (selector-contraction sampling, per-feature iteration
loops) scale linearly in B under vmap, so the vmapped step costs ~B times
a single step.  FleetSystem therefore buys lockstep *convenience* (one
program, one state pytree, batched outputs), not speed.

For throughput-scaling fleets use the cross-chip axis instead:
``dp_fleet_step`` below runs one stream per device of a 1-D ``dp`` mesh
(every sensor strategy incl. laser), and composes with the distributed
BA/pose-graph solvers in ``parallel/`` — see
``__graft_entry__.dryrun_multichip``.  The reference's per-machine scaling
story is one single-robot process per CPU core
(Interface/ROS/src/InterfaceROSNode.cpp:3 — one node, one System).

All streams share one camera/config (one compiled program); state, images,
stamps, odometry, and outputs carry a leading ``[B]`` axis.  The per-frame
semantics are identical to ``System`` — the vmapped function IS
``vo_step_impl`` — which ``tests/test_fleet.py`` pins by comparing fleet
trajectories against independent single-stream runs.
"""

from __future__ import annotations

import collections
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VISFSConfig, config_from_parameters
from ..core.camera import StereoCamera, make_stereo_camera
from ..ops.lk import LKParams
from ..ops.lk import lk_pad as _lk_pad
from . import extrapolator as extr
from .state import VOState, init_state
from .system import _build_settings, build_cfg_hash, vo_step_impl


def fleet_step_impl(states, lefts, rights, stamps, cam, cfg_est, lk_params,
                    cfg_hash, scan_points=None, scan_mask=None,
                    scan_times=None):
    """vmap of the fused single-stream step over the leading fleet axis."""
    if scan_points is None:
        def one(st, left, right, stamp):
            return vo_step_impl(st, left, right, stamp, cam, cfg_est,
                                lk_params, cfg_hash)

        return jax.vmap(one)(states, lefts, rights, stamps)

    def one(st, left, right, stamp, sp, sm, stt):
        return vo_step_impl(st, left, right, stamp, cam, cfg_est, lk_params,
                            cfg_hash, scan_points=sp, scan_mask=sm,
                            scan_times=stt)

    return jax.vmap(one)(states, lefts, rights, stamps, scan_points,
                         scan_mask, scan_times)


fleet_step = partial(
    jax.jit,
    static_argnames=("cfg_est", "lk_params", "cfg_hash"),
    donate_argnames=("states",),
)(fleet_step_impl)


def dp_fleet_step(mesh, states, lefts, rights, stamps, cam, cfg_est,
                  lk_params, cfg_hash, scan_points=None, scan_mask=None,
                  scan_times=None):
    """Cross-chip fleet: one VO stream per device of a 1-D ``dp`` mesh.

    Unlike the within-chip vmapped ``fleet_step`` (strategies 0-2 only —
    vmap would densify the active-submap cond branches), each dp shard runs
    the plain single-stream ``vo_step_impl``, so EVERY sensor strategy —
    including the laser/occupancy modes 3-5 — rides this axis unchanged:
    the multi-robot mapping configuration (simMapping.launch, SensorStrategy
    3) scales robot-per-chip.  All leading axes are sharded over ``dp`` and
    must equal the mesh size (one stream per device; stack tighter fleets
    within a shard via FleetSystem for strategies 0-2).

    Returns (new_states, outputs) with the same [B] leading axis.
    """
    with_scan = scan_points is not None
    fn = _dp_fleet_fn(mesh, cfg_est, lk_params, cfg_hash, with_scan)
    args = (states, lefts, rights, stamps)
    if with_scan:
        if scan_times is None:
            scan_times = jnp.zeros(scan_mask.shape, jnp.float32)
        args = args + (scan_points, scan_mask, scan_times)
    return fn(cam, *args)


_DP_FLEET_CACHE: dict = {}


def _dp_fleet_fn(mesh, cfg_est, lk_params, cfg_hash, with_scan):
    """Compiled dp-sharded step, memoized per (mesh, static config)."""
    key = (mesh, cfg_est, lk_params, cfg_hash, with_scan)
    fn = _DP_FLEET_CACHE.get(key)
    if fn is not None:
        return fn

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    take0 = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
    # FrameOutput carries python-scalar defaults (timing fields) in the
    # fused path; promote to arrays before adding the shard axis.
    add_axis = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x)[None], t)

    def one(cam, st, left, right, stamp, *scan_args):
        kw = {}
        if with_scan:
            sp, sm, stt = scan_args
            kw = dict(scan_points=sp[0], scan_mask=sm[0], scan_times=stt[0])
        st1, out = vo_step_impl(
            take0(st), left[0], right[0], stamp[0], cam, cfg_est, lk_params,
            cfg_hash, **kw,
        )
        return add_axis(st1), add_axis(out)

    n_args = 7 if with_scan else 4
    mapped = shard_map(
        one, mesh=mesh,
        in_specs=(P(),) + tuple(P("dp") for _ in range(n_args)),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    fn = jax.jit(mapped)
    _DP_FLEET_CACHE[key] = fn
    return fn


@jax.jit
def _push_odometry_fleet(states, stamps, pose6, vel6, valid):
    """Push one wheel-odometry sample per stream (masked by ``valid``)."""
    def push(odom, stamp, p6, v6, ok):
        new = extr.add_odometry(odom, stamp, p6, v6)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, odom
        )

    return states._replace(
        odom=jax.vmap(push)(states.odom, stamps, pose6, vel6, valid)
    )


class FleetSystem:
    """Host driver for B lockstep VO streams on one chip.

    Mirrors the ``System`` API with a leading ``[B]`` axis on every input
    and output.  Streams are independent: each has its own state (features,
    window, odometry buffer, RNG) seeded ``seed + i``.
    """

    def __init__(self, parameters=None, n_streams: int = 8,
                 feature_capacity_factor: int = 3, seed: int = 0,
                 scan_capacity: int = 512, submap_extent_cells: int = 256):
        self.cfg: VISFSConfig = (
            parameters if isinstance(parameters, VISFSConfig)
            else config_from_parameters(parameters)
        )
        if self.cfg.system_sensor_strategy >= 3:
            raise NotImplementedError(
                "FleetSystem supports strategies 0-2; laser fleets would "
                "vmap the submap cond branches into dense selects — use "
                "dp_fleet_step (one stream per device on a dp mesh, all "
                "strategies) or separate System instances."
            )
        self.n_streams = int(n_streams)
        self.settings = _build_settings(self.cfg)
        self.lk_params = LKParams(
            win_size=self.cfg.tracker_flow_win_size,
            max_level=self.cfg.tracker_flow_max_level,
            iterations=self.cfg.tracker_flow_iterations,
            eps=self.cfg.tracker_flow_eps,
            compute_dtype=self.cfg.tracker_flow_compute_dtype,
            unroll=self.cfg.tracker_flow_unroll,
            # Rounds 3-4 auto-picked "gather" here (the one-hot
            # contraction's FLOPs scaled linearly with B and dominated).
            # The round-5 live-track compaction shrank the contraction
            # shapes enough to flip it: B=8 VGA measures 117 fps aggregate
            # under "matmul" vs 100 under "gather", so auto now matches
            # the single-stream choice.
            region_extract=(
                "matmul" if self.cfg.tracker_flow_region_extract == "auto"
                else self.cfg.tracker_flow_region_extract),
        )
        self._cfg_hash = build_cfg_hash(self.cfg)
        self._capacity_factor = feature_capacity_factor
        self._seed = seed
        self.camera: Optional[StereoCamera] = None
        self.states: Optional[VOState] = None  # leading [B] axis throughout
        self._results = collections.deque()
        self._pending = None

    def init(self, fx, fy, cx, cy, baseline, *, width, height,
             fxr=None, fyr=None, cxr=None, cyr=None,
             transform_camera_to_robot=None):
        self.camera = make_stereo_camera(
            fx, fy, cx, cy, baseline, fxr=fxr, fyr=fyr, cxr=cxr, cyr=cyr,
            t_camera_to_robot=transform_camera_to_robot,
            width=width, height=height,
        )
        per_stream = [
            init_state(
                height, width,
                capacity=self._capacity_factor * self.cfg.tracker_max_features,
                window=self.cfg.local_map_map_size + 1,
                seed=self._seed + i,
                lk_pad=_lk_pad(self.lk_params),
                lk_max_level=self.lk_params.max_level,
                lk_dtype=jnp.dtype(self.lk_params.compute_dtype),
            )
            for i in range(self.n_streams)
        ]
        self.states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *per_stream
        )

    def input_primary_sensor_data(self, stamps, lefts, rights):
        """Feed one frame per stream: stamps [B], lefts/rights [B, H, W]."""
        assert self.states is not None, "call init() first"
        self._collect_pending()
        lefts = jnp.asarray(lefts, jnp.float32)
        rights = jnp.asarray(rights, jnp.float32)
        stamps = jnp.asarray(stamps, jnp.float32)
        self.states, out = fleet_step(
            self.states, lefts, rights, stamps, self.camera,
            self.settings, self.lk_params, self._cfg_hash,
        )
        self._pending = out

    def input_wheel_odometry(self, stamps, pose6, velocity6=None, valid=None):
        """Push one odometry sample per stream.

        stamps [B], pose6 [B, 6]; valid [B] masks streams with no sample
        this tick (their ring buffers are left untouched).
        """
        assert self.states is not None, "call init() first"
        B = self.n_streams
        stamps = jnp.asarray(stamps, jnp.float32)
        pose6 = jnp.asarray(pose6, jnp.float32)
        vel6 = (jnp.zeros((B, 6), jnp.float32) if velocity6 is None
                else jnp.asarray(velocity6, jnp.float32))
        ok = (jnp.ones((B,), bool) if valid is None
              else jnp.asarray(valid, bool))
        self.states = _push_odometry_fleet(self.states, stamps, pose6, vel6,
                                           ok)

    def _collect_pending(self):
        if self._pending is not None:
            self._results.append(self._pending)
            self._pending = None

    def output_odometry_info(self):
        """Pop the oldest finished fleet result (a [B]-batched FrameOutput)."""
        self._collect_pending()
        if self._results:
            return jax.device_get(self._results.popleft())
        return None

    def drain_outputs(self):
        """Fetch every finished fleet result in one host transfer."""
        self._collect_pending()
        outs = list(self._results)
        self._results.clear()
        return jax.device_get(outs)

    def run_sequences(self, stamps, lefts, rights, wheel_odom=None):
        """Batch driver: stamps [T, B], lefts/rights [T, B, H, W].

        wheel_odom: optional [K, B, 8] rows of (stamp, x..yaw, valid) fed
        in timestamp order ahead of each frame like the ROS callbacks.
        Returns the list of [B]-batched FrameOutputs (length T).
        """
        outs = []
        odom_i = 0
        T = len(stamps)
        for i in range(T):
            if wheel_odom is not None:
                while (odom_i < len(wheel_odom)
                       and float(np.min(wheel_odom[odom_i][:, 0]))
                       <= float(np.max(stamps[i])) + 1e-9):
                    row = wheel_odom[odom_i]
                    self.input_wheel_odometry(
                        row[:, 0], row[:, 1:7], valid=row[:, 7] > 0.5
                    )
                    odom_i += 1
            self.input_primary_sensor_data(stamps[i], lefts[i], rights[i])
            out = self.output_odometry_info()
            if out is not None:
                outs.append(out)
        outs.extend(self.drain_outputs())
        return outs
