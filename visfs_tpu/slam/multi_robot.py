"""Multi-robot mapping session: a fleet of VO streams building ONE map.

This is the BASELINE config-5 north star — the composition the reference
delegates to rtabmap (Interface/ROS/launch/simMapping.launch:10-14: each
robot runs VISFS odometry, a mapping node fuses them).  Here the fusion is
in-engine and TPU-native:

  * per-robot odometry: either N independent ``System`` instances (host
    scheduling, any mix of sensor strategies) or one ``dp_fleet_step``
    sweep (one robot per device of a 1-D ``dp`` mesh — slam/fleet.py);
  * one shared ``KeyframeGraph`` (slam/mapping.py): keyframes carry their
    robot id, odometry edges stay within a robot's chain, and each robot's
    VO-local poses are lifted into the shared world frame by its known
    start pose (T_world_robot = T_world_start @ T_vo);
  * cross-robot loop closures: proximity candidates between DIFFERENT
    robots' keyframes at any index distance, verified by the snapshot
    NCC + Kabsch/PnP gate (mapping.verify_loop), solved by the
    edge-sharded distributed pose graph (parallel/pose_graph.py).

A fleet with unknown relative starts degenerates gracefully: pass identity
start poses and the robots' chains float independently until the first
cross-robot closure ties them together (the pose-graph solve then aligns
the chains; only robot 0's gauge is anchored).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .mapping import MappingBackend
from .system import System


class MultiRobotMapping:
    """Host-side driver: N robots' VO -> one shared keyframe graph.

    Parameters
    ----------
    parameters: VISFS parameter map shared by all robots.
    n_robots: fleet size.
    mesh: 1-D jax mesh with an ``edges`` axis for the pose-graph solve.
    start_poses: optional [B, 4, 4] world-frame start pose per robot
        (defaults to identity: unknown relative starts).
    system_kwargs: forwarded to each ``System`` (capacity, scan sizing...).
    """

    def __init__(self, parameters, n_robots: int, mesh,
                 start_poses: Optional[Sequence] = None,
                 max_nodes: int = 1024, max_edges: int = 4096,
                 snapshot_kp: int = 64, **system_kwargs):
        self.n_robots = int(n_robots)
        self.systems = [System(parameters, **system_kwargs)
                        for _ in range(self.n_robots)]
        self.backend = MappingBackend(mesh, max_nodes=max_nodes,
                                      max_edges=max_edges)
        if start_poses is None:
            start_poses = [np.eye(4, dtype=np.float32)] * self.n_robots
        self.start_poses = [np.asarray(p, np.float32) for p in start_poses]
        self.snapshot_kp = snapshot_kp
        self._n_keyframes = [0] * self.n_robots

    def init(self, fx, fy, cx, cy, baseline, *, width, height, **kw):
        for s in self.systems:
            s.init(fx, fy, cx, cy, baseline, width=width, height=height,
                   **kw)

    @property
    def camera(self):
        return self.systems[0].camera

    def input_primary_sensor_data(self, robot: int, stamp: float, left,
                                  right, scan=None, scan_times=None):
        """Feed one frame of one robot; harvests finished keyframes."""
        sys_ = self.systems[robot]
        sys_.input_primary_sensor_data(stamp, left, right, scan=scan,
                                       scan_times=scan_times)
        self._harvest(robot)

    def input_wheel_odometry(self, robot: int, stamp: float, pose6,
                             velocity6=None):
        self.systems[robot].input_wheel_odometry(stamp, pose6, velocity6)

    def _harvest(self, robot: int):
        sys_ = self.systems[robot]
        while True:
            out = sys_.output_odometry_info()
            if out is None:
                return
            if bool(out.keyframe) and not bool(out.lost):
                world_pose = self.start_poses[robot] @ np.asarray(out.pose)
                snap = sys_.keyframe_snapshot(max_kp=self.snapshot_kp)
                node = self.backend.add_keyframe(
                    world_pose, float(out.stamp), snapshot=snap,
                    robot=robot)
                if node is not None:
                    self._n_keyframes[robot] += 1

    def finish(self):
        """Flush all robots' pending outputs into the graph."""
        for r in range(self.n_robots):
            self.systems[r]._collect_pending()
            self._harvest(r)

    def close_loops(self, radius: float = 2.0, min_gap: int = 10,
                    min_inliers: int = 10, min_ncc: float = 0.4) -> int:
        """Verify + insert loop closures (incl. cross-robot pairs)."""
        return self.backend.close_loops(
            self.camera, radius=radius, min_gap=min_gap,
            min_inliers=min_inliers, min_ncc=min_ncc,
        )

    def optimize(self, iterations: int = 10, cg_iters: int = 50) -> float:
        return self.backend.optimize(iterations=iterations,
                                     cg_iters=cg_iters)

    def poses(self, robot: Optional[int] = None) -> np.ndarray:
        """Optimized keyframe poses ([n, 4, 4]); filter by robot if given."""
        poses = self.backend.poses()
        if robot is None:
            return poses
        rob = np.asarray(self.backend.graph.robot[: len(poses)])
        return poses[rob == robot]

    def keyframe_counts(self):
        return list(self._n_keyframes)

    def cross_robot_edges(self) -> int:
        """Number of accepted loop-closure edges linking different robots."""
        g = self.backend.graph
        n_e = int(g.n_edges)
        ei = np.asarray(g.edge_i[:n_e])
        ej = np.asarray(g.edge_j[:n_e])
        rob = np.asarray(g.robot)
        return int(np.sum(rob[ei] != rob[ej]))


class FleetMapping:
    """Lockstep multi-robot mapping on a device mesh: one robot per device
    of a 1-D ``dp`` mesh (slam.fleet.dp_fleet_step — every sensor strategy,
    laser included), all feeding ONE shared keyframe graph.

    This is the device-parallel twin of ``MultiRobotMapping`` (which
    schedules N independent ``System`` instances on the host): the whole
    fleet advances one frame per ``step`` call as a single sharded XLA
    program, and keyframes are harvested per robot into the same
    ``MappingBackend`` (robot-tagged chains, cross-robot closures,
    edge-sharded distributed solve).
    """

    def __init__(self, parameters, mesh, start_poses=None,
                 max_nodes: int = 1024, max_edges: int = 4096,
                 snapshot_kp: int = 64, feature_capacity_factor: int = 3,
                 seed: int = 0):
        import jax
        from jax.sharding import Mesh

        from ..config import VISFSConfig, config_from_parameters
        from ..ops.lk import LKParams
        from ..ops.lk import lk_pad as _lk_pad
        from .system import _build_settings, build_cfg_hash

        self.mesh = mesh
        self.n_robots = int(np.prod(mesh.devices.shape))
        self.cfg: VISFSConfig = (
            parameters if isinstance(parameters, VISFSConfig)
            else config_from_parameters(parameters)
        )
        self.settings = _build_settings(self.cfg)
        self.lk_params = LKParams(
            win_size=self.cfg.tracker_flow_win_size,
            max_level=self.cfg.tracker_flow_max_level,
            iterations=self.cfg.tracker_flow_iterations,
            eps=self.cfg.tracker_flow_eps,
        )
        self._cfg_hash = build_cfg_hash(self.cfg)
        self._capacity_factor = feature_capacity_factor
        self._seed = seed
        self._lk_pad = _lk_pad(self.lk_params)
        self.camera = None
        self.states = None
        # the distributed pose-graph solve wants an "edges" axis
        self._edges_mesh = Mesh(mesh.devices.reshape(-1), ("edges",))
        self.backend = MappingBackend(self._edges_mesh, max_nodes=max_nodes,
                                      max_edges=max_edges)
        if start_poses is None:
            start_poses = [np.eye(4, dtype=np.float32)] * self.n_robots
        self.start_poses = [np.asarray(p, np.float32) for p in start_poses]
        self.snapshot_kp = snapshot_kp
        self._n_keyframes = [0] * self.n_robots

    def init(self, fx, fy, cx, cy, baseline, *, width, height):
        import jax
        import jax.numpy as jnp

        from ..core.camera import make_stereo_camera
        from .state import init_state

        self.camera = make_stereo_camera(fx, fy, cx, cy, baseline,
                                         width=width, height=height)
        per = [
            init_state(
                height, width,
                capacity=self._capacity_factor
                * self.cfg.tracker_max_features,
                window=self.cfg.local_map_map_size + 1,
                seed=self._seed + i,
                lk_pad=self._lk_pad,
                lk_max_level=self.lk_params.max_level,
            )
            for i in range(self.n_robots)
        ]
        self.states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *per
        )

    def step(self, stamps, lefts, rights):
        """Advance the whole fleet one frame: stamps [B], images [B, H, W].
        Harvests keyframes into the shared graph; returns the [B]-batched
        FrameOutput (host-fetched)."""
        import jax
        import jax.numpy as jnp

        from .fleet import dp_fleet_step
        from .mapping import snapshot_features

        self.states, outs = dp_fleet_step(
            self.mesh, self.states,
            jnp.asarray(lefts, jnp.float32),
            jnp.asarray(rights, jnp.float32),
            jnp.asarray(stamps, jnp.float32),
            self.camera, self.settings, self.lk_params, self._cfg_hash,
        )
        host = jax.device_get(outs)
        for r in range(self.n_robots):
            if bool(host.keyframe[r]) and not bool(host.lost[r]):
                st_r = jax.tree_util.tree_map(lambda x: x[r], self.states)
                snap = snapshot_features(
                    st_r.features, st_r.prev_left, self.camera,
                    max_kp=self.snapshot_kp,
                )
                world_pose = self.start_poses[r] @ np.asarray(host.pose[r])
                node = self.backend.add_keyframe(
                    world_pose, float(host.stamp[r]), snapshot=snap,
                    robot=r)
                if node is not None:
                    self._n_keyframes[r] += 1
        return host

    def close_loops(self, **kw) -> int:
        return self.backend.close_loops(self.camera, **kw)

    def optimize(self, iterations: int = 10, cg_iters: int = 50) -> float:
        return self.backend.optimize(iterations=iterations,
                                     cg_iters=cg_iters)

    def poses(self, robot=None) -> np.ndarray:
        poses = self.backend.poses()
        if robot is None:
            return poses
        rob = np.asarray(self.backend.graph.robot[: len(poses)])
        return poses[rob == robot]

    def keyframe_counts(self):
        return list(self._n_keyframes)

    def cross_robot_edges(self) -> int:
        g = self.backend.graph
        n_e = int(g.n_edges)
        ei = np.asarray(g.edge_i[:n_e])
        ej = np.asarray(g.edge_j[:n_e])
        rob = np.asarray(g.robot)
        return int(np.sum(rob[ei] != rob[ej]))
