"""RospyTransport wiring test against a fake in-process rospy.

No ROS daemon exists in this environment, so the binding is exercised by
injecting a minimal fake of the rospy/sensor_msgs/nav_msgs/tf2_ros surface
it touches: bring-up (camera-info wait + tf lookup), image/odom/laser
message conversion into engine callbacks, and odometry publication, all
the way through a real VISFSAdapter + System.
"""

import sys
import types

import numpy as np
import pytest


class _Stamp:
    def __init__(self, t):
        self._t = float(t)

    def to_sec(self):
        return self._t


class _Header:
    def __init__(self, t=0.0):
        self.stamp = _Stamp(t)
        self.frame_id = ""


class _Obj:
    """Attribute bag (geometry_msgs-style nested messages)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _fake_ros(monkeypatch, published, camera_info_P):
    """Install fake rospy + msg modules; returns the subscriber registry."""
    subs = {}

    rospy = types.ModuleType("rospy")

    class _Sub:
        def __init__(self, topic, _type, cb, queue_size=10):
            subs[topic] = cb

        def unregister(self):
            pass

    class _Pub:
        def __init__(self, topic, _type, queue_size=10):
            self.topic = topic

        def publish(self, msg):
            published.setdefault(self.topic, []).append(msg)

    class _Time:
        def __init__(self, t=0.0):
            self.t = t

        @staticmethod
        def from_sec(t):
            return _Time(t)

    rospy.Subscriber = _Sub
    rospy.Publisher = _Pub
    rospy.Time = _Time
    rospy.Duration = lambda s: s

    def wait_for_message(topic, _type, timeout=None):
        side = "left" if "left" in topic else "right"
        msg = _Obj(width=160, height=120, P=camera_info_P[side])
        return msg

    rospy.wait_for_message = wait_for_message

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs_msg = types.ModuleType("sensor_msgs.msg")

    class Image:  # noqa: D401 — placeholder message classes
        pass

    class LaserScan:
        pass

    class CameraInfo:
        pass

    sensor_msgs_msg.Image = Image
    sensor_msgs_msg.LaserScan = LaserScan
    sensor_msgs_msg.CameraInfo = CameraInfo

    nav_msgs = types.ModuleType("nav_msgs")
    nav_msgs_msg = types.ModuleType("nav_msgs.msg")

    class RosOdometry:
        def __init__(self):
            self.header = _Header()
            self.child_frame_id = ""
            self.pose = _Obj(
                pose=_Obj(position=_Obj(x=0, y=0, z=0),
                          orientation=_Obj(w=1, x=0, y=0, z=0)),
                covariance=[0.0] * 36,
            )
            self.twist = _Obj(
                twist=_Obj(linear=_Obj(x=0, y=0, z=0),
                           angular=_Obj(x=0, y=0, z=0)),
            )

        # instances are also used as incoming messages in the test
    nav_msgs_msg.Odometry = RosOdometry

    std_msgs = types.ModuleType("std_msgs")
    std_msgs_msg = types.ModuleType("std_msgs.msg")

    class String:
        def __init__(self, data=""):
            self.data = data

    std_msgs_msg.String = String

    geometry_msgs = types.ModuleType("geometry_msgs")
    geometry_msgs_msg = types.ModuleType("geometry_msgs.msg")

    class TransformStamped:
        def __init__(self):
            self.header = _Header()
            self.child_frame_id = ""
            self.transform = _Obj(
                translation=_Obj(x=0, y=0, z=0),
                rotation=_Obj(w=1, x=0, y=0, z=0),
            )

    geometry_msgs_msg.TransformStamped = TransformStamped

    tf2_ros = types.ModuleType("tf2_ros")

    class Buffer:
        def lookup_transform(self, parent, child, _t, _d=None):
            ts = TransformStamped()
            if child == "camera_link":
                ts.transform.translation.z = 0.3
            return ts

    tf2_ros.Buffer = Buffer
    tf2_ros.TransformListener = lambda buf: None
    tf2_ros.TransformBroadcaster = lambda: _Obj(
        sendTransform=lambda ts: published.setdefault("tf", []).append(ts))

    for name, mod in [
        ("rospy", rospy), ("sensor_msgs", sensor_msgs),
        ("sensor_msgs.msg", sensor_msgs_msg), ("nav_msgs", nav_msgs),
        ("nav_msgs.msg", nav_msgs_msg), ("std_msgs", std_msgs),
        ("std_msgs.msg", std_msgs_msg), ("geometry_msgs", geometry_msgs),
        ("geometry_msgs.msg", geometry_msgs_msg), ("tf2_ros", tf2_ros),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return subs


def _mono8(img, t):
    h, w = img.shape
    return _Obj(height=h, width=w, encoding="mono8", step=w,
                data=img.astype(np.uint8).tobytes(), header=_Header(t))


def test_adapter_runs_on_fake_rospy(monkeypatch):
    from visfs_tpu.io.adapter import VISFSAdapter, OperatingPoint
    from visfs_tpu.io.sim import generate_sequence

    seq = generate_sequence(n_frames=8, width=160, height=120,
                            n_points=150, seed=5)
    cam = seq.camera
    P = {
        "left": [cam.fx, 0, cam.cx, 0, 0, cam.fy, cam.cy, 0, 0, 0, 1, 0],
        "right": [cam.fx, 0, cam.cx, -cam.fx * cam.baseline,
                  0, cam.fy, cam.cy, 0, 0, 0, 1, 0],
    }
    published = {}
    subs = _fake_ros(monkeypatch, published, P)

    from visfs_tpu.io.ros_transport import RospyTransport

    tr = RospyTransport({"publish_tf": True})
    info = tr.wait_for_camera_info("right")
    assert info.fx == pytest.approx(float(cam.fx))
    assert info.tx == pytest.approx(-float(cam.fx) * float(cam.baseline))
    T = tr.lookup_transform("base_link", "camera_link")
    assert T is not None and T[2, 3] == pytest.approx(0.3)

    op = OperatingPoint(
        node={"base_line": 0.0, "queue_size": 16},
        visfs={"Tracker/MaxFeatures": 60, "Tracker/MinDistance": 10,
               "Optimizer/Iterations": 4},
        frames={},
    )
    ad = VISFSAdapter(op, tr, use_native_runtime=False)
    assert "left/image_rect" in subs and "right/image_rect" in subs

    # live frames through the fake wire -> engine -> published odometry
    for i in range(6):
        t = float(seq.stamps[i])
        subs["left/image_rect"](_mono8(np.clip(seq.left[i], 0, 255), t))
        subs["right/image_rect"](_mono8(np.clip(seq.right[i], 0, 255), t))
        ad.spin_once()
    n = ad.spin_once()
    total = sum(len(v) for k, v in published.items() if k == "odom")
    assert total >= 4, published.keys()
    msg = published["odom"][-1]
    assert msg.header.frame_id == "odom"
    assert np.isfinite([msg.pose.pose.position.x,
                        msg.pose.pose.position.y]).all()
    # odom_info rides a JSON String
    import json as _json

    info_msg = published["odom_info"][-1]
    body = _json.loads(info_msg.data)
    assert "inliers" in body and "lost" in body
    # valid odometry also broadcast tf
    assert published.get("tf"), "publish_tf produced no transforms"


def test_image_decoding_variants():
    from visfs_tpu.io.ros_transport import _image_to_array

    img = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 5)
    m = _Obj(height=3, width=4, encoding="mono8", step=4,
             data=img.tobytes(), header=_Header(0))
    np.testing.assert_allclose(_image_to_array(m), img.astype(np.float32))

    f = img.astype(np.float32)
    m32 = _Obj(height=3, width=4, encoding="32FC1", step=16,
               data=f.tobytes(), header=_Header(0))
    np.testing.assert_allclose(_image_to_array(m32), f)

    with pytest.raises(ValueError):
        _image_to_array(_Obj(height=1, width=1, encoding="yuv422",
                             step=2, data=b"ab", header=_Header(0)))
