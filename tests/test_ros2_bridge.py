"""Mock-rclpy unit test of the ROS 2 bridge message round-trip.

rclpy is not installed in this image, so the bridge normally import-gates
itself off (``HAVE_ROS2 = False``). Here we install minimal fake ``rclpy`` /
``sensor_msgs`` / ``sensor_msgs_py`` / ``std_msgs`` / ``builtin_interfaces``
modules, reload the bridge, and drive one PointCloud2-shaped message through
subscribe -> server -> publish, asserting the republished ground/nonground
clouds exactly partition the input (the reference node's contract,
reference: ros/src/GroundSegmentationServer.cpp:74-95).
"""

from __future__ import annotations

import importlib
import sys
import time
import types

import numpy as np
import pytest


class _FakeField:
    def __init__(self, name):
        self.name = name


class _FakePointCloud2:
    def __init__(self, pts=None, header=None, field_names=("x", "y", "z"),
                 field_dtypes=None):
        self._pts = pts
        self.header = header
        self.fields = [_FakeField(n) for n in field_names]
        # per-field storage dtype (default FLOAT32), mirroring
        # sensor_msgs.msg.PointField.datatype
        self._field_dtypes = dict(field_dtypes or {})


class _FakeParameter:
    def __init__(self, value):
        self.value = value


class _FakePublisher:
    def __init__(self, topic):
        self.topic = topic
        self.messages = []

    def publish(self, msg):
        self.messages.append(msg)


class _FakeNodeBase:
    """Subset of rclpy.node.Node used by PatchworkppNode."""

    def __init__(self, name):
        self._name = name
        self.subscriptions = []
        self.publishers = []
        self.declared_params = {}
        self.sub_qos = {}
        self.pub_qos = {}

    def declare_parameter(self, name, default):
        self.declared_params[name] = default
        return _FakeParameter(default)

    def create_subscription(self, msg_type, topic, callback, qos):
        self.subscriptions.append((topic, callback))
        self.sub_qos[topic] = qos
        return (topic, callback)

    def create_publisher(self, msg_type, topic, qos):
        pub = _FakePublisher(topic)
        self.publishers.append(pub)
        self.pub_qos[topic] = qos
        return pub


class _FakeQoSProfile:
    """Mirror of rclpy.qos.QoSProfile's keyword surface used by the bridge."""

    def __init__(self, depth=10, reliability=None, durability=None):
        self.depth = depth
        self.reliability = reliability
        self.durability = durability


class _Rel:
    RELIABLE = "reliable"
    BEST_EFFORT = "best_effort"


class _Dur:
    TRANSIENT_LOCAL = "transient_local"
    VOLATILE = "volatile"


_SENSOR_DATA_QOS = _FakeQoSProfile(
    depth=5, reliability=_Rel.BEST_EFFORT, durability=_Dur.VOLATILE
)


class _Stamp:
    sec = 7
    nanosec = 250_000_000


class _Header:
    def __init__(self):
        self.frame_id = ""
        self.stamp = _Stamp()


@pytest.fixture()
def bridge(monkeypatch):
    fake_rclpy = types.ModuleType("rclpy")
    fake_rclpy.init = lambda *a, **k: None
    fake_rclpy.spin = lambda node: None
    fake_rclpy.shutdown = lambda: None
    fake_rclpy_node = types.ModuleType("rclpy.node")
    fake_rclpy_node.Node = _FakeNodeBase
    fake_rclpy.node = fake_rclpy_node

    fake_rclpy_qos = types.ModuleType("rclpy.qos")
    fake_rclpy_qos.QoSProfile = _FakeQoSProfile
    fake_rclpy_qos.ReliabilityPolicy = _Rel
    fake_rclpy_qos.DurabilityPolicy = _Dur
    fake_rclpy_qos.qos_profile_sensor_data = _SENSOR_DATA_QOS
    fake_rclpy.qos = fake_rclpy_qos

    fake_sensor_msgs = types.ModuleType("sensor_msgs")
    fake_sensor_msgs_msg = types.ModuleType("sensor_msgs.msg")
    fake_sensor_msgs_msg.PointCloud2 = _FakePointCloud2
    fake_sensor_msgs.msg = fake_sensor_msgs_msg

    fake_pc2 = types.ModuleType("sensor_msgs_py.point_cloud2")

    _COLS = {"x": 0, "y": 1, "z": 2, "intensity": 3}

    def read_points(msg, field_names=None, skip_nans=False, uvs=None,
                    reshape_organized_cloud=False):
        """Faithful subset of sensor_msgs_py.point_cloud2.read_points: a
        structured array with each field in its own storage dtype, NO
        same-dtype restriction."""
        names = list(field_names) if field_names else [
            f.name for f in msg.fields
        ]
        dt = np.dtype(
            [(n, msg._field_dtypes.get(n, np.float32)) for n in names]
        )
        out = np.empty(len(msg._pts), dtype=dt)
        for n in names:
            out[n] = msg._pts[:, _COLS[n]].astype(dt[n])
        return out

    def read_points_numpy(msg, field_names=None, skip_nans=True, **kw):
        # Faithful to upstream read_points_numpy's gotcha: the same-dtype
        # assert inspects EVERY field of the MESSAGE, ignoring field_names
        # — which is exactly why the bridge must use read_points instead
        # (a float32-xyz + uint16-intensity cloud fails even an xyz read).
        dtypes = {
            np.dtype(msg._field_dtypes.get(f.name, np.float32))
            for f in msg.fields
        }
        assert len(dtypes) == 1, (
            "All fields need to have the same datatype. Use `read_points()`"
            " otherwise."
        )
        arr = read_points(msg, field_names, skip_nans)
        return np.stack([arr[n] for n in arr.dtype.names], axis=1)

    def create_cloud_xyz32(header, pts):
        return _FakePointCloud2(np.asarray(pts), header)

    fake_pc2.read_points = read_points
    fake_pc2.read_points_numpy = read_points_numpy
    fake_pc2.create_cloud_xyz32 = create_cloud_xyz32
    fake_sensor_msgs_py = types.ModuleType("sensor_msgs_py")
    fake_sensor_msgs_py.point_cloud2 = fake_pc2

    fake_std_msgs = types.ModuleType("std_msgs")
    fake_std_msgs_msg = types.ModuleType("std_msgs.msg")
    fake_std_msgs_msg.Header = _Header
    fake_std_msgs.msg = fake_std_msgs_msg

    fake_builtin = types.ModuleType("builtin_interfaces")
    fake_builtin_msg = types.ModuleType("builtin_interfaces.msg")

    class _Time:
        def __init__(self, sec=0, nanosec=0):
            self.sec, self.nanosec = sec, nanosec

    fake_builtin_msg.Time = _Time
    fake_builtin.msg = fake_builtin_msg

    for name, mod in [
        ("rclpy", fake_rclpy),
        ("rclpy.node", fake_rclpy_node),
        ("rclpy.qos", fake_rclpy_qos),
        ("sensor_msgs", fake_sensor_msgs),
        ("sensor_msgs.msg", fake_sensor_msgs_msg),
        ("sensor_msgs_py", fake_sensor_msgs_py),
        ("sensor_msgs_py.point_cloud2", fake_pc2),
        ("std_msgs", fake_std_msgs),
        ("std_msgs.msg", fake_std_msgs_msg),
        ("builtin_interfaces", fake_builtin),
        ("builtin_interfaces.msg", fake_builtin_msg),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    import patchworkpp_tpu.serve.ros2_bridge as rb

    rb = importlib.reload(rb)
    assert rb.HAVE_ROS2
    yield rb
    # restore the gated (rclpy-less) module state for other tests
    monkeypatch.undo()
    importlib.reload(rb)


SUB = 16


def test_bridge_round_trip(bridge, scans):
    node = bridge.PatchworkppNode()
    try:
        pts = scans["000000"][::SUB, :3].astype(np.float32)
        msg = _FakePointCloud2(pts, _Header())
        # find the subscription callback and the three publishers
        topics = {t for t, _ in node.subscriptions}
        assert "pointcloud_topic" in topics
        pubs = {p.topic: p for p in node.publishers}
        assert set(pubs) == {
            "/patchworkpp/cloud", "/patchworkpp/ground", "/patchworkpp/nonground"
        }

        node._on_cloud(msg)

        # input cloud is republished synchronously
        assert pubs["/patchworkpp/cloud"].messages == [msg]

        # ground/nonground arrive via the async server worker
        deadline = time.time() + 120.0
        while time.time() < deadline and not pubs["/patchworkpp/ground"].messages:
            time.sleep(0.05)
        assert pubs["/patchworkpp/ground"].messages, "no ground cloud published"
        g = pubs["/patchworkpp/ground"].messages[0]._pts
        ng = pubs["/patchworkpp/nonground"].messages[0]._pts

        # exact partition of the input cloud
        assert len(g) + len(ng) == len(pts)
        both = np.concatenate([g, ng], axis=0)
        assert np.array_equal(
            np.sort(both.view([("", both.dtype)] * 3).ravel()),
            np.sort(pts.view([("", pts.dtype)] * 3).ravel()),
        )
        # header stamp/frame propagated
        assert g.shape[1] == 3
        hdr = pubs["/patchworkpp/ground"].messages[0].header
        assert hdr.frame_id == "base_link"
        assert hdr.stamp.sec == 7
    finally:
        node.server.stop()


def test_bridge_intensity_enables_rnr(bridge, scans):
    """Capability EXCESS over the reference: an intensity-bearing
    PointCloud2 runs RNR in the bridge (the reference forces enable_RNR
    off because Utils.hpp never reads intensity — cpp:47). The published
    ground cloud must equal the core engine's RNR-active labels on the
    (N, 4) cloud, and differ from the RNR-off labels when the scan
    contains RNR-triggerable noise points."""
    from patchworkpp_tpu.models import PatchworkPP
    from patchworkpp_tpu.params import Params

    pts4 = scans["000000"][::SUB].astype(np.float32).copy()
    # Plant guaranteed RNR noise: far below the sensor, steep vertical
    # angle, low intensity (reference reflected_noise_removal :377-400).
    # r must be INSIDE (min_range, max_range): an under-min_range point is
    # nonground either way and would not distinguish RNR on/off.
    pts4[:4] = [
        [3.1, 0.0, -3.4, 0.05],
        [0.0, 3.6, -3.6, 0.01],
        [-2.9, 0.9, -3.5, 0.10],
        [2.5, -2.5, -3.3, 0.0],
    ]

    want_on = PatchworkPP(Params(enable_RNR=True)).estimate_ground(pts4)
    want_off = PatchworkPP(Params(enable_RNR=False)).estimate_ground(pts4)
    assert not np.array_equal(
        np.asarray(want_on.ground_mask), np.asarray(want_off.ground_mask)
    ), "fixture must actually exercise RNR"

    node = bridge.PatchworkppNode()
    try:
        msg = _FakePointCloud2(
            pts4, _Header(), field_names=("x", "y", "z", "intensity")
        )
        pubs = {p.topic: p for p in node.publishers}
        node._on_cloud(msg)
        deadline = time.time() + 120.0
        while time.time() < deadline and not pubs["/patchworkpp/ground"].messages:
            time.sleep(0.05)
        g = pubs["/patchworkpp/ground"].messages[0]._pts
        gm = np.asarray(want_on.ground_mask)[: len(pts4)]
        np.testing.assert_allclose(g, pts4[gm][:, :3])
    finally:
        node.server.stop()


def test_bridge_integer_intensity_field(bridge, scans):
    """Drivers that publish uint8/uint16 reflectivity as the intensity
    field (Ouster, several Velodyne configs) must not crash the callback.
    read_points_numpy's same-dtype assert inspects EVERY message field
    (ignoring field_names), so a realistic cloud — which also carries
    uint8 ring / uint32 t — would fail even an xyz-only numpy read; the
    bridge must use the structured read_points and cast. RNR must run on
    the cast values."""
    from patchworkpp_tpu.models import PatchworkPP
    from patchworkpp_tpu.params import Params

    pts4 = scans["000000"][::SUB].astype(np.float32).copy()
    pts4[:4] = [
        [3.1, 0.0, -3.4, 0.0],
        [0.0, 3.6, -3.6, 0.0],
        [-2.9, 0.9, -3.5, 0.0],
        [2.5, -2.5, -3.3, 0.0],
    ]
    # what the bridge will assemble: float32 xyz + uint16-cast intensity
    cast = pts4.copy()
    cast[:, 3] = pts4[:, 3].astype(np.uint16).astype(np.float32)
    want = PatchworkPP(Params(enable_RNR=True)).estimate_ground(cast)

    node = bridge.PatchworkppNode()
    try:
        msg = _FakePointCloud2(
            pts4, _Header(),
            field_names=("x", "y", "z", "intensity", "ring", "t"),
            field_dtypes={
                "intensity": np.uint16, "ring": np.uint8, "t": np.uint32
            },
        )
        pubs = {p.topic: p for p in node.publishers}
        node._on_cloud(msg)
        deadline = time.time() + 120.0
        while time.time() < deadline and not pubs["/patchworkpp/ground"].messages:
            time.sleep(0.05)
        assert pubs["/patchworkpp/ground"].messages, "no ground cloud published"
        g = pubs["/patchworkpp/ground"].messages[0]._pts
        gm = np.asarray(want.ground_mask)[: len(cast)]
        np.testing.assert_allclose(g, cast[gm][:, :3])
    finally:
        node.server.stop()


def test_bridge_qos_and_params_match_reference(bridge):
    """Field-for-field QoS/param parity with the reference node
    (ros/src/GroundSegmentationServer.cpp:30-69): SensorDataQoS on the
    subscription, reliable + transient-local (depth 10) on all three
    publishers, and the `verbose` parameter declared (cpp:44)."""
    node = bridge.PatchworkppNode()
    try:
        # subscription rides the sensor-data profile object itself
        assert node.sub_qos["pointcloud_topic"] is _SENSOR_DATA_QOS

        for topic in (
            "/patchworkpp/cloud", "/patchworkpp/ground", "/patchworkpp/nonground"
        ):
            q = node.pub_qos[topic]
            assert q.reliability == _Rel.RELIABLE, topic
            assert q.durability == _Dur.TRANSIENT_LOCAL, topic
            assert q.depth == 10, topic

        # the reference's declared parameter set (cpp:28-44), incl. verbose,
        # plus enable_RNR (capability excess: intensity IS wired here)
        assert set(node.declared_params) == {
            "verbose", "sensor_height", "num_iter", "num_lpr", "num_min_pts",
            "th_seeds", "th_dist", "th_seeds_v", "th_dist_v", "max_range",
            "min_range", "uprightness_thr", "base_frame", "enable_RNR",
        }
        assert node.declared_params["enable_RNR"] is True
        assert node.declared_params["verbose"] is False
        assert node.server.params.verbose is False
    finally:
        node.server.stop()


def test_launch_node_parameters_match_preset():
    from patchworkpp_tpu.serve.launch import launch_node_parameters
    from patchworkpp_tpu.models import presets

    params = launch_node_parameters(base_frame="lidar", use_sim_time=False)
    p = presets.ros_launch_params()
    assert params["sensor_height"] == p.sensor_height == 1.88
    assert params["uprightness_thr"] == p.uprightness_thr == 0.101
    assert params["num_min_pts"] == p.num_min_pts == 0
    assert params["th_dist_v"] == p.th_dist_v == 0.9
    assert params["base_frame"] == "lidar"
    assert params["use_sim_time"] is False
